"""Model family tests: Conformer-transducer forward, train step, decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from monotonic_rnnt_tpu.data.synthetic import (SyntheticConfig,
                                               SyntheticDataset, tiny_batch)
from monotonic_rnnt_tpu.models.conformer import ConformerConfig
from monotonic_rnnt_tpu.models.predictor import PredictorConfig
from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                  TransducerConfig)
from monotonic_rnnt_tpu.models.train import (create_train_state,
                                             make_sharded_train_step,
                                             train_step)
from monotonic_rnnt_tpu.parallel import make_mesh


def _tiny_cfg(vocab=32):
    return TransducerConfig(
        encoder=ConformerConfig(num_layers=1, dim=64, num_heads=2,
                                dropout=0.0),
        predictor=PredictorConfig(vocab_size=vocab, dim=64, embed_dim=32),
        joint_dim=64, vocab_size=vocab)


@pytest.mark.slow
def test_transducer_forward_loss():
    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=32, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)
    costs = jax.jit(model.apply)(params, feats, flen, labels, slen)
    assert costs.shape == (2,)
    assert np.all(np.isfinite(np.asarray(costs)))
    assert np.all(np.asarray(costs) > 0)


@pytest.mark.slow
def test_train_step_descends():
    cfg = _tiny_cfg()
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=4, t=32, feat_dim=16, s=4, vocab=32))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                               learning_rate=3e-3, warmup_steps=1)
    step = jax.jit(train_step)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not descend: {losses}"


@pytest.mark.slow
def test_sharded_train_step():
    cfg = _tiny_cfg()
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=8, t=32, feat_dim=16, s=4, vocab=32))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    mesh = make_mesh(data=8, model=1)
    step = make_sharded_train_step(mesh)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_tp_sharded_train_step_matches_dp():
    """Vocab-TP train step == DP train step: same loss, same updated params.

    The TP step never materializes the [B,T,S+1,V] logits (fused-joint loss
    with the vocab projection sharded over 'model'); one adamw update from
    identical initial states must land on identical parameters.
    """
    from monotonic_rnnt_tpu.models.train import (make_tp_sharded_train_step,
                                                 shard_train_state,
                                                 transducer_tp_specs)

    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=8, t=32, feat_dim=16, s=4, vocab=32))

    state_dp = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                  learning_rate=3e-3, warmup_steps=1)
    state_tp = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                  learning_rate=3e-3, warmup_steps=1)

    mesh_dp = make_mesh(data=8, model=1)
    step_dp = make_sharded_train_step(mesh_dp)
    state_dp, m_dp = step_dp(state_dp, batch)

    mesh_tp = make_mesh(data=2, model=4)
    step_tp = make_tp_sharded_train_step(mesh_tp, model, state_tp.params,
                                         chunk_t=8)
    state_tp = shard_train_state(state_tp, mesh_tp)
    state_tp, m_tp = step_tp(state_tp, batch)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    # The vocab projection's update must match once gathered off the mesh.
    for a, b in zip(jax.tree.leaves(jax.device_get(state_tp.params)),
                    jax.tree.leaves(jax.device_get(state_dp.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
    # Sharding spec rule: exactly kernel+bias of vocab_proj (and their adam
    # moments) are model-sharded.
    specs = jax.tree.leaves(transducer_tp_specs(state_tp.opt_state),
                            is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    n_sharded = sum(1 for s in specs if any(ax == "model" for ax in s))
    assert n_sharded == 4, f"expected 4 model-sharded opt leaves, {n_sharded}"


@pytest.mark.slow
def test_tp_banded_train_step_matches_oracle():
    """Banded vocab-TP train step == hand-built oracle step (O(W) x V/n).

    The oracle computes the same mean banded loss from the monolithic
    logits and applies the same optimizer; one update must land on the
    same parameters.
    """
    import optax
    from monotonic_rnnt_tpu import monotonic_rnnt_loss
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              required_band_width)
    from monotonic_rnnt_tpu.models.train import (make_tp_sharded_train_step,
                                                 shard_train_state)

    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=8, t=32, feat_dim=16, s=4, vocab=32))
    feats, flen, labels, slen = batch

    state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                               learning_rate=3e-3, warmup_steps=1)

    # Bands in encoder-frame time from a synthetic alignment.
    enc, enc_lengths = model.apply({"params": state.params}, feats, flen,
                                   True, method=lambda m, f, fl, d:
                                   m.encode(f, fl, d))
    t_out = enc.shape[1]
    rng = np.random.RandomState(5)
    align = np.zeros((8, t_out), np.int32)
    for b in range(8):
        pos = np.sort(rng.choice(int(enc_lengths[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels)[b, :int(slen[b])]
    bands = bands_from_alignment(jnp.asarray(align), enc_lengths,
                                 slen.astype(jnp.int32), 2, 0)
    width = int(required_band_width(enc_lengths, slen.astype(jnp.int32),
                                    bands, t_out, labels.shape[1] + 1))

    # Oracle: monolithic banded loss + identical optimizer update.
    def oracle_loss(p):
        logits, el = model.apply({"params": p}, feats, flen, labels, True,
                                 method=lambda m, f, fl, la, d:
                                 m.logits(f, fl, la, d))
        return jnp.mean(monotonic_rnnt_loss(
            logits, labels, el, slen, bands=bands, backend="reference"))

    o_loss, o_grads = jax.jit(jax.value_and_grad(oracle_loss))(state.params)
    updates, _ = state.tx.update(o_grads, state.opt_state, state.params)
    o_params = optax.apply_updates(state.params, updates)

    mesh = make_mesh(data=2, model=4)
    step = make_tp_sharded_train_step(mesh, model, state.params, chunk_t=8,
                                      band_width=width)
    state_tp = shard_train_state(state, mesh)
    state_tp, m_tp = step(state_tp, batch, bands)

    np.testing.assert_allclose(float(m_tp["loss"]), float(o_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(state_tp.params)),
                    jax.tree.leaves(o_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)


@pytest.mark.parametrize("predictor_kind", ["lstm", "conv"])
def test_streaming_decode_matches_full_greedy(predictor_kind):
    """Chunked streaming inference == full-utterance greedy decode, exactly.

    Causal encoder with bounded attention window; the streaming state
    carries a streaming_lookback-sized raw-frame history, so every emitted
    frame's receptive field is fully inside the recompute window. Both
    predictor families (LSTM carry / conv token ring) stream statefully.
    """
    from monotonic_rnnt_tpu.models.conformer import streaming_lookback

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=2, dim=64, num_heads=2,
                                dropout=0.0, causal=True,
                                attn_left_context=4, conv_kernel=7,
                                dtype=jnp.float32),
        predictor=PredictorConfig(vocab_size=32, dim=64, embed_dim=32,
                                  dtype=jnp.float32),
        joint_dim=64, vocab_size=32, dtype=jnp.float32,
        predictor_kind=predictor_kind)
    model = MonotonicTransducer(cfg)

    # T must exceed the lookback (88 frames for this config) so the window
    # truncation path is live: avail == lookback, s0 > 0, nonzero
    # pos_offset, and the content roll all execute.
    B, T, F, C, max_labels = 2, 128, 16, 16, 24
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    flen = jnp.asarray([T, T - 13], jnp.int32)
    labels = jnp.asarray(rng.randint(1, 32, (B, 4)).astype(np.int32))
    slen = jnp.full((B,), 4, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)

    hyp_full, n_full = jax.jit(lambda p, f, fl: model.apply(
        p, f, fl, max_labels, method="greedy_decode"))(params, feats, flen)

    lookback = streaming_lookback(cfg.encoder)
    assert T > lookback, "test must exercise window truncation"
    state = model.apply(params, B, F, lookback, max_labels,
                        method="streaming_init")
    step = jax.jit(lambda p, st, ch, cv: model.apply(
        p, st, ch, cv, method="streaming_step"))
    emitted_all = []
    for i in range(0, T, C):
        cv = jnp.clip(flen - i, 0, C)
        state, emitted = step(params, state, feats[:, i:i + C], cv)
        emitted_all.append(np.asarray(emitted))

    np.testing.assert_array_equal(np.asarray(state["n_hyp"]),
                                  np.asarray(n_full))
    np.testing.assert_array_equal(np.asarray(state["hyp"]),
                                  np.asarray(hyp_full))
    # The per-chunk emission stream re-assembles the same label sequence.
    stream = np.concatenate(emitted_all, axis=1)
    for b in range(B):
        toks = stream[b][stream[b] != 0]
        np.testing.assert_array_equal(
            toks, np.asarray(hyp_full)[b][:int(n_full[b])])


@pytest.mark.slow
def test_grad_accum_matches_single_step():
    """Accumulating over microbatches == one full-batch step (same update)."""
    from monotonic_rnnt_tpu.models.train import make_grad_accum_train_step

    cfg = _tiny_cfg()
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=8, t=32, feat_dim=16, s=4, vocab=32))
    state_a = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                 learning_rate=3e-3, warmup_steps=1)
    state_b = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                 learning_rate=3e-3, warmup_steps=1)

    state_a, m_a = jax.jit(train_step)(state_a, batch)
    accum_step = make_grad_accum_train_step(4)
    state_b, m_b = accum_step(state_b, batch)

    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)

    # Sharded variant compiles and descends on the virtual mesh.
    mesh = make_mesh(data=8, model=1)
    state_c = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step_c = make_grad_accum_train_step(2, mesh)
    state_c, m_c = step_c(state_c, batch)
    assert np.isfinite(float(m_c["loss"]))


def test_streaming_beam_matches_full_beam():
    """Chunked streaming beam search (+LM fusion) == full-utterance beam.

    The carried beam advances with the identical frame step, so tokens,
    lengths, AND scores must match exactly.
    """
    from monotonic_rnnt_tpu.models.conformer import streaming_lookback
    from monotonic_rnnt_tpu.models.lm import BigramLm

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=2, dim=64, num_heads=2,
                                dropout=0.0, causal=True,
                                attn_left_context=4, conv_kernel=7,
                                dtype=jnp.float32),
        predictor=PredictorConfig(vocab_size=32, dim=64, embed_dim=32,
                                  dtype=jnp.float32),
        joint_dim=64, vocab_size=32, dtype=jnp.float32)
    model = MonotonicTransducer(cfg)

    B, T, F, C, ML, K = 2, 128, 16, 16, 10, 4
    rng = np.random.RandomState(7)
    feats = jnp.asarray(rng.randn(B, T, F).astype(np.float32))
    flen = jnp.asarray([T, T - 13], jnp.int32)
    labels = jnp.asarray(rng.randint(1, 32, (B, 4)).astype(np.int32))
    slen = jnp.full((B,), 4, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)
    lm = BigramLm(jax.nn.log_softmax(
        jnp.asarray(rng.randn(32, 32).astype(np.float32)), axis=-1))

    tok_f, n_f, s_f = jax.jit(lambda p, f, fl: model.apply(
        p, f, fl, ML, K, True, False, lm, 0.5,
        method=MonotonicTransducer.beam_search_decode))(params, feats, flen)

    lookback = streaming_lookback(cfg.encoder)
    assert T > lookback
    state = model.apply(params, B, F, lookback, ML, K, lm,
                        method="streaming_beam_init")
    step = jax.jit(lambda p, st, ch, cv: model.apply(
        p, st, ch, cv, lm, 0.5, method="streaming_beam_step"))
    for i in range(0, T, C):
        cv = jnp.clip(flen - i, 0, C)
        state, (tok_s, n_s, s_s) = step(params, state, feats[:, i:i + C],
                                        cv)

    np.testing.assert_array_equal(np.asarray(tok_s), np.asarray(tok_f))
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_f))
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_f), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.slow
def test_remat_encoder_same_loss_and_grads():
    """cfg.encoder.remat=True changes memory, not math: identical grads."""
    import dataclasses

    base = _tiny_cfg()
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=2, t=32, feat_dim=16, s=4, vocab=32))
    feats, flen, labels, slen = batch

    def loss_and_grads(cfg):
        model = MonotonicTransducer(cfg)
        params = model.init(jax.random.PRNGKey(0), feats, flen, labels,
                            slen)
        return jax.jit(jax.value_and_grad(lambda p: jnp.mean(model.apply(
            p, feats, flen, labels, slen))))(params)

    v0, g0 = loss_and_grads(base)
    v1, g1 = loss_and_grads(dataclasses.replace(
        base, encoder=dataclasses.replace(base.encoder, remat=True)))
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_greedy_decode_shapes():
    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=32, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)
    hyp, n_hyp = jax.jit(lambda p, f, fl: model.apply(
        p, f, fl, 6, method=model.greedy_decode))(params, feats, flen)
    assert hyp.shape == (2, 6)
    assert np.all(np.asarray(n_hyp) <= 6)


def test_synthetic_bucketing():
    ds = SyntheticDataset(SyntheticConfig(max_frames=400), batch_size=3,
                          num_buckets=3)
    it = ds.batches()
    shapes = set()
    for _ in range(30):
        feats, flen, labels, slen = next(it)
        assert feats.shape[0] == 3
        assert np.all(flen <= feats.shape[1])
        assert np.all(slen <= labels.shape[1])
        # bucketing keeps padding waste bounded by the bucket geometry
        assert np.all(slen >= 1)
        shapes.add((feats.shape, labels.shape))
    # Static shapes per bucket: both the feature AND label paddings are
    # bucket constants, so XLA compiles at most one program per bucket.
    assert len(shapes) <= 3, shapes
    t_bounds = {s[0][1] for s in shapes}
    assert len(t_bounds) == len(shapes), shapes  # one label pad per bucket


@pytest.mark.slow
def test_beam_search_beam1_equals_greedy():
    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=3, t=24, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)

    g_hyp, g_n = jax.jit(lambda p, f, l: model.apply(
        p, f, l, 6, method=MonotonicTransducer.greedy_decode))(
            params, feats, flen)
    b_tok, b_n, b_score = jax.jit(lambda p, f, l: model.apply(
        p, f, l, 6, 1, method=MonotonicTransducer.beam_search_decode))(
            params, feats, flen)
    np.testing.assert_array_equal(np.asarray(b_tok[:, 0]), np.asarray(g_hyp))
    np.testing.assert_array_equal(np.asarray(b_n[:, 0]), np.asarray(g_n))
    assert np.all(np.isfinite(np.asarray(b_score[:, 0])))


def test_beam_search_wider_beam_never_worse():
    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=3, t=24, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(1), feats, flen, labels, slen)

    def decode(k):
        return jax.jit(lambda p, f, l: model.apply(
            p, f, l, 6, k, method=MonotonicTransducer.beam_search_decode))(
                params, feats, flen)

    _, _, s1 = decode(1)
    tok4, n4, s4 = decode(4)
    # The best path found by a wider beam is at least as probable.
    assert np.all(np.asarray(s4[:, 0]) >= np.asarray(s1[:, 0]) - 1e-5)
    # Beams come back sorted best-first.
    assert np.all(np.diff(np.asarray(s4), axis=1) <= 1e-6)
    # Lengths within capacity; tokens past the length are untouched zeros.
    assert np.all(np.asarray(n4) <= 6)


@pytest.mark.slow
def test_checkpoint_save_restore_roundtrip(tmp_path):
    from monotonic_rnnt_tpu.models.train import (restore_checkpoint,
                                                 save_checkpoint)

    cfg = _tiny_cfg()
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=2, t=32, feat_dim=16, s=4, vocab=32))
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(train_step)
    state, m1 = step(state, batch)
    save_checkpoint(str(tmp_path / "ckpt"), state)

    fresh = create_train_state(cfg, jax.random.PRNGKey(7), batch)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh)
    assert int(restored.step) == int(state.step)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), restored.params, state.params)

    # Resuming from the restored state reproduces the original trajectory.
    s1, m_a = step(state, batch)
    s2, m_b = step(restored, batch)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-6)


def test_predictor_step_matches_batched_call():
    # The stepwise decoding interface must reproduce the training path's
    # context vectors exactly: ctx after consuming history[:k] == column k
    # of the batched __call__.
    from monotonic_rnnt_tpu.models.predictor import (ConvPredictor,
                                                     LstmPredictor,
                                                     PredictorConfig)

    rng = np.random.RandomState(4)
    B, S = 3, 5
    cfg = PredictorConfig(vocab_size=16, dim=32, embed_dim=16,
                          dtype=jnp.float32)
    labels = jnp.asarray(rng.randint(1, 16, size=(B, S)).astype(np.int32))

    for cls in (LstmPredictor, ConvPredictor):
        model = cls(cfg)
        params = model.init(jax.random.PRNGKey(0), labels)
        batched = model.apply(params, labels)        # [B, S+1, D]

        def stepwise(params, labels):
            def run(mdl):
                state = mdl.init_state(B)
                ctxs = []
                hist = jnp.concatenate(
                    [jnp.zeros((B, 1), jnp.int32), labels], axis=1)
                for k in range(S + 1):
                    state, ctx = mdl.step(state, hist[:, k])
                    ctxs.append(ctx)
                return jnp.stack(ctxs, axis=1)
            return nn.apply(run, model)(params)

        import flax.linen as nn
        got = stepwise(params, labels)
        np.testing.assert_allclose(np.asarray(got), np.asarray(batched),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=cls.__name__)


def test_beam_search_lm_fusion_zero_weight_is_identity():
    """Attaching an LM with lm_weight=0 changes nothing (exact equality)."""
    from monotonic_rnnt_tpu.models.lm import BigramLm

    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=3, t=24, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(2), feats, flen, labels, slen)
    rng = np.random.RandomState(0)
    lm = BigramLm(jax.nn.log_softmax(
        jnp.asarray(rng.randn(32, 32).astype(np.float32)), axis=-1))

    def decode(**kw):
        return jax.jit(lambda p, f, l: model.apply(
            p, f, l, 6, 4, True, False,
            method=MonotonicTransducer.beam_search_decode, **kw))(
                params, feats, flen)

    tok0, n0, s0 = decode()
    tok1, n1, s1 = decode(lm=lm, lm_weight=0.0)
    np.testing.assert_array_equal(np.asarray(tok0), np.asarray(tok1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)


def test_beam_search_lm_fusion_zero_weight_with_inf_lm():
    """lm_weight=0 stays an exact identity even when the LM table contains
    -inf entries (0 * -inf would be NaN if fusion weren't skipped)."""
    from monotonic_rnnt_tpu.models.lm import BigramLm

    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=24, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(6), feats, flen, labels, slen)
    # Sparse-count LM: most bigrams forbidden (-inf), as log(counts) gives.
    lm = BigramLm(jnp.where(jnp.arange(32)[None, :] < 3, jnp.log(1 / 3.0),
                            -jnp.inf) * jnp.ones((32, 1)))

    def decode(**kw):
        return jax.jit(lambda p, f, l: model.apply(
            p, f, l, 6, 4, True, False,
            method=MonotonicTransducer.beam_search_decode, **kw))(
                params, feats, flen)

    tok0, n0, s0 = decode()
    tok1, n1, s1 = decode(lm=lm, lm_weight=0.0)
    np.testing.assert_array_equal(np.asarray(tok0), np.asarray(tok1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(s1[:, 0])))


def test_beam_search_lm_fusion_biases_labels():
    """A strongly-weighted LM that only allows token 5 dominates emissions,
    and the fused score accounts for the LM terms."""
    from monotonic_rnnt_tpu.models.lm import BigramLm

    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=3, t=24, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(3), feats, flen, labels, slen)

    only5 = jnp.where(jnp.arange(32)[None, :] == 5, 0.0, -40.0)
    lm = BigramLm(jnp.broadcast_to(only5, (32, 32)))
    tok, n, score = jax.jit(lambda p, f, l: model.apply(
        p, f, l, 6, 4, True, False, lm, 5.0,
        method=MonotonicTransducer.beam_search_decode))(params, feats, flen)
    tok, n = np.asarray(tok), np.asarray(n)
    for b in range(3):
        emitted = tok[b, 0][:n[b, 0]]
        assert (emitted == 5).all(), f"LM bias ignored: {emitted}"
    assert np.all(np.isfinite(np.asarray(score[:, 0])))


def test_lstm_lm_stepwise_matches_teacher_forced():
    """LstmLm.step unrolled == LstmLm.__call__ (same BOS-shifted contract)."""
    from monotonic_rnnt_tpu.models.lm import LstmLm, LstmLmConfig

    lm_mod = LstmLm(LstmLmConfig(vocab_size=32, dim=32, embed_dim=16,
                                 dtype=jnp.float32))
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(1, 32, (3, 5)).astype(np.int32))
    variables = lm_mod.init(jax.random.PRNGKey(0), tokens)

    batched = lm_mod.apply(variables, tokens)              # [B, S, V]

    state = lm_mod.apply(variables, 3, method="init_state")
    hist = jnp.concatenate([jnp.zeros((3, 1), jnp.int32), tokens[:, :-1]],
                           axis=1)
    for i in range(5):
        state, logp = lm_mod.apply(variables, state, hist[:, i],
                                   method="step")
        np.testing.assert_allclose(np.asarray(logp),
                                   np.asarray(batched[:, i]), rtol=1e-5,
                                   atol=1e-6)


def test_beam_search_neural_lm_adapter():
    """A flax LSTM LM rides the beam through FlaxLmAdapter; weight 0 is an
    exact identity and a positive weight runs (finite scores)."""
    from monotonic_rnnt_tpu.models.lm import (FlaxLmAdapter, LstmLm,
                                              LstmLmConfig)

    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=24, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(4), feats, flen, labels, slen)

    lm_mod = LstmLm(LstmLmConfig(vocab_size=32, dim=32, embed_dim=16,
                                 dtype=jnp.float32))
    lm_vars = lm_mod.init(jax.random.PRNGKey(5), labels)
    lm = FlaxLmAdapter(lm_mod, lm_vars)

    def decode(**kw):
        return jax.jit(lambda p, f, l: model.apply(
            p, f, l, 6, 4, True, False,
            method=MonotonicTransducer.beam_search_decode, **kw))(
                params, feats, flen)

    tok0, n0, s0 = decode()
    tok1, n1, s1 = decode(lm=lm, lm_weight=0.0)
    np.testing.assert_array_equal(np.asarray(tok0), np.asarray(tok1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)

    _, _, s2 = decode(lm=lm, lm_weight=0.7)
    assert np.all(np.isfinite(np.asarray(s2[:, 0])))


def test_beam_search_dead_beams_do_not_fabricate():
    # A sample whose utterance is empty (enc length 0 after subsampling can't
    # happen, but length-1 with beam > 1 leaves dead -inf beams): dead beams
    # must not write tokens.
    cfg = _tiny_cfg()
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=24, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)
    dec_flen = jnp.asarray([4, 24], jnp.int32)  # sample 0: 1 frame after /4
    tok, n, score = model.apply(params, feats, dec_flen, 6, 3,
                                method=MonotonicTransducer.beam_search_decode)
    tok, n, score = np.asarray(tok), np.asarray(n), np.asarray(score)
    for b in range(2):
        for k in range(3):
            if not np.isfinite(score[b, k]):
                assert n[b, k] == 0, (b, k, n[b, k], score[b, k])
                assert (tok[b, k] == 0).all()


@pytest.mark.slow
def test_beam_search_path_merging_recovers_marginal():
    # Merged mass must dominate the single best path, stay a log-prob, and
    # — with a beam wide enough to cover all live hypotheses on a tiny
    # lattice — equal the true marginal of the decoded sequence (the
    # unrestricted loss with that sequence as target).
    cfg = _tiny_cfg(vocab=8)
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=16, feat_dim=8, s=2, vocab=8))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)

    tok_p, n_p, s_path = model.apply(
        params, feats, flen, 3, 8,
        method=MonotonicTransducer.beam_search_decode)
    tok_m, n_m, s_merged = model.apply(
        params, feats, flen, 3, 8, merge_paths=True,
        method=MonotonicTransducer.beam_search_decode)
    s_path, s_merged = np.asarray(s_path), np.asarray(s_merged)
    # Merged mass >= best single path of the same sequence; both <= 0.
    assert (s_merged[:, 0] >= s_path[:, 0] - 1e-5).all()
    assert (s_merged[:, 0] <= 1e-5).all()

    # Exactness: compare the merged top hypothesis's mass against the true
    # marginal of that label sequence (alignment-unrestricted loss with the
    # decoded sequence as the target), computed on the model's own logits.
    from monotonic_rnnt_tpu import monotonic_rnnt_loss
    enc_len = np.asarray(model.apply(
        params, feats, flen, method=MonotonicTransducer.encode)[1])
    for b in range(2):
        nb = int(np.asarray(n_m)[b, 0])
        if nb == 0:
            continue
        seq = jnp.asarray(np.asarray(tok_m)[b:b + 1, 0, :nb])
        joint_logits, el = model.apply(
            params, feats[b:b + 1], flen[b:b + 1], seq,
            method=MonotonicTransducer.logits)
        cost = monotonic_rnnt_loss(
            joint_logits[:, :, :nb + 1], seq, el,
            jnp.asarray([nb], jnp.int32), backend="reference")
        # Merged mass is a sum over a SUBSET of the sequence's paths, so it
        # lower-bounds the true marginal (equality iff nothing was pruned).
        marginal = float(-cost[0])
        assert s_merged[b, 0] <= marginal + 1e-4, (marginal, s_merged[b, 0])
        # And it must recover a nontrivial fraction of it on this tiny
        # lattice (sanity that merging actually accumulates mass).
        assert s_merged[b, 0] >= marginal - 3.0, (marginal, s_merged[b, 0])


def test_causal_encoder_is_future_independent():
    # Streaming property: with causal=True, encoder frame t' must not change
    # when input frames beyond its receptive boundary change. Check the
    # strongest form — outputs for the common prefix are identical when the
    # future is replaced entirely.
    from monotonic_rnnt_tpu.models.conformer import (ConformerConfig,
                                                     ConformerEncoder)

    cfg = ConformerConfig(num_layers=2, dim=32, num_heads=2, dropout=0.0,
                          causal=True, dtype=jnp.float32)
    enc = ConformerEncoder(cfg)
    rng = np.random.RandomState(0)
    T, F = 64, 16
    a = rng.randn(1, T, F).astype(np.float32)
    b = a.copy()
    cut = 32
    b[0, cut:] = rng.randn(T - cut, F)            # different future
    flen = jnp.asarray([T], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(a), flen)
    ya, la = enc.apply(params, jnp.asarray(a), flen)
    yb, lb = enc.apply(params, jnp.asarray(b), flen)
    # Subsampled frame t' covers input frames <= 4*t'+const; frames strictly
    # before cut//4 - 1 are safely inside the common prefix.
    safe = cut // 4 - 1
    np.testing.assert_allclose(np.asarray(ya)[:, :safe],
                               np.asarray(yb)[:, :safe], rtol=1e-5,
                               atol=1e-5)
    # Sanity: the non-causal encoder does NOT have this property.
    cfg_nc = ConformerConfig(num_layers=2, dim=32, num_heads=2, dropout=0.0,
                             causal=False, dtype=jnp.float32)
    enc_nc = ConformerEncoder(cfg_nc)
    params_nc = enc_nc.init(jax.random.PRNGKey(0), jnp.asarray(a), flen)
    za, _ = enc_nc.apply(params_nc, jnp.asarray(a), flen)
    zb, _ = enc_nc.apply(params_nc, jnp.asarray(b), flen)
    assert float(np.abs(np.asarray(za)[:, :safe]
                        - np.asarray(zb)[:, :safe]).max()) > 1e-4
