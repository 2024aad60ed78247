"""Deployment export round-trips: serialize -> bytes -> deserialize -> run.

The exported artifact must reproduce the live computation exactly (same
XLA program) and enforce its shape contract at call time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monotonic_rnnt_tpu import monotonic_rnnt_loss
from monotonic_rnnt_tpu.serving import (export_fn, export_greedy_decoder,
                                        export_loss, import_fn)


def _loss_batch(seed=0, b=3, t=12, s=4, v=11):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, t, s + 1, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(b, s)).astype(np.int32))
    ilen = jnp.asarray(rng.randint(s + 1, t + 1, (b,)).astype(np.int32))
    slen = jnp.asarray(rng.randint(1, s + 1, (b,)).astype(np.int32))
    return logits, labels, ilen, slen


def test_export_loss_roundtrip():
    logits, labels, ilen, slen = _loss_batch()
    blob = export_loss(logits, labels, ilen, slen, platforms=("cpu",))
    assert isinstance(blob, bytes) and len(blob) > 0

    fn = import_fn(blob)
    costs, grads = fn(logits, labels, ilen, slen)

    ref_costs, vjp = jax.vjp(
        lambda lg: monotonic_rnnt_loss(lg, labels, ilen, slen,
                                       backend="reference"), logits)
    ref_grads, = vjp(jnp.ones_like(ref_costs))
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(ref_grads),
                               rtol=1e-6, atol=1e-7)


def test_export_shape_contract_enforced():
    logits, labels, ilen, slen = _loss_batch()
    fn = import_fn(export_loss(logits, labels, ilen, slen,
                               platforms=("cpu",)))
    bad = jnp.zeros((2,) + logits.shape[1:], logits.dtype)   # wrong batch
    with pytest.raises(Exception):
        fn(bad, labels[:2], ilen[:2], slen[:2])


@pytest.mark.slow  # ~40-80 s: SavedModel/export round-trip; default suite keeps the smaller round-trips
def test_export_banded_loss_roundtrip():
    """Banded-loss artifact == live banded loss (costs + packed grads)."""
    from monotonic_rnnt_tpu.ops.banded import monotonic_rnnt_loss_banded
    from monotonic_rnnt_tpu.ops.bands import (Bands, bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width)
    from monotonic_rnnt_tpu.serving import export_banded_loss

    rng = np.random.RandomState(2)
    b, t, s, v = 2, 14, 4, 9
    logits = jnp.asarray(rng.randn(b, t, s + 1, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, (b, s)).astype(np.int32))
    ilen = jnp.asarray([t, t - 3], jnp.int32)
    slen = jnp.full((b,), s, jnp.int32)
    align = np.zeros((b, t), np.int32)
    for i in range(b):
        pos = np.sort(rng.choice(int(ilen[i]), size=s, replace=False))
        align[i, pos] = np.asarray(labels)[i]
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, 1, 0)
    w = int(required_band_width(ilen, slen, bands, t, s + 1))
    lb = pack_band(logits, compute_band_layout(ilen, slen, bands, t,
                                               s + 1, w))

    blob = export_banded_loss(lb, labels, ilen, slen, bands.min_s,
                              bands.max_s, platforms=("cpu",))
    fn = import_fn(blob)
    costs, grads = fn(lb, labels, ilen, slen, bands.min_s, bands.max_s)

    ref_costs, vjp = jax.vjp(
        lambda x: monotonic_rnnt_loss_banded(
            x, labels, ilen, slen, bands=bands, backend="reference"), lb)
    ref_grads, = vjp(jnp.ones_like(ref_costs))
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(ref_grads),
                               rtol=1e-6, atol=1e-7)


def test_export_greedy_decoder_roundtrip():
    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=1, dim=64, num_heads=2,
                                dropout=0.0),
        predictor=PredictorConfig(vocab_size=32, dim=64, embed_dim=32),
        joint_dim=64, vocab_size=32)
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=32, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)

    blob = export_greedy_decoder(model, params, feats, flen, 6,
                                 platforms=("cpu",))
    decoder = import_fn(blob)
    hyp, n_hyp = decoder(params, feats, flen)

    ref_hyp, ref_n = jax.jit(lambda p, f, fl: model.apply(
        p, f, fl, 6, method="greedy_decode"))(params, feats, flen)
    np.testing.assert_array_equal(np.asarray(hyp), np.asarray(ref_hyp))
    np.testing.assert_array_equal(np.asarray(n_hyp), np.asarray(ref_n))


def test_export_streaming_decoder_roundtrip():
    """Streamed decode through the deserialized artifact == live streaming."""
    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)
    from monotonic_rnnt_tpu.serving import export_streaming_decoder

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=1, dim=64, num_heads=2,
                                dropout=0.0, causal=True,
                                attn_left_context=4, conv_kernel=7,
                                dtype=jnp.float32),
        predictor=PredictorConfig(vocab_size=32, dim=64, embed_dim=32,
                                  dtype=jnp.float32),
        joint_dim=64, vocab_size=32, dtype=jnp.float32)
    model = MonotonicTransducer(cfg)
    B, T, F, C, ML = 2, 64, 16, 16, 8
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=B, t=T, feat_dim=F, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)

    blob, state = export_streaming_decoder(model, params, B, F, C, ML,
                                           platforms=("cpu",))
    step = import_fn(blob)
    live_state = jax.tree.map(lambda x: x, state)
    live_step = jax.jit(lambda p, st, ch, cv: model.apply(
        p, st, ch, cv, method="streaming_step"))
    for i in range(0, T, C):
        cv = jnp.clip(flen - i, 0, C)
        state, emitted = step(params, state, feats[:, i:i + C], cv)
        live_state, live_emitted = live_step(params, live_state,
                                             feats[:, i:i + C], cv)
        np.testing.assert_array_equal(np.asarray(emitted),
                                      np.asarray(live_emitted))
    np.testing.assert_array_equal(np.asarray(state["hyp"]),
                                  np.asarray(live_state["hyp"]))


def test_export_fn_generic_roundtrip_bytes():
    """export_fn artifacts survive a real bytes round-trip (file-style)."""
    def fn(x, y):
        return jnp.tanh(x) @ y

    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).randn(8, 2).astype(np.float32))
    blob = export_fn(fn, (x, y), platforms=("cpu",))
    restored = import_fn(bytes(bytearray(blob)))
    np.testing.assert_allclose(np.asarray(restored(x, y)),
                               np.asarray(fn(x, y)), rtol=1e-6)
