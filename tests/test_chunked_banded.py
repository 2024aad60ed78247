"""Banded fused-joint loss: exact equivalence with the monolithic path.

The O(W) training path (joint evaluated on band cells only) must reproduce
the full-lattice loss and ALL gradients (enc, pred, joint params) for the
same bands, including weighted per-sample cotangents and width clipping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu import monotonic_rnnt_loss
from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                          clip_bands_to_width,
                                          compute_band_layout,
                                          required_band_width)
from monotonic_rnnt_tpu.ops.chunked_banded import rnnt_loss_fused_joint_banded


def _joint_fn_full(params, enc_c, pred):
    e = enc_c.astype(jnp.float32) @ params["we"]
    p = pred.astype(jnp.float32) @ params["wp"]
    h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
    return h @ params["wv"] + params["bv"]


def _joint_fn_banded(params, enc_c, pred_band):
    e = enc_c.astype(jnp.float32) @ params["we"]
    p = pred_band.astype(jnp.float32) @ params["wp"]   # [B, Tc, W, J]
    h = jnp.tanh(e[:, :, None, :] + p)
    return h @ params["wv"] + params["bv"]


def _setup(seed=0, batch=2, t=11, s=4, v=9, de=6, dp=5, j=7, shift=1):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(batch, t, de).astype(np.float32))
    pred = jnp.asarray(rng.randn(batch, s + 1, dp).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(batch, s)).astype(np.int32))
    ilen = jnp.asarray(rng.randint(s + 1, t + 1, (batch,)).astype(np.int32))
    slen = jnp.asarray(rng.randint(1, s + 1, (batch,)).astype(np.int32))
    align = np.zeros((batch, t), np.int32)
    for b in range(batch):
        pos = np.sort(rng.choice(int(ilen[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels[b, :int(slen[b])])
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, shift, 0)
    params = {
        "we": jnp.asarray(rng.randn(de, j).astype(np.float32) * 0.5),
        "wp": jnp.asarray(rng.randn(dp, j).astype(np.float32) * 0.5),
        "wv": jnp.asarray(rng.randn(j, v).astype(np.float32) * 0.5),
        "bv": jnp.asarray(rng.randn(v).astype(np.float32) * 0.1),
    }
    return enc, pred, labels, ilen, slen, bands, params


@pytest.mark.parametrize("chunk_t", [4, 11, 32])
def test_fused_banded_matches_monolithic(chunk_t):
    enc, pred, labels, ilen, slen, bands, params = _setup()
    t, s1 = enc.shape[1], pred.shape[1]
    width = int(required_band_width(ilen, slen, bands, t, s1))
    wgt = jnp.asarray([1.0, 0.35])

    def mono(enc, pred, params):
        logits = _joint_fn_full(params, enc, pred)
        return jnp.sum(wgt * monotonic_rnnt_loss(
            logits, labels, ilen, slen, bands=bands, backend="reference"))

    def fused(enc, pred, params):
        return jnp.sum(wgt * rnnt_loss_fused_joint_banded(
            enc, pred, labels, ilen, slen, _joint_fn_banded, params,
            bands=bands, band_width=width, chunk_t=chunk_t))

    v_m, g_m = jax.jit(jax.value_and_grad(mono, argnums=(0, 1, 2)))(
        enc, pred, params)
    v_f, g_f = jax.jit(jax.value_and_grad(fused, argnums=(0, 1, 2)))(
        enc, pred, params)
    np.testing.assert_allclose(float(v_f), float(v_m), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fused_banded_width_clipping():
    enc, pred, labels, ilen, slen, bands, params = _setup(seed=3, t=16, s=6,
                                                          shift=3)
    t, s1 = enc.shape[1], pred.shape[1]
    w_req = int(required_band_width(ilen, slen, bands, t, s1))
    width = max(2, w_req - 1)
    layout = compute_band_layout(ilen, slen, bands, t, s1, width)
    clipped = clip_bands_to_width(bands, layout)

    def mono(enc, pred, params):
        logits = _joint_fn_full(params, enc, pred)
        return jnp.sum(monotonic_rnnt_loss(
            logits, labels, ilen, slen, bands=clipped, backend="reference"))

    def fused(enc, pred, params):
        return jnp.sum(rnnt_loss_fused_joint_banded(
            enc, pred, labels, ilen, slen, _joint_fn_banded, params,
            bands=bands, band_width=width, chunk_t=8))

    v_m, g_m = jax.jit(jax.value_and_grad(mono, argnums=(0, 1, 2)))(
        enc, pred, params)
    v_f, g_f = jax.jit(jax.value_and_grad(fused, argnums=(0, 1, 2)))(
        enc, pred, params)
    np.testing.assert_allclose(float(v_f), float(v_m), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fused_banded_validation():
    enc, pred, labels, ilen, slen, bands, params = _setup()
    from monotonic_rnnt_tpu.utils.status import RnntError

    with pytest.raises(RnntError):
        rnnt_loss_fused_joint_banded(
            enc, pred, labels, ilen, slen, _joint_fn_banded, params,
            bands=bands, band_width=pred.shape[1] + 1)
    with pytest.raises(RnntError):
        rnnt_loss_fused_joint_banded(
            enc[:, 0], pred, labels, ilen, slen, _joint_fn_banded, params,
            bands=bands, band_width=2)


@pytest.mark.slow
def test_banded_memory_efficient_model_loss_matches_standard():
    """Model-level wiring: Joint.banded + make_banded_memory_efficient_loss
    reproduce the standard banded model loss and all parameter gradients."""
    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)
    from monotonic_rnnt_tpu.models.train import \
        make_banded_memory_efficient_loss

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=1, dim=32, num_heads=2,
                                dropout=0.0, dtype=jnp.float32),
        predictor=PredictorConfig(vocab_size=16, dim=32, embed_dim=16,
                                  dtype=jnp.float32),
        joint_dim=32, vocab_size=16, dtype=jnp.float32)
    model = MonotonicTransducer(cfg)
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=2, t=24, feat_dim=8, s=3, vocab=16))
    feats, flen, labels, slen = batch
    variables = model.init(jax.random.PRNGKey(0), *batch)
    params = variables["params"]

    # Bands in encoder-frame time (the encoder subsamples feats).
    enc, enc_lengths = model.apply({"params": params}, feats, flen, True,
                                   method=lambda m, f, l, d: m.encode(f, l, d))
    t_enc = enc.shape[1]
    rng = np.random.RandomState(0)
    align = np.zeros((2, t_enc), np.int32)
    for b in range(2):
        pos = np.sort(rng.choice(int(enc_lengths[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels[b, :int(slen[b])])
    bands = bands_from_alignment(jnp.asarray(align), enc_lengths,
                                 slen, 2, 0)
    width = int(required_band_width(enc_lengths, slen, bands, t_enc,
                                    labels.shape[1] + 1))

    def standard(params):
        logits, el = model.apply(
            {"params": params}, feats, flen, labels, True,
            method=lambda m, f, l, la, d: m.logits(f, l, la, d))
        return jnp.mean(monotonic_rnnt_loss(logits, labels, el, slen,
                                            bands=bands,
                                            backend="reference"))

    fused = make_banded_memory_efficient_loss(model, band_width=width,
                                              chunk_t=8)
    v_s, g_s = jax.jit(jax.value_and_grad(standard))(params)
    v_f, g_f = jax.jit(jax.value_and_grad(
        lambda p: fused(p, batch, bands)))(params)
    np.testing.assert_allclose(float(v_f), float(v_s), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_f),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g_s),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5, err_msg=str(ka))
