"""Fused-joint (memory-efficient) loss tests: exact equivalence with the
monolithic materialize-the-logits path, including all gradients (enc, pred,
joint params) and weighted per-sample cotangents."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu import monotonic_rnnt_loss
from monotonic_rnnt_tpu.ops.bands import bands_from_alignment
from monotonic_rnnt_tpu.ops.chunked import rnnt_loss_fused_joint


def _joint_fn(params, enc_c, pred):
    e = enc_c.astype(jnp.float32) @ params["we"]
    p = pred.astype(jnp.float32) @ params["wp"]
    h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
    return h @ params["wv"] + params["bv"]


def _setup(seed=0, batch=2, t=11, s=4, v=9, de=6, dp=5, j=7):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(batch, t, de).astype(np.float32))
    pred = jnp.asarray(rng.randn(batch, s + 1, dp).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(batch, s)).astype(np.int32))
    ilen = jnp.asarray(rng.randint(s + 1, t + 1, (batch,)).astype(np.int32))
    slen = jnp.asarray(rng.randint(1, s + 1, (batch,)).astype(np.int32))
    params = {
        "we": jnp.asarray(rng.randn(de, j).astype(np.float32) * 0.5),
        "wp": jnp.asarray(rng.randn(dp, j).astype(np.float32) * 0.5),
        "wv": jnp.asarray(rng.randn(j, v).astype(np.float32) * 0.5),
        "bv": jnp.asarray(rng.randn(v).astype(np.float32) * 0.1),
    }
    return enc, pred, labels, ilen, slen, params


@pytest.mark.parametrize("chunk_t", [4, 11, 32])
def test_fused_joint_matches_monolithic(chunk_t):
    enc, pred, labels, ilen, slen, params = _setup()
    w = jnp.asarray([1.0, 0.35])      # per-sample weights: cotangent test

    def mono(enc, pred, params):
        logits = _joint_fn(params, enc, pred)
        return jnp.sum(w * monotonic_rnnt_loss(
            logits, labels, ilen, slen, backend="reference"))

    def fused(enc, pred, params):
        return jnp.sum(w * rnnt_loss_fused_joint(
            enc, pred, labels, ilen, slen, _joint_fn, params,
            chunk_t=chunk_t))

    v_m, g_m = jax.jit(jax.value_and_grad(mono, argnums=(0, 1, 2)))(
        enc, pred, params)
    v_f, g_f = jax.jit(jax.value_and_grad(fused, argnums=(0, 1, 2)))(
        enc, pred, params)
    np.testing.assert_allclose(float(v_f), float(v_m), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fused_joint_with_bands():
    enc, pred, labels, ilen, slen, params = _setup(seed=3)
    rng = np.random.RandomState(1)
    t = enc.shape[1]
    align = np.zeros((2, t), np.int32)
    for b in range(2):
        pos = np.sort(rng.choice(int(ilen[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels)[b, :int(slen[b])]
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, 2, 0)

    logits = _joint_fn(params, enc, pred)
    c_mono = monotonic_rnnt_loss(logits, labels, ilen, slen, bands=bands,
                                 backend="reference")
    c_fused = rnnt_loss_fused_joint(enc, pred, labels, ilen, slen,
                                    _joint_fn, params, chunk_t=4,
                                    bands=bands)
    np.testing.assert_allclose(np.asarray(c_fused), np.asarray(c_mono),
                               rtol=1e-5)

    g_m = jax.grad(lambda e: jnp.sum(monotonic_rnnt_loss(
        _joint_fn(params, e, pred), labels, ilen, slen, bands=bands,
        backend="reference")))(enc)
    g_f = jax.grad(lambda e: jnp.sum(rnnt_loss_fused_joint(
        e, pred, labels, ilen, slen, _joint_fn, params, chunk_t=4,
        bands=bands)))(enc)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_m), rtol=1e-4,
                               atol=1e-5)


def test_fused_joint_cost_only_no_vjp():
    enc, pred, labels, ilen, slen, params = _setup(seed=5)
    costs = jax.jit(lambda e: rnnt_loss_fused_joint(
        e, pred, labels, ilen, slen, _joint_fn, params, chunk_t=4))(enc)
    logits = _joint_fn(params, enc, pred)
    exp = monotonic_rnnt_loss(logits, labels, ilen, slen,
                              backend="reference")
    np.testing.assert_allclose(np.asarray(costs), np.asarray(exp), rtol=1e-5)


@pytest.mark.slow
def test_memory_efficient_model_loss_matches_standard():
    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)
    from monotonic_rnnt_tpu.models.train import make_memory_efficient_loss

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

    def standard(params):
        return jnp.mean(model.apply({"params": params}, *batch))

    fused = make_memory_efficient_loss(model, chunk_t=4)

    v_s, g_s = jax.jit(jax.value_and_grad(standard))(params)
    v_f, g_f = jax.jit(jax.value_and_grad(
        lambda p: fused(p, batch)))(params)
    np.testing.assert_allclose(float(v_f), float(v_s), rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(g_f),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(g_s),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-5, err_msg=str(ka))
