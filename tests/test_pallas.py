"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

The pure-JAX oracle (ops/reference.py) plays the role the reference's CPU
computer plays for its CUDA kernels: every Pallas result must match it.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu.ops.bands import bands_from_alignment
from monotonic_rnnt_tpu.ops.pallas.fused import rnnt_loss_pallas as _pal_eager
from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference as _ref_eager

import golden

rnnt_loss_pallas = jax.jit(
    _pal_eager, static_argnames=("blank_id", "with_grads", "interpret"))
rnnt_loss_reference = jax.jit(
    _ref_eager, static_argnames=("blank_id", "with_grads"))


def _random_case(seed, batch, t, s, v, ilen=None, slen=None):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(batch, t, s + 1, v).astype(np.float32) * 2)
    labels = jnp.asarray(rng.randint(1, v, size=(batch, s)).astype(np.int32))
    if ilen is None:
        ilen = np.full((batch,), t, np.int32)
    if slen is None:
        slen = np.full((batch,), s, np.int32)
    return logits, labels, jnp.asarray(ilen), jnp.asarray(slen)


def test_pallas_golden_readme():
    logits, labels, ilen, slen = golden.readme_batch()
    costs, grads = rnnt_loss_pallas(jnp.asarray(logits), jnp.asarray(labels),
                                    jnp.asarray(ilen), jnp.asarray(slen),
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(costs), [golden.README_LOSS],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[0]), golden.README_GRADS,
                               atol=1e-2)


@pytest.mark.parametrize("seed,batch,t,s,v", [
    (0, 4, 37, 9, 21),
    (1, 2, 8, 3, 130),   # V > one lane tile
    (2, 9, 25, 7, 33),   # odd batch (padding path)
])
def test_pallas_matches_oracle_random(seed, batch, t, s, v):
    rng = np.random.RandomState(seed + 100)
    ilen = rng.randint(s + 1, t + 1, size=(batch,)).astype(np.int32)
    slen = rng.randint(0, s + 1, size=(batch,)).astype(np.int32)
    logits, labels, ilen, slen = _random_case(seed, batch, t, s, v, ilen, slen)
    c_ref, g_ref = rnnt_loss_reference(logits, labels, ilen, slen)
    c_pal, g_pal = rnnt_loss_pallas(logits, labels, ilen, slen, interpret=True)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_alignment_bands():
    logits, labels, ilen, slen = golden.readme_batch()
    args = (jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ilen),
            jnp.asarray(slen))
    for shift, expected in golden.ALIGN_A_LOSSES.items():
        bands = bands_from_alignment(jnp.asarray(golden.ALIGN_A[None]),
                                     args[2], args[3], shift, 0)
        costs, _ = rnnt_loss_pallas(*args, bands=bands, interpret=True)
        np.testing.assert_allclose(np.asarray(costs), [expected], rtol=1e-4,
                                   atol=1e-4)


def test_pallas_cost_only_path():
    logits, labels, ilen, slen = _random_case(5, 3, 12, 4, 17)
    c1, g = rnnt_loss_pallas(logits, labels, ilen, slen, with_grads=False,
                             interpret=True)
    assert g is None
    c2, _ = rnnt_loss_pallas(logits, labels, ilen, slen, interpret=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)


def test_pallas_no_inf_nan():
    logits, labels, ilen, slen = _random_case(
        6, 4, 50, 10, 15, np.array([50, 33, 11, 50], np.int32),
        np.array([10, 10, 10, 0], np.int32))
    costs, grads = rnnt_loss_pallas(logits, labels, ilen, slen, interpret=True)
    assert np.isfinite(np.asarray(costs)).all()
    assert np.isfinite(np.asarray(grads)).all()
