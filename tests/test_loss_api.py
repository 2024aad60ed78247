"""Public API tests: custom VJP, packed-layout shim, validation errors.

All loss evaluations are jitted (production path; eager per-op dispatch of
the lattice scan is unusably slow on the CPU test backend).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu import (RnntError, monotonic_rnnt_loss,
                                monotonic_rnnt_loss_packed, pack_acts,
                                unpack_acts)

import golden


def _readme_args():
    logits, labels, ilen, slen = golden.readme_batch()
    return (jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ilen),
            jnp.asarray(slen))


def test_loss_value_and_grad_via_autodiff():
    logits, labels, ilen, slen = _readme_args()

    def total(lg):
        return jnp.sum(monotonic_rnnt_loss(lg, labels, ilen, slen,
                                           backend="reference"))

    val, grad = jax.jit(jax.value_and_grad(total))(logits)
    np.testing.assert_allclose(float(val), golden.README_LOSS, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grad[0]), golden.README_GRADS,
                               atol=1e-2)


def test_custom_vjp_matches_numerical_grads():
    rng = np.random.RandomState(7)
    logits = jnp.asarray(rng.randn(2, 6, 4, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 5, size=(2, 3)).astype(np.int32))
    ilen = jnp.asarray(np.array([6, 5], np.int32))
    slen = jnp.asarray(np.array([3, 2], np.int32))

    @jax.jit
    def f(lg):
        return jnp.sum(monotonic_rnnt_loss(lg, labels, ilen, slen,
                                           backend="reference") *
                       jnp.asarray([1.0, 0.5]))

    g_custom = jax.jit(jax.grad(f))(logits)
    eps = 1e-3
    rs = np.random.RandomState(0)
    for _ in range(8):
        b, t, s, v = (rs.randint(2), rs.randint(6), rs.randint(4),
                      rs.randint(5))
        e = jnp.zeros_like(logits).at[b, t, s, v].set(eps)
        num = (f(logits + e) - f(logits - e)) / (2 * eps)
        np.testing.assert_allclose(float(g_custom[b, t, s, v]), float(num),
                                   rtol=5e-2, atol=5e-3)


def test_check_grads_rev_mode():
    # Systematic VJP check (jax.test_util.check_grads), the replacement for
    # the reference's implicit "trust the forward-produced grads" design
    # (SURVEY.md §4); first-order reverse mode against central differences.
    from jax.test_util import check_grads

    rng = np.random.RandomState(11)
    logits = jnp.asarray(rng.randn(2, 5, 3, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, 4, size=(2, 2)).astype(np.int32))
    ilen = jnp.asarray(np.array([5, 4], np.int32))
    slen = jnp.asarray(np.array([2, 1], np.int32))

    @jax.jit
    def f(lg):
        return jnp.sum(monotonic_rnnt_loss(lg, labels, ilen, slen,
                                           backend="reference"))

    check_grads(f, (logits,), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


def test_loss_under_jit_and_cotangent_scaling():
    logits, labels, ilen, slen = _readme_args()

    @jax.jit
    def f(lg, w):
        return jnp.sum(w * monotonic_rnnt_loss(lg, labels, ilen, slen,
                                               backend="reference"))

    w = jnp.asarray([2.5])
    g = jax.jit(jax.grad(f))(logits, w)
    np.testing.assert_allclose(np.asarray(g[0]), 2.5 * golden.README_GRADS,
                               atol=3e-2)


def test_packed_roundtrip():
    rng = np.random.RandomState(3)
    ilen = np.array([2, 4], np.int32)
    slen = np.array([1, 2], np.int32)
    padded = rng.randn(2, 4, 3, 3).astype(np.float32)
    for b in range(2):
        padded[b, ilen[b]:] = 0
        padded[b, :, slen[b] + 1:] = 0
    packed = pack_acts(jnp.asarray(padded), ilen, slen)
    assert packed.shape == (2 * 2 + 4 * 3, 3)
    back = unpack_acts(packed, ilen, slen, 4, 2)
    np.testing.assert_allclose(np.asarray(back), padded)


def test_packed_loss_matches_padded():
    logits, labels, ilen, slen, exp_losses, exp_grads = golden.multibatch()
    packed = pack_acts(jnp.asarray(logits), ilen, slen)
    labels_j = jnp.asarray(labels)

    @jax.jit
    def costs_fn(p):
        return monotonic_rnnt_loss_packed(p, labels_j, ilen, slen,
                                          backend="reference")

    costs = costs_fn(packed)
    np.testing.assert_allclose(np.asarray(costs), exp_losses, atol=1e-4)
    grads_packed = jax.jit(jax.grad(lambda p: jnp.sum(costs_fn(p))))(packed)
    expected_packed = pack_acts(jnp.asarray(exp_grads), ilen, slen)
    np.testing.assert_allclose(np.asarray(grads_packed),
                               np.asarray(expected_packed), atol=1e-2)


def test_validation_errors():
    logits, labels, ilen, slen = _readme_args()
    with pytest.raises(RnntError):
        monotonic_rnnt_loss(logits[0], labels, ilen, slen)  # 3D logits
    with pytest.raises(RnntError):
        monotonic_rnnt_loss(logits, labels, ilen.astype(jnp.float32), slen)
    with pytest.raises(RnntError):  # T_b < S_b
        monotonic_rnnt_loss(logits, labels, jnp.asarray([1]), slen)
    with pytest.raises(RnntError):  # bad labels shape
        monotonic_rnnt_loss(logits, labels[:, :1], ilen, slen)


def test_bf16_logits():
    logits, labels, ilen, slen = _readme_args()
    lg16 = logits.astype(jnp.bfloat16)

    @jax.jit
    def costs_fn(lg):
        return monotonic_rnnt_loss(lg, labels, ilen, slen,
                                   backend="reference")

    costs = costs_fn(lg16)
    assert costs.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(costs), [golden.README_LOSS],
                               atol=2e-2)
    g = jax.jit(jax.grad(lambda lg: jnp.sum(costs_fn(lg))))(lg16)
    assert g.dtype == jnp.bfloat16
