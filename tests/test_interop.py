"""Torch binding tests — parity with reference pytorch_binding/test.py."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from monotonic_rnnt_tpu.interop.torch_binding import (MonotonicRNNTLoss,
                                                      monotonic_rnnt_loss)
from monotonic_rnnt_tpu.ops.packing import pack_acts

import golden


def _packed_readme():
    logits, labels, ilen, slen = golden.readme_batch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    return (torch.tensor(packed, requires_grad=True),
            torch.tensor(labels), torch.tensor(ilen), torch.tensor(slen))


def test_torch_golden_forward_backward():
    acts, labels, ilen, slen = _packed_readme()
    costs = monotonic_rnnt_loss(acts, labels, ilen, slen)
    np.testing.assert_allclose(costs.detach().numpy(), [golden.README_LOSS],
                               atol=1e-4)
    costs.sum().backward()
    np.testing.assert_allclose(acts.grad.numpy().reshape(4, 3, 3),
                               golden.README_GRADS, atol=1e-2)


def test_torch_cotangent_scaling():
    acts, labels, ilen, slen = _packed_readme()
    costs = monotonic_rnnt_loss(acts, labels, ilen, slen)
    (2.5 * costs.sum()).backward()
    np.testing.assert_allclose(acts.grad.numpy().reshape(4, 3, 3),
                               2.5 * golden.README_GRADS, atol=3e-2)


def test_torch_align_restrict_golden():
    # Reference pytorch_binding/test.py:110 and :128 golden values.
    acts, labels, ilen, slen = _packed_readme()
    c1 = monotonic_rnnt_loss(acts, labels, ilen, slen,
                             alignment=torch.tensor(golden.ALIGN_A[None]),
                             max_distance_from_alignment=1)
    np.testing.assert_allclose(c1.detach().numpy(), [1.22], atol=1e-2)
    c2 = monotonic_rnnt_loss(acts, labels, ilen, slen,
                             alignment=torch.tensor(golden.ALIGN_B[None]),
                             max_distance_from_alignment=0)
    np.testing.assert_allclose(c2.detach().numpy(), [2.7], atol=1e-2)


def test_torch_module_reductions():
    acts, labels, ilen, slen = _packed_readme()
    assert float(MonotonicRNNTLoss(reduction="sum")(
        acts, labels, ilen, slen)) == pytest.approx(golden.README_LOSS,
                                                    abs=1e-4)
    loss = MonotonicRNNTLoss(reduction="mean")(acts, labels, ilen, slen)
    loss.backward()
    assert acts.grad is not None


def test_torch_multibatch():
    logits, labels, ilen, slen, exp_losses, _ = golden.multibatch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    costs = monotonic_rnnt_loss(torch.tensor(packed), torch.tensor(labels),
                                torch.tensor(ilen), torch.tensor(slen))
    np.testing.assert_allclose(costs.numpy(), exp_losses, atol=1e-4)


def test_torch_cost_only_under_no_grad():
    # Under no_grad the binding must skip the gradient pass yet return the
    # same costs (cost-only fast path).
    acts, labels, ilen, slen = _packed_readme()
    with torch.no_grad():
        costs = monotonic_rnnt_loss(acts, labels, ilen, slen)
    np.testing.assert_allclose(costs.numpy(), [golden.README_LOSS], atol=1e-4)
    assert costs.grad_fn is None


def test_torch_padded_dlpack_bridge_matches_jax():
    """Padded torch entry (dlpack -> JAX engine) reproduces the JAX VJP."""
    import jax
    from monotonic_rnnt_tpu import monotonic_rnnt_loss as jax_loss
    from monotonic_rnnt_tpu.interop.torch_binding import \
        monotonic_rnnt_loss_padded

    rng = np.random.RandomState(3)
    B, T, S, V = 3, 14, 4, 19
    logits = rng.randn(B, T, S + 1, V).astype(np.float32)
    labels = rng.randint(1, V, (B, S)).astype(np.int32)
    ilen = np.array([14, 9, 14], np.int32)
    slen = np.array([4, 2, 0], np.int32)
    cot = np.array([1.5, -2.0, 0.25], np.float32)

    t_logits = torch.tensor(logits, requires_grad=True)
    costs = monotonic_rnnt_loss_padded(
        t_logits, torch.tensor(labels), torch.tensor(ilen),
        torch.tensor(slen))
    (costs * torch.tensor(cot)).sum().backward()

    def f(lg):
        return jnp.sum(jax_loss(lg, jnp.asarray(labels), jnp.asarray(ilen),
                                jnp.asarray(slen)) * jnp.asarray(cot))

    val, g = jax.value_and_grad(f)(jnp.asarray(logits))
    np.testing.assert_allclose(costs.detach().numpy() @ cot, float(val),
                               rtol=1e-5)
    np.testing.assert_allclose(t_logits.grad.numpy(), np.asarray(g),
                               rtol=1e-4, atol=1e-6)


def test_torch_padded_align_restrict_golden():
    logits, labels, ilen, slen = golden.readme_batch()
    from monotonic_rnnt_tpu.interop.torch_binding import \
        monotonic_rnnt_loss_padded

    for shift, expected in golden.ALIGN_A_LOSSES.items():
        costs = monotonic_rnnt_loss_padded(
            torch.tensor(logits), torch.tensor(labels), torch.tensor(ilen),
            torch.tensor(slen), alignment=torch.tensor(golden.ALIGN_A[None]),
            max_distance_from_alignment=shift)
        np.testing.assert_allclose(costs.numpy(), [expected], rtol=1e-4)


def test_torch_padded_cost_only_no_grad():
    from monotonic_rnnt_tpu.interop.torch_binding import \
        monotonic_rnnt_loss_padded

    logits, labels, ilen, slen = golden.readme_batch()
    with torch.no_grad():
        costs = monotonic_rnnt_loss_padded(
            torch.tensor(logits), torch.tensor(labels), torch.tensor(ilen),
            torch.tensor(slen))
    np.testing.assert_allclose(costs.numpy(), [golden.README_LOSS], atol=1e-4)


def test_torch_packed_jax_engine_matches_native():
    """engine='jax' (the accelerator route: unpack -> padded JAX engine ->
    repack) produces the native packed path's exact costs and gradients —
    golden values, multibatch offsets, and the align-restricted variant."""
    acts, labels, ilen, slen = _packed_readme()
    costs = monotonic_rnnt_loss(acts, labels, ilen, slen, engine="jax")
    np.testing.assert_allclose(costs.detach().numpy(), [golden.README_LOSS],
                               atol=1e-4)
    costs.sum().backward()
    np.testing.assert_allclose(acts.grad.numpy().reshape(4, 3, 3),
                               golden.README_GRADS, atol=1e-2)

    # Align-restricted golden (reference 1.22 / 2.7).
    acts2, labels, ilen, slen = _packed_readme()
    c1 = monotonic_rnnt_loss(acts2, labels, ilen, slen,
                             alignment=torch.tensor(golden.ALIGN_A[None]),
                             max_distance_from_alignment=1, engine="jax")
    np.testing.assert_allclose(c1.detach().numpy(), [1.22], atol=1e-2)

    # Multibatch: packed offsets + per-sample gradient chain rule.
    logits, labels, ilen, slen, exp_losses, _ = golden.multibatch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    a_nat = torch.tensor(packed, requires_grad=True)
    a_jax = torch.tensor(packed, requires_grad=True)
    labels_t, ilen_t, slen_t = (torch.tensor(labels), torch.tensor(ilen),
                                torch.tensor(slen))
    c_nat = monotonic_rnnt_loss(a_nat, labels_t, ilen_t, slen_t,
                                engine="native")
    c_jax = monotonic_rnnt_loss(a_jax, labels_t, ilen_t, slen_t,
                                engine="jax")
    np.testing.assert_allclose(c_jax.detach().numpy(),
                               c_nat.detach().numpy(), atol=1e-4)
    w = torch.tensor([1.0, 0.5])
    (w * c_nat).sum().backward()
    (w * c_jax).sum().backward()
    np.testing.assert_allclose(a_jax.grad.numpy(), a_nat.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_torch_packed_jax_engine_bucket_padded_metadata():
    """Labels padded wider than max(label_lengths) (a fixed-width collate)
    and an alignment padded wider than max(input_lengths) must work on the
    jax engine exactly as they do on the native engine — regression: the
    jax route used to derive a negative label pad and crash in JAX."""
    acts, labels, ilen, slen = _packed_readme()
    wide_labels = torch.cat(
        [labels, torch.zeros((labels.shape[0], 3), dtype=labels.dtype)], 1)
    c_nat = monotonic_rnnt_loss(acts.detach().clone().requires_grad_(True),
                                wide_labels, ilen, slen, engine="native")
    a_jax = acts.detach().clone().requires_grad_(True)
    c_jax = monotonic_rnnt_loss(a_jax, wide_labels, ilen, slen,
                                engine="jax")
    np.testing.assert_allclose(c_jax.detach().numpy(), c_nat.detach().numpy(),
                               atol=1e-4)
    c_jax.sum().backward()
    assert np.isfinite(a_jax.grad.numpy()).all()

    # Alignment wider than max(input_lengths): same contract.
    align = torch.tensor(golden.ALIGN_A[None])
    wide_align = torch.cat(
        [align, torch.zeros((1, 2), dtype=align.dtype)], 1)
    c1 = monotonic_rnnt_loss(acts.detach().clone().requires_grad_(True),
                             wide_labels, ilen, slen, alignment=wide_align,
                             max_distance_from_alignment=1, engine="jax")
    np.testing.assert_allclose(c1.detach().numpy(), [1.22], atol=1e-2)
