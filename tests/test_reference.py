"""Golden-value tests for the pure-JAX oracle (reference tests/test_cpu.cpp).

All calls go through jit: eager per-op dispatch of the scan-based lattice is
pathologically slow on the CPU test backend, and jit is the only supported
production path anyway.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu.ops.bands import bands_from_alignment
from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference as _ref_eager

import golden

rnnt_loss_reference = jax.jit(
    _ref_eager, static_argnames=("blank_id", "with_grads"))


def test_readme_forward():
    logits, labels, ilen, slen = golden.readme_batch()
    costs, _ = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(ilen), jnp.asarray(slen),
                                   with_grads=False)
    np.testing.assert_allclose(np.asarray(costs), [golden.README_LOSS], atol=1e-4)


def test_readme_grads():
    logits, labels, ilen, slen = golden.readme_batch()
    costs, grads = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.asarray(ilen), jnp.asarray(slen))
    np.testing.assert_allclose(np.asarray(costs), [golden.README_LOSS], atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[0]), golden.README_GRADS, atol=1e-2)


def test_cost_only_matches_cost_and_grad():
    logits, labels, ilen, slen = golden.readme_batch()
    c1, _ = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                jnp.asarray(ilen), jnp.asarray(slen),
                                with_grads=False)
    c2, _ = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                jnp.asarray(ilen), jnp.asarray(slen))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


@pytest.mark.parametrize("t_pad,s_pad", [(None, None), (7, 5)])
def test_multibatch_variable_lengths(t_pad, s_pad):
    logits, labels, ilen, slen, exp_losses, exp_grads = golden.multibatch(
        t_pad, s_pad)
    costs, grads = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.asarray(ilen), jnp.asarray(slen))
    np.testing.assert_allclose(np.asarray(costs), exp_losses, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads), exp_grads, atol=1e-2)


def test_fwd_bwd_consistency():
    from monotonic_rnnt_tpu.ops.bands import default_bands, lattice_masks
    from monotonic_rnnt_tpu.ops.reference import (compute_stats,
                                                  forward_backward)
    logits, labels, ilen, slen, _, _ = golden.multibatch()

    @jax.jit
    def lls(logits, labels, ilen, slen):
        stats = compute_stats(logits, labels, slen, 0)
        t_max, s1 = logits.shape[1], logits.shape[2]
        bands = default_bands(ilen, slen, t_max)
        masks = lattice_masks(ilen, slen, bands, t_max, s1)
        _, _, ll_fwd, ll_bwd = forward_backward(stats, masks, ilen, slen)
        return ll_fwd, ll_bwd

    ll_fwd, ll_bwd = lls(jnp.asarray(logits), jnp.asarray(labels),
                         jnp.asarray(ilen), jnp.asarray(slen))
    np.testing.assert_allclose(np.asarray(ll_fwd), np.asarray(ll_bwd), atol=1e-4)


@pytest.mark.parametrize("shift", [3, 2, 1, 0])
def test_alignment_restriction_a(shift):
    logits, labels, ilen, slen = golden.readme_batch()
    alignment = golden.ALIGN_A[None]
    bands = bands_from_alignment(jnp.asarray(alignment), jnp.asarray(ilen),
                                 jnp.asarray(slen), shift, blank_id=0)
    costs, grads = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.asarray(ilen), jnp.asarray(slen),
                                       bands=bands)
    expected = golden.ALIGN_A_LOSSES[min(shift, 2)]
    np.testing.assert_allclose(np.asarray(costs), [expected], atol=1e-4)
    assert np.all(np.isfinite(np.asarray(grads)))


@pytest.mark.parametrize("shift", [1, 0])
def test_alignment_restriction_b(shift):
    logits, labels, ilen, slen = golden.readme_batch()
    alignment = golden.ALIGN_B[None]
    bands = bands_from_alignment(jnp.asarray(alignment), jnp.asarray(ilen),
                                 jnp.asarray(slen), shift, blank_id=0)
    costs, _ = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(ilen), jnp.asarray(slen),
                                   bands=bands)
    np.testing.assert_allclose(np.asarray(costs),
                               [golden.ALIGN_B_LOSSES[shift]], rtol=1e-4,
                               atol=1e-4)


def test_no_inf_nan_random():
    # Property test mirroring tests/test_cpu.cpp:297-333 (T=50, S=10, V=15).
    rng = np.random.RandomState(0)
    batch, t, s, v = 4, 50, 10, 15
    logits = rng.uniform(0, 1, size=(batch, t, s + 1, v)).astype(np.float32)
    labels = rng.randint(1, v, size=(batch, s)).astype(np.int32)
    ilen = np.array([50, 37, 11, 50], np.int32)
    slen = np.array([10, 10, 10, 0], np.int32)
    costs, grads = rnnt_loss_reference(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.asarray(ilen), jnp.asarray(slen))
    assert np.all(np.isfinite(np.asarray(costs)))
    assert np.all(np.isfinite(np.asarray(grads)))


def test_empty_label_sequence():
    # S_b = 0: the loss is the sum of blank log-probs over all frames.
    rng = np.random.RandomState(1)
    logits = rng.randn(1, 6, 4, 5).astype(np.float32)
    labels = np.zeros((1, 3), np.int32)
    costs, grads = rnnt_loss_reference(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(np.array([6], np.int32)),
        jnp.asarray(np.array([0], np.int32)))
    lp = jax.nn.log_softmax(jnp.asarray(logits[0, :, 0, :]), axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(costs)[0], -float(jnp.sum(lp)),
                               rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(grads)))


def test_select_label_logits_matches_gather():
    # The gather-free label pick (helpers.select_label_logits) must equal
    # take_along_axis everywhere a real id is selected, and yield 0.0 for
    # the -1 sentinel / out-of-range shard-relative ids (callers mask).
    # It exists because the V-axis gather can crash the TPU worker
    # (round-5 fuzz find; see helpers.py).
    import jax.numpy as jnp
    import numpy as np

    from monotonic_rnnt_tpu.ops.helpers import select_label_logits

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 5, 7, 11).astype(np.float32))
    lab = rng.randint(0, 11, (3, 7)).astype(np.int32)
    lab[0, 2] = -1          # extend_labels sentinel
    lab[1, 4] = 11          # out-of-shard relative id
    got = np.asarray(select_label_logits(x, jnp.asarray(lab)[:, None, :]))
    want = np.take_along_axis(np.asarray(x),
                              np.clip(lab, 0, 10)[:, None, :, None],
                              axis=-1)[..., 0]
    valid = (lab >= 0) & (lab < 11)
    np.testing.assert_array_equal(got[:, :, :][np.broadcast_to(
        valid[:, None, :], got.shape)], want[np.broadcast_to(
        valid[:, None, :], want.shape)])
    assert (got[np.broadcast_to(~valid[:, None, :], got.shape)] == 0.0).all()
