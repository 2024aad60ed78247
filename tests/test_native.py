"""Native C++ engine tests: golden values + parity with the JAX oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu.native import rnnt_loss_native
from monotonic_rnnt_tpu.ops.packing import pack_acts
from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference
from monotonic_rnnt_tpu.ops.bands import bands_from_alignment

import golden

_ref = jax.jit(rnnt_loss_reference, static_argnames=("blank_id", "with_grads"))


def test_native_golden_readme():
    logits, labels, ilen, slen = golden.readme_batch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    costs, grads = rnnt_loss_native(packed, labels, ilen, slen)
    np.testing.assert_allclose(costs, [golden.README_LOSS], atol=1e-4)
    np.testing.assert_allclose(grads.reshape(4, 3, 3), golden.README_GRADS,
                               atol=1e-2)


def test_native_multibatch_golden():
    logits, labels, ilen, slen, exp_losses, exp_grads = golden.multibatch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    costs, grads = rnnt_loss_native(packed, labels, ilen, slen)
    np.testing.assert_allclose(costs, exp_losses, atol=1e-4)
    exp_packed = np.asarray(pack_acts(jnp.asarray(exp_grads), ilen, slen))
    np.testing.assert_allclose(grads, exp_packed, atol=1e-2)


def test_native_alignment_golden():
    logits, labels, ilen, slen = golden.readme_batch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    for shift, expected in {**golden.ALIGN_A_LOSSES}.items():
        costs, _ = rnnt_loss_native(packed, labels, ilen, slen,
                                    alignment=golden.ALIGN_A[None],
                                    max_distance_from_alignment=shift)
        np.testing.assert_allclose(costs, [expected], rtol=1e-4, atol=1e-4)
    for shift, expected in golden.ALIGN_B_LOSSES.items():
        costs, _ = rnnt_loss_native(packed, labels, ilen, slen,
                                    alignment=golden.ALIGN_B[None],
                                    max_distance_from_alignment=shift)
        np.testing.assert_allclose(costs, [expected], rtol=1e-4, atol=1e-4)


def test_native_matches_jax_oracle_random():
    rng = np.random.RandomState(11)
    batch, t, s, v = 5, 23, 7, 19
    ilen = rng.randint(s + 1, t + 1, size=(batch,)).astype(np.int32)
    slen = rng.randint(0, s + 1, size=(batch,)).astype(np.int32)
    logits = rng.randn(batch, t, s + 1, v).astype(np.float32) * 2
    labels = rng.randint(1, v, size=(batch, s)).astype(np.int32)

    c_ref, g_ref = _ref(jnp.asarray(logits), jnp.asarray(labels),
                        jnp.asarray(ilen), jnp.asarray(slen))
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    c_nat, g_nat = rnnt_loss_native(packed, labels, ilen, slen)
    np.testing.assert_allclose(c_nat, np.asarray(c_ref), rtol=1e-4, atol=1e-5)
    exp_packed = np.asarray(pack_acts(g_ref, ilen, slen))
    np.testing.assert_allclose(g_nat, exp_packed, rtol=1e-3, atol=1e-5)


def test_native_cost_only_and_errors():
    logits, labels, ilen, slen = golden.readme_batch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    costs, grads = rnnt_loss_native(packed, labels, ilen, slen,
                                    with_grads=False)
    assert grads is None
    np.testing.assert_allclose(costs, [golden.README_LOSS], atol=1e-4)
    from monotonic_rnnt_tpu.utils.status import RnntError
    with pytest.raises(RnntError):
        rnnt_loss_native(packed, labels, np.array([0], np.int32), slen)


def test_native_matches_jax_oracle_random_alignment_bands():
    # Fuzz the alignment-restricted path: random feasible alignments at
    # several band widths must give identical costs and grads in the native
    # engine and the JAX oracle (both clamp via the same band semantics).
    rng = np.random.RandomState(23)
    for case in range(6):
        batch, t, s, v = 3, 14, 5, 9
        ilen = rng.randint(s + 1, t + 1, size=(batch,)).astype(np.int32)
        slen = rng.randint(1, s + 1, size=(batch,)).astype(np.int32)
        logits = rng.randn(batch, t, s + 1, v).astype(np.float32) * 2
        labels = rng.randint(1, v, size=(batch, s)).astype(np.int32)

        # A feasible alignment: for each sample scatter its S_b labels onto
        # distinct frames < T_b, in order; blanks elsewhere.
        alignment = np.zeros((batch, t), np.int32)
        for b in range(batch):
            pos = np.sort(rng.choice(ilen[b], size=slen[b], replace=False))
            alignment[b, pos] = labels[b, :slen[b]]

        shift = int(rng.randint(0, 4))
        from monotonic_rnnt_tpu.ops.bands import bands_from_alignment
        bands = bands_from_alignment(jnp.asarray(alignment),
                                     jnp.asarray(ilen), jnp.asarray(slen),
                                     shift, 0)
        c_ref, g_ref = _ref(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(ilen), jnp.asarray(slen),
                            bands=bands)
        packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
        c_nat, g_nat = rnnt_loss_native(
            packed, labels, ilen, slen, alignment=alignment,
            max_distance_from_alignment=shift)
        np.testing.assert_allclose(c_nat, np.asarray(c_ref), rtol=1e-4,
                                   atol=1e-5,
                                   err_msg=f"case {case} shift {shift}")
        exp_packed = np.asarray(pack_acts(g_ref, ilen, slen))
        np.testing.assert_allclose(g_nat, exp_packed, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case {case} shift {shift}")
