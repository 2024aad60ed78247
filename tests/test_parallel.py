"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

This is the fake-backend facility the reference lacks (SURVEY.md §4): the
data-parallel and vocab-sharded paths must match the single-device oracle
bit-for-bit up to reduction order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference
from monotonic_rnnt_tpu.parallel import (make_data_parallel_loss,
                                         make_dp_tp_loss,
                                         make_per_sample_loss, make_mesh)


def _case(seed=0, batch=8, t=12, s=4, v=16):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(batch, t, s + 1, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(batch, s)).astype(np.int32))
    ilen = jnp.asarray(rng.randint(s + 1, t + 1, size=(batch,)).astype(np.int32))
    slen = jnp.asarray(rng.randint(0, s + 1, size=(batch,)).astype(np.int32))
    return logits, labels, ilen, slen


def test_data_parallel_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    logits, labels, ilen, slen = _case()
    mesh = make_mesh(data=8, model=1)
    loss_fn = make_data_parallel_loss(mesh, backend="reference")
    got = float(loss_fn(logits, labels, ilen, slen))
    ref_costs, _ = rnnt_loss_reference(logits, labels, ilen, slen)
    np.testing.assert_allclose(got, float(jnp.mean(ref_costs)), rtol=1e-6)


def test_per_sample_data_parallel():
    logits, labels, ilen, slen = _case(1)
    mesh = make_mesh(data=4, model=1)
    loss_fn = make_per_sample_loss(mesh, backend="reference")
    got = loss_fn(logits, labels, ilen, slen)
    ref_costs, _ = rnnt_loss_reference(logits, labels, ilen, slen)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_costs),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("data,model", [(1, 8), (2, 4), (4, 2)])
def test_dp_tp_loss_matches_oracle(data, model):
    logits, labels, ilen, slen = _case(2, batch=8, t=10, s=3, v=32)
    mesh = make_mesh(data=data, model=model)
    loss_fn = make_dp_tp_loss(mesh)
    got = float(loss_fn(logits, labels, ilen, slen))
    ref_costs, _ = rnnt_loss_reference(logits, labels, ilen, slen)
    np.testing.assert_allclose(got, float(jnp.mean(ref_costs)), rtol=1e-5)


def test_dp_tp_gradients_match_oracle():
    logits, labels, ilen, slen = _case(3, batch=4, t=8, s=3, v=16)
    mesh = make_mesh(data=2, model=4)
    loss_fn = make_dp_tp_loss(mesh, mean_over_batch=False)
    g_tp = jax.grad(lambda lg: loss_fn(lg, labels, ilen, slen))(logits)
    _, g_ref = rnnt_loss_reference(logits, labels, ilen, slen)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_blank_on_nonzero_shard():
    # blank id inside the second vocab shard exercises the cross-shard gather.
    rng = np.random.RandomState(4)
    batch, t, s, v = 4, 6, 2, 16
    blank = 9
    logits = jnp.asarray(rng.randn(batch, t, s + 1, v).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 8, size=(batch, s)).astype(np.int32))
    ilen = jnp.full((batch,), t, jnp.int32)
    slen = jnp.full((batch,), s, jnp.int32)
    mesh = make_mesh(data=2, model=4)
    loss_fn = make_dp_tp_loss(mesh, blank_id=blank, mean_over_batch=False)
    got = float(loss_fn(logits, labels, ilen, slen))
    from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference as ref
    ref_costs, _ = ref(logits, labels, ilen, slen, blank_id=blank)
    np.testing.assert_allclose(got, float(jnp.sum(ref_costs)), rtol=1e-5)


def _banded_tp_case(seed, batch, t, s, v, shift, blank_id=0):
    """Packed-band case: random monotonic alignment -> band -> packed logits."""
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width)
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(batch, t, s + 1, v).astype(np.float32))
    lab_lo, lab_hi = (1, v) if blank_id == 0 else (0, blank_id)
    labels = jnp.asarray(
        rng.randint(lab_lo, lab_hi, size=(batch, s)).astype(np.int32))
    ilen = rng.randint(max(s, 1), t + 1, size=(batch,)).astype(np.int32)
    slen = rng.randint(0, np.minimum(s, ilen) + 1, size=(batch,)).astype(
        np.int32)
    align = np.full((batch, t), blank_id, np.int32)
    for b in range(batch):
        pos = np.sort(rng.choice(ilen[b], size=slen[b], replace=False))
        align[b, pos] = np.asarray(labels)[b, :slen[b]]
    ilen, slen = jnp.asarray(ilen), jnp.asarray(slen)
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, shift,
                                 blank_id)
    w = int(required_band_width(ilen, slen, bands, t, s + 1))
    layout = compute_band_layout(ilen, slen, bands, t, s + 1, w)
    logits_band = pack_band(logits, layout)
    return logits_band, labels, ilen, slen, bands


@pytest.mark.parametrize("data,model", [(2, 4), (1, 8)])
def test_dp_tp_banded_matches_banded_oracle(data, model):
    from monotonic_rnnt_tpu.ops.banded import rnnt_loss_banded_reference
    from monotonic_rnnt_tpu.parallel import make_dp_tp_banded_loss

    logits_band, labels, ilen, slen, bands = _banded_tp_case(
        5, batch=4, t=14, s=5, v=32, shift=2)
    mesh = make_mesh(data=data, model=model)
    loss_fn = make_dp_tp_banded_loss(mesh, mean_over_batch=False)
    got = float(loss_fn(logits_band, labels, ilen, slen,
                        bands.min_s, bands.max_s))
    ref_costs, _ = rnnt_loss_banded_reference(logits_band, labels, ilen, slen,
                                              bands)
    np.testing.assert_allclose(got, float(jnp.sum(ref_costs)), rtol=1e-5)


def test_dp_tp_banded_gradients_match_banded_oracle():
    from monotonic_rnnt_tpu.ops.banded import rnnt_loss_banded_reference
    from monotonic_rnnt_tpu.parallel import make_dp_tp_banded_loss

    logits_band, labels, ilen, slen, bands = _banded_tp_case(
        6, batch=4, t=12, s=4, v=16, shift=1)
    mesh = make_mesh(data=2, model=4)
    loss_fn = make_dp_tp_banded_loss(mesh, mean_over_batch=False)
    g_tp = jax.grad(lambda lb: loss_fn(lb, labels, ilen, slen,
                                       bands.min_s, bands.max_s))(logits_band)
    _, g_ref = rnnt_loss_banded_reference(logits_band, labels, ilen, slen,
                                          bands)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_dp_tp_banded_blank_on_nonzero_shard():
    from monotonic_rnnt_tpu.ops.banded import rnnt_loss_banded_reference
    from monotonic_rnnt_tpu.parallel import make_dp_tp_banded_loss

    blank = 9  # model=4 over v=16 -> v_local=4, blank lives on shard 2
    logits_band, labels, ilen, slen, bands = _banded_tp_case(
        7, batch=4, t=10, s=3, v=16, shift=1, blank_id=blank)
    mesh = make_mesh(data=1, model=4)
    loss_fn = make_dp_tp_banded_loss(mesh, blank_id=blank,
                                     mean_over_batch=False)
    got = float(loss_fn(logits_band, labels, ilen, slen,
                        bands.min_s, bands.max_s))
    ref_costs, _ = rnnt_loss_banded_reference(logits_band, labels, ilen, slen,
                                              bands, blank_id=blank)
    np.testing.assert_allclose(got, float(jnp.sum(ref_costs)), rtol=1e-5)


def test_pallas_backend_inside_shard_map_traces():
    # Regression: pallas_call out_shapes must declare vma so the kernels
    # trace under shard_map with its default check_vma=True (caught
    # originally by benchmarks/scaling.py on TPU, where the compiled run is
    # validated). The vma check fires at trace time, so eval_shape covers it
    # on CPU; jax's interpret-mode evaluator cannot *execute* kernels inside
    # shard_map (its block slicing mixes manual-axes types upstream).
    from monotonic_rnnt_tpu.utils.config import config_override

    logits, labels, ilen, slen = _case(3, batch=8, t=8, s=3, v=8)
    mesh = make_mesh(data=4, model=1)
    with config_override(interpret=True):
        loss_fn = make_per_sample_loss(mesh, backend="pallas")
        out = jax.eval_shape(loss_fn, logits, labels, ilen, slen)
    assert out.shape == (8,) and out.dtype == jnp.float32
