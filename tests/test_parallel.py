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


def _tp_joint_fn(params, enc_c, pred):
    e = enc_c.astype(jnp.float32) @ params["we"]
    p = pred.astype(jnp.float32) @ params["wp"]
    h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
    return h @ params["wv"] + params["bv"]


def _fused_tp_setup(seed=11, batch=4, t=10, s=3, v=16, de=6, dp_=5, j=8):
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(batch, t, de).astype(np.float32))
    pred = jnp.asarray(rng.randn(batch, s + 1, dp_).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, v, size=(batch, s)).astype(np.int32))
    ilen = jnp.asarray(rng.randint(s + 1, t + 1, (batch,)).astype(np.int32))
    slen = jnp.asarray(rng.randint(1, s + 1, (batch,)).astype(np.int32))
    params = {
        "we": jnp.asarray(rng.randn(de, j).astype(np.float32) * 0.5),
        "wp": jnp.asarray(rng.randn(dp_, j).astype(np.float32) * 0.5),
        "wv": jnp.asarray(rng.randn(j, v).astype(np.float32) * 0.5),
        "bv": jnp.asarray(rng.randn(v).astype(np.float32) * 0.1),
    }
    return enc, pred, labels, ilen, slen, params


def test_dp_tp_fused_joint_matches_monolithic():
    """Vocab-sharded fused-joint loss == monolithic oracle (loss + all grads).

    The joint output projection (wv, bv) is sharded over 'model'; the
    [B,T,S1,V] logits tensor never exists on any shard.
    """
    from jax.sharding import PartitionSpec as P

    from monotonic_rnnt_tpu import monotonic_rnnt_loss
    from monotonic_rnnt_tpu.parallel import MODEL_AXIS, make_dp_tp_fused_loss

    enc, pred, labels, ilen, slen, params = _fused_tp_setup()
    params_specs = {"we": P(), "wp": P(), "wv": P(None, MODEL_AXIS),
                    "bv": P(MODEL_AXIS)}
    mesh = make_mesh(data=2, model=4)
    loss_fn = make_dp_tp_fused_loss(mesh, _tp_joint_fn, params_specs,
                                    chunk_t=4, mean_over_batch=False)
    v_tp, g_tp = jax.value_and_grad(
        lambda e_, p_, pr: loss_fn(e_, p_, labels, ilen, slen, pr),
        argnums=(0, 1, 2))(enc, pred, params)

    def mono(e_, p_, pr):
        logits = _tp_joint_fn(pr, e_, p_)
        return jnp.sum(monotonic_rnnt_loss(logits, labels, ilen, slen,
                                           backend="reference"))

    v_m, g_m = jax.jit(jax.value_and_grad(mono, argnums=(0, 1, 2)))(
        enc, pred, params)
    np.testing.assert_allclose(float(v_tp), float(v_m), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_dp_tp_fused_joint_banded():
    """with_bands=True restricts the sharded fused loss like the oracle."""
    from jax.sharding import PartitionSpec as P

    from monotonic_rnnt_tpu import monotonic_rnnt_loss
    from monotonic_rnnt_tpu.ops.bands import bands_from_alignment
    from monotonic_rnnt_tpu.parallel import MODEL_AXIS, make_dp_tp_fused_loss

    enc, pred, labels, ilen, slen, params = _fused_tp_setup(seed=12)
    batch, t = enc.shape[:2]
    rng = np.random.RandomState(13)
    align = np.zeros((batch, t), np.int32)
    for b in range(batch):
        pos = np.sort(rng.choice(int(ilen[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels)[b, :int(slen[b])]
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, 1, 0)

    params_specs = {"we": P(), "wp": P(), "wv": P(None, MODEL_AXIS),
                    "bv": P(MODEL_AXIS)}
    mesh = make_mesh(data=2, model=2)
    loss_fn = make_dp_tp_fused_loss(mesh, _tp_joint_fn, params_specs,
                                    chunk_t=5, mean_over_batch=False,
                                    with_bands=True)
    got = float(loss_fn(enc, pred, labels, ilen, slen, params,
                        bands.min_s, bands.max_s))
    logits = _tp_joint_fn(params, enc, pred)
    ref = jnp.sum(monotonic_rnnt_loss(logits, labels, ilen, slen,
                                      bands=bands, backend="reference"))
    np.testing.assert_allclose(got, float(ref), rtol=1e-5)


def test_dp_tp_fused_banded_matches_monolithic():
    """Packed-band fused TP loss (O(W) compute, V sharded) == oracle.

    The full composition: joint evaluated on band cells only, streamed in
    T-chunks, output projection sharded over 'model', batch over 'data'.
    """
    from jax.sharding import PartitionSpec as P

    from monotonic_rnnt_tpu import monotonic_rnnt_loss
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              required_band_width)
    from monotonic_rnnt_tpu.parallel import (MODEL_AXIS,
                                             make_dp_tp_fused_banded_loss)

    enc, pred, labels, ilen, slen, params = _fused_tp_setup(seed=21)
    batch, t = enc.shape[:2]
    s1 = pred.shape[1]
    rng = np.random.RandomState(22)
    align = np.zeros((batch, t), np.int32)
    for b in range(batch):
        pos = np.sort(rng.choice(int(ilen[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels)[b, :int(slen[b])]
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, 1, 0)
    width = int(required_band_width(ilen, slen, bands, t, s1))

    def banded_joint(p, enc_c, pred_band):
        e = enc_c.astype(jnp.float32) @ p["we"]
        pb = pred_band.astype(jnp.float32) @ p["wp"]     # [B, Tc, W, J]
        h = jnp.tanh(e[:, :, None, :] + pb)
        return h @ p["wv"] + p["bv"]

    params_specs = {"we": P(), "wp": P(), "wv": P(None, MODEL_AXIS),
                    "bv": P(MODEL_AXIS)}
    mesh = make_mesh(data=2, model=2)
    loss_fn = make_dp_tp_fused_banded_loss(
        mesh, banded_joint, params_specs, band_width=width, chunk_t=5,
        mean_over_batch=False)

    v_tp, g_tp = jax.value_and_grad(
        lambda e_, p_, pr: loss_fn(e_, p_, labels, ilen, slen, pr,
                                   bands.min_s, bands.max_s),
        argnums=(0, 1, 2))(enc, pred, params)

    def mono(e_, p_, pr):
        logits = _tp_joint_fn(pr, e_, p_)
        return jnp.sum(monotonic_rnnt_loss(logits, labels, ilen, slen,
                                           bands=bands,
                                           backend="reference"))

    v_m, g_m = jax.jit(jax.value_and_grad(mono, argnums=(0, 1, 2)))(
        enc, pred, params)
    np.testing.assert_allclose(float(v_tp), float(v_m), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


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


def test_split_pipeline_inside_shard_map_traces():
    # pipeline='split' forced under shard_map: the split orchestration
    # (softmax_stats -> lane-packed fwdbwd_scan -> grad_pass) has its own
    # vma-typed carry inits and padding glue; the vma check fires at trace
    # time, so eval_shape covers it on the CPU mesh (the compiled execution
    # of the same config runs in scripts/tpu_acceptance.py on the chip).
    from monotonic_rnnt_tpu.utils.config import config_override

    logits, labels, ilen, slen = _case(5, batch=8, t=16, s=4, v=64)
    mesh = make_mesh(data=4, model=1)
    with config_override(interpret=True, pipeline="split"):
        loss_fn = make_per_sample_loss(mesh, backend="pallas")
        out = jax.eval_shape(loss_fn, logits, labels, ilen, slen)
    assert out.shape == (8,) and out.dtype == jnp.float32


def test_bf16_tt2_fused_inside_shard_map_traces():
    # The bf16 TT=2-tiled DP-fused path under shard_map (round 4's
    # multi-t-row kernels): tiles must actually select TT=2 on the
    # per-shard shape, and the trace must pass the vma checks.
    from monotonic_rnnt_tpu.ops.pallas.kernels import fused_dp_tiles
    from monotonic_rnnt_tpu.utils.config import config_override

    logits, labels, ilen, slen = _case(6, batch=8, t=32, s=8, v=256)
    assert fused_dp_tiles(2, 32, 9, 256, jnp.bfloat16)[0] == 2
    mesh = make_mesh(data=4, model=1)
    with config_override(interpret=True):
        loss_fn = make_per_sample_loss(mesh, backend="pallas")
        out = jax.eval_shape(loss_fn, logits.astype(jnp.bfloat16), labels,
                             ilen, slen)
    assert out.shape == (8,) and out.dtype == jnp.float32
