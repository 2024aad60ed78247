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


@pytest.mark.parametrize("t", [12, 13])  # odd T exercises the T-pad path
def test_pallas_two_row_blocks_match_oracle(t):
    # The multi-t-row DP-fused regime (TT=2, the bf16 blocking) forced via
    # tiles= on f32 inputs so the comparison isolates the blocking from the
    # dtype. Odd T drives the wrapper's small-array padding and the
    # kernels' overhang-row masking. Repeated labels + nonzero blank (the
    # reference generator plants repeats around S/2, tests/random.cpp:31-35)
    # stress the label-gather slots.
    from monotonic_rnnt_tpu.ops.bands import default_bands
    from monotonic_rnnt_tpu.ops.helpers import extend_labels
    from monotonic_rnnt_tpu.ops.pallas.fused import _pipeline_dp_fused
    from monotonic_rnnt_tpu.ops.pallas.kernels import round_up

    B, S, V = 3, 6, 40
    blank = V - 1
    lg, lb, il, sl = golden.repeat_label_case(23, B, t, S, V, blank_id=blank)
    logits, labels = jnp.asarray(lg), jnp.asarray(lb)
    ilen, slen = jnp.asarray(il), jnp.asarray(sl)
    c_ref, g_ref = rnnt_loss_reference(logits, labels, ilen, slen,
                                       blank_id=blank)
    bands = default_bands(ilen, slen, t)
    labels_ext = extend_labels(labels, slen, S + 1)
    c2, g2 = jax.jit(_pipeline_dp_fused, static_argnums=(5, 6, 7, 8))(
        logits, labels_ext, ilen, slen, bands, blank, True, True,
        (2, round_up(V, 128)))
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_repeated_labels_nonzero_blank_both_pipelines(monkeypatch):
    # Deterministic repeated-label + blank_id=V-1 case through BOTH Pallas
    # orchestrations: the DP-fused default and the split fallback (forced
    # by patching the tile heuristic to reject the shape).
    from monotonic_rnnt_tpu.ops.pallas import fused as fused_mod

    B, T, S, V = 4, 16, 7, 33
    blank = V - 1
    lg, lb, il, sl = golden.repeat_label_case(29, B, T, S, V, blank_id=blank)
    args = tuple(jnp.asarray(a) for a in (lg, lb, il, sl))
    c_ref, g_ref = rnnt_loss_reference(*args, blank_id=blank)

    c_fused, g_fused = rnnt_loss_pallas(*args, blank_id=blank,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(c_fused), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    monkeypatch.setattr(fused_mod, "fused_dp_tiles", lambda *a, **k: None)
    c_split, g_split = jax.jit(
        _pal_eager, static_argnames=("blank_id", "interpret"))(
        *args, blank_id=blank, interpret=True)
    np.testing.assert_allclose(np.asarray(c_split), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_split), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_bf16_auto_two_row_matches_reference():
    # bf16 inputs auto-select the TT=2 regime (fused_dp_tiles dtype
    # dispatch); parity vs the reference backend on the SAME bf16 values
    # (both accumulate in f32, so only the one-multiply grad rounding and
    # the bf16 grad write differ).
    from monotonic_rnnt_tpu.ops.pallas.kernels import fused_dp_tiles

    B, T, S, V = 3, 13, 5, 40
    lg, lb, il, sl = golden.repeat_label_case(31, B, T, S, V)
    logits16 = jnp.asarray(lg).astype(jnp.bfloat16)
    args = (logits16, jnp.asarray(lb), jnp.asarray(il), jnp.asarray(sl))
    assert fused_dp_tiles(B, T, S + 1, V, jnp.bfloat16)[0] == 2
    c_ref, g_ref = rnnt_loss_reference(*args)
    c_pal, g_pal = rnnt_loss_pallas(*args, interpret=True)
    assert g_pal.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pal, dtype=np.float32),
        np.asarray(g_ref, dtype=np.float32), rtol=1e-2, atol=1e-3)


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


def test_pallas_vocab_tiled_stats_and_grad():
    # Force the multi-V-block path (online logsumexp + tiled grad) on a
    # small lattice: VT=128 over V=300 gives 3 V-blocks with an overhanging
    # last block (lane masking exercised). Compare against the single-call
    # oracle.
    from monotonic_rnnt_tpu.ops.pallas import kernels as K
    from monotonic_rnnt_tpu.ops.reference import compute_stats

    rng = np.random.RandomState(9)
    B, T, S, V = 2, 8, 4, 300
    logits = jnp.asarray(rng.randn(B, T, S + 1, V).astype(np.float32) * 3)
    labels = jnp.asarray(rng.randint(1, V, size=(B, S)).astype(np.int32))
    slen = jnp.asarray(np.array([S, S - 1], np.int32))

    lab_ext = jnp.concatenate(
        [labels, jnp.zeros((B, 1), jnp.int32)], axis=1)
    s_idx = jnp.arange(S + 1, dtype=jnp.int32)[None, :]
    lab_ext = jnp.where(s_idx < slen[:, None], lab_ext, -1)

    denom, lpb, lpl = K.softmax_stats(logits, lab_ext, 0, interpret=True,
                                      tiles=(8, 128))
    ref = compute_stats(logits, labels, slen, 0)
    np.testing.assert_allclose(np.asarray(denom), np.asarray(ref.denom),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lpb), np.asarray(ref.lp_blank),
                               rtol=1e-5, atol=1e-5)
    # lp_label only meaningful where s < S_b (oracle masks to -inf there).
    valid = np.asarray(s_idx < slen[:, None])[:, None, :] * np.ones(
        (B, T, S + 1), bool)
    np.testing.assert_allclose(np.where(valid, np.asarray(lpl), 0),
                               np.where(valid, np.asarray(ref.lp_label), 0),
                               rtol=1e-5, atol=1e-5)

    # Grad kernel with the same forced tiling, via the public pipeline parts.
    from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference as ref_fn
    ilen = jnp.full((B,), T, jnp.int32)
    c_ref, g_ref = ref_fn(logits, labels, ilen, slen)
    from monotonic_rnnt_tpu.ops.bands import default_bands, lattice_masks
    from monotonic_rnnt_tpu.ops.reference import (forward_backward,
                                                  occupancy_coefficients)
    bands = default_bands(ilen, slen, T)
    masks = lattice_masks(ilen, slen, bands, T, S + 1)
    alphas, betas, ll_fwd, _ = forward_backward(ref, masks, ilen, slen)
    occ, cb, cl = occupancy_coefficients(alphas, betas, ll_fwd, ilen, slen)
    grads = K.grad_pass(logits, ref.denom, occ, cb, cl, lab_ext, 0,
                        interpret=True, tiles=(8, 128))
    np.testing.assert_allclose(np.asarray(grads), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_fwdbwd_scan_matches_separate_scans():
    # The lane-packed bidirectional kernel must reproduce alpha_scan and
    # beta_scan exactly (same operands, one serial walk). Odd lengths per
    # sample exercise the in-kernel virtual-boundary switch; explicit
    # padding/tiles follow the fused.py contract.
    from monotonic_rnnt_tpu.ops.bands import default_bands, lattice_masks
    from monotonic_rnnt_tpu.ops.helpers import NEG_INF, mask_to_additive
    from monotonic_rnnt_tpu.ops.pallas import kernels as K
    from monotonic_rnnt_tpu.ops.reference import compute_stats

    rng = np.random.RandomState(11)
    B, T, S, V = 3, 21, 6, 40
    S1 = S + 1
    logits = jnp.asarray(rng.randn(B, T, S1, V).astype(np.float32) * 2)
    labels = jnp.asarray(rng.randint(1, V, size=(B, S)).astype(np.int32))
    ilen = jnp.asarray(np.array([T, 13, 8], np.int32))
    slen = jnp.asarray(np.array([S, 4, 0], np.int32))

    stats = compute_stats(logits, labels, slen, 0)
    masks = lattice_masks(ilen, slen, default_bands(ilen, slen, T), T, S1)
    amask = mask_to_additive(masks.alpha)
    bmask = mask_to_additive(masks.beta)
    s_idx = jnp.arange(S1, dtype=jnp.int32)[None, :]
    bvirt = mask_to_additive(s_idx == slen[:, None])

    bt, b_pad, tt, t_pad = K.dp_tiles(B, T, 2 * S1)
    pad = lambda x, f: jnp.pad(
        x, ((0, b_pad - B), (0, t_pad - T), (0, 0)), constant_values=f)
    lpb = pad(stats.lp_blank, 0.0)
    lpl = pad(stats.lp_label, 0.0)
    am_p, bm_p = pad(amask, NEG_INF), pad(bmask, NEG_INF)
    ilen_p = jnp.pad(ilen, (0, b_pad - B), constant_values=1)[:, None, None]
    bv_p = jnp.pad(bvirt, ((0, b_pad - B), (0, 0)), constant_values=NEG_INF)

    a_ref = K.alpha_scan(lpb, lpl, am_p, interpret=True, tiles=(bt, tt))
    b_ref = K.beta_scan(lpb, lpl, bm_p, ilen_p, bv_p, interpret=True,
                        tiles=(bt, tt))
    for unroll in (1, 4):
        a_fb, b_fb = K.fwdbwd_scan(lpb, lpl, am_p, bm_p, ilen_p, bv_p,
                                   interpret=True, tiles=(bt, tt),
                                   unroll=unroll)
        np.testing.assert_allclose(np.asarray(a_fb)[:B, :T],
                                   np.asarray(a_ref)[:B, :T], atol=1e-5)
        np.testing.assert_allclose(np.asarray(b_fb)[:B, :T],
                                   np.asarray(b_ref)[:B, :T], atol=1e-5)


def test_partial_stats_matches_oracle():
    # The TP path's pre-reduction kernel: (m, sum-exp) per cell, including
    # the multi-V-block online variant with an overhanging last block.
    from monotonic_rnnt_tpu.ops.pallas.kernels import softmax_stats_partial

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 5, 200).astype(np.float32) * 3)
    for tiles in (None, (8, 128)):
        m, se = softmax_stats_partial(x, interpret=True, tiles=tiles)
        np.testing.assert_allclose(np.asarray(m), np.max(np.asarray(x), -1),
                                   rtol=1e-6)
        exp_se = np.sum(np.exp(np.asarray(x) - np.asarray(m)[..., None]), -1)
        np.testing.assert_allclose(np.asarray(se), exp_se, rtol=1e-5)


def test_stream_copy_modes_exact():
    # Bandwidth-calibration kernels must be exact copies (the dependent
    # chains in bench.py/stream_bench.py rely on value preservation).
    from monotonic_rnnt_tpu.ops.pallas.stream import stream_copy

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1024, 256).astype(np.float32))
    for mode, kw in (("vmem", dict(block_rows=128)),
                     ("vmem", dict(block_rows=512)),
                     ("dma", dict(nbuf=1)), ("dma", dict(nbuf=4))):
        y = stream_copy(x, mode=mode, interpret=True, **kw)
        assert np.array_equal(np.asarray(y), np.asarray(x)), (mode, kw)
    with pytest.raises(ValueError):
        stream_copy(x, mode="vmem", block_rows=100, interpret=True)
    with pytest.raises(ValueError):
        stream_copy(x, mode="dma", nbuf=3, interpret=True)


def test_stream_copy_blocked_exact():
    # The blocked-layout controls (DP-fused block structure, bench.py's
    # bf16-gap diagnosis) must also be exact copies.
    from monotonic_rnnt_tpu.ops.pallas.stream import (
        stream_copy_blocked, stream_copy_blocked_tbsv)

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 8, 5, 128).astype(np.float32))
    for tt in (1, 2):
        y = stream_copy_blocked(x, tt=tt, interpret=True)
        assert np.array_equal(np.asarray(y), np.asarray(x)), tt
        yt = stream_copy_blocked_tbsv(x.transpose(1, 0, 2, 3), tt=tt,
                                      interpret=True)
        assert np.array_equal(np.asarray(yt),
                              np.asarray(x).transpose(1, 0, 2, 3)), tt
    with pytest.raises(ValueError):
        stream_copy_blocked(x, tt=3, interpret=True)


@pytest.mark.slow
def test_pipeline_split_fallback_matches_oracle():
    # Shapes whose resident [B, T, S1] footprint exceeds the DP-fused
    # budget must take the split pipeline (stats/fwdbwd/grad) and still
    # match the oracle end-to-end.
    from monotonic_rnnt_tpu.ops.pallas.kernels import fused_dp_tiles

    B, T, S, V = 8, 850, 299, 8
    assert fused_dp_tiles(B, T, S + 1, V) is None
    rng = np.random.RandomState(13)
    ilen = rng.randint(S + 1, T + 1, size=(B,)).astype(np.int32)
    slen = rng.randint(0, S + 1, size=(B,)).astype(np.int32)
    logits, labels, ilen, slen = _random_case(13, B, T, S, V, ilen, slen)
    c_ref, g_ref = rnnt_loss_reference(logits, labels, ilen, slen)
    c_pal, g_pal = rnnt_loss_pallas(logits, labels, ilen, slen,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    # And a shape that DOES fit must take the DP-fused path.
    assert fused_dp_tiles(4, 37, 10, 21) is not None


def test_pipeline_config_flag():
    # pipeline='split' forces the fallback on a shape the DP-fused path
    # would otherwise take (the reference's USE_NAIVE_KERNEL selection as
    # a runtime flag, gpu_rnnt.h:98-110); parity holds and the deferred
    # route reports unsupported. pipeline='fused' raises on an over-cap
    # shape instead of silently falling back.
    from monotonic_rnnt_tpu.ops.pallas.fused import deferred_grad_supported
    from monotonic_rnnt_tpu.ops.pallas.kernels import fused_dp_tiles
    from monotonic_rnnt_tpu.utils.config import config_override

    B, T, S, V = 3, 12, 5, 40
    blank = V - 1
    lg, lb, il, sl = golden.repeat_label_case(37, B, T, S, V, blank_id=blank)
    args = tuple(jnp.asarray(a) for a in (lg, lb, il, sl))
    assert fused_dp_tiles(B, T, S + 1, V) is not None
    c_ref, g_ref = rnnt_loss_reference(*args, blank_id=blank)
    with config_override(pipeline="split"):
        assert not deferred_grad_supported((B, T, S + 1, V))
        c_split, g_split = jax.jit(
            _pal_eager, static_argnames=("blank_id", "interpret"))(
            *args, blank_id=blank, interpret=True)
    np.testing.assert_allclose(np.asarray(c_split), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_split), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    with config_override(pipeline="fused"):
        with pytest.raises(ValueError, match="pipeline='fused'"):
            _pal_eager(jnp.zeros((8, 850, 300, 8), jnp.float32),
                       jnp.zeros((8, 299), jnp.int32),
                       jnp.full((8,), 850, jnp.int32),
                       jnp.full((8,), 299, jnp.int32), interpret=True)


def test_deferred_gradient_route_matches_reference():
    # Differentiating the public API with backend='pallas' takes the
    # deferred route (fwd = one stats+alpha read; bwd = beta+grad with the
    # cotangent folded in-kernel). Costs and weighted gradients must match
    # the reference backend, including an infeasible sample (inf cost,
    # finite zero grads).
    import jax
    from monotonic_rnnt_tpu.ops.loss import monotonic_rnnt_loss
    from monotonic_rnnt_tpu.ops.pallas.fused import deferred_grad_supported
    from monotonic_rnnt_tpu.utils.debug import interpret_mode

    rng = np.random.RandomState(17)
    B, T, S, V = 3, 14, 5, 40
    logits = jnp.asarray(rng.randn(B, T, S + 1, V).astype(np.float32) * 2)
    labels = jnp.asarray(rng.randint(1, V, size=(B, S)).astype(np.int32))
    ilen = jnp.asarray(np.array([T, 9, 6], np.int32))
    slen = jnp.asarray(np.array([S, 3, 0], np.int32))
    assert deferred_grad_supported(logits.shape)
    w = jnp.asarray([1.0, -0.5, 2.0], jnp.float32)

    def total(lg, backend):
        return jnp.sum(w * monotonic_rnnt_loss(lg, labels, ilen, slen,
                                               backend=backend))

    with interpret_mode():
        v_pal, g_pal = jax.jit(jax.value_and_grad(
            lambda lg: total(lg, "pallas")))(logits)
    v_ref, g_ref = jax.jit(jax.value_and_grad(
        lambda lg: total(lg, "reference")))(logits)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)

    # Infeasible lattice (S_b > T_b): cost inf, gradient exactly zero.
    bad_slen = jnp.asarray(np.array([S, 3, 5], np.int32))
    with interpret_mode():
        c_bad, g_bad = jax.jit(jax.value_and_grad(lambda lg: jnp.sum(
            monotonic_rnnt_loss(lg, labels, jnp.asarray([T, 9, 4]),
                                bad_slen, backend="pallas"))))(logits)
    assert not np.isfinite(float(c_bad))
    assert np.all(np.asarray(g_bad)[2] == 0.0)
    assert np.isfinite(np.asarray(g_bad)).all()
