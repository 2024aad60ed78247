"""Fused Pallas monotonic RNN-T loss pipeline (TPU hot path).

Two orchestrations over the kernels in ops/pallas/kernels.py, both at the
algorithmic-minimum HBM traffic of 2 reads + 1 write of the [B, T, S1, V]
tensor:

  * DP-fused (default when the whole batch fits one block,
    kernels.fused_dp_tiles): stats_alpha_fused (1 read, alpha DP inside)
    then beta_grad_fused (1 read + 1 write, beta DP + occupancy inside) —
    ZERO exposed scan time; the serial recurrences hide behind the streams'
    DMA.
  * split (fallback for very large B*S1): softmax_stats, the lane-packed
    bidirectional fwdbwd_scan, grad_pass — same math, the DP runs as its
    own (batch-tiled) kernel.

Everything between kernels (window bounds, ll gather, small folds) is
O(B*T(*S1)) elementwise work left to XLA fusion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.config import get_config
from ...utils.debug import emit_loss_debug, report_space
from ..bands import Bands, _window_bounds, default_bands, lattice_masks
from ..helpers import NEG_INF, extend_labels, mask_to_additive
from ..reference import occupancy_coefficients
from .kernels import (alpha_scan, beta_grad_fused, dp_tiles, fused_dp_tiles,
                      fused_dp_vmem_bytes, fwdbwd_scan, grad_pass,
                      softmax_stats, stats_alpha_fused)


def rnnt_loss_pallas(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    bands: Optional[Bands] = None,
    with_grads: bool = True,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Monotonic RNN-T costs (+ logit grads) via the fused Pallas pipeline.

    Same contract as ops.reference.rnnt_loss_reference.
    """
    cfg = get_config()
    if interpret is None:
        interpret = cfg.interpret
    batch, t_max, s1, v = logits.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    if bands is None:
        bands = default_bands(ilen, slen, t_max)
    labels_ext = extend_labels(labels, slen, s1)

    fused_tiles = fused_dp_tiles(batch, t_max, s1, v, logits.dtype)
    if cfg.pipeline == "split":
        fused_tiles = None
    elif cfg.pipeline == "fused" and fused_tiles is None:
        raise ValueError(
            f"pipeline='fused' but shape {logits.shape} ({logits.dtype}) "
            "exceeds the DP-fused VMEM budget (fused_dp_tiles is None)")
    if fused_tiles is not None:
        report_space(
            "dp-fused", logits.shape, logits.dtype, tiles=fused_tiles,
            reads=2 if with_grads else 1, writes=1 if with_grads else 0,
            vmem_bytes=fused_dp_vmem_bytes(
                batch, t_max, s1, fused_tiles[1], tt=fused_tiles[0],
                itemsize=jnp.dtype(logits.dtype).itemsize))
        return _pipeline_dp_fused(logits, labels_ext, ilen, slen, bands,
                                  blank_id, with_grads, interpret,
                                  fused_tiles)

    report_space("split", logits.shape, logits.dtype,
                 reads=2 if with_grads else 1, writes=1 if with_grads else 0)
    masks = lattice_masks(ilen, slen, bands, t_max, s1)
    denom, lp_blank, lpl_raw = softmax_stats(logits, labels_ext, blank_id,
                                             interpret=interpret)
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, None, :]
    valid_s = s_idx < slen[:, None, None]
    lp_label = jnp.where(valid_s, lpl_raw, NEG_INF)

    # The DP kernels require full blocks: pad B to a multiple of the batch
    # tile and T to a multiple of the time tile. Only the small [B, T, S1]
    # arrays are padded — the big logits tensor never is. The grads path
    # runs the bidirectional kernel on 2*S1 packed lanes, so its tiles are
    # sized for the packed row.
    bt, b_pad, tt, t_pad = dp_tiles(batch, t_max,
                                    2 * s1 if with_grads else s1)

    def _pad_small(x, fill):
        return jnp.pad(x, ((0, b_pad - batch), (0, t_pad - t_max), (0, 0)),
                       constant_values=fill)

    lpb_p = _pad_small(lp_blank, 0.0)
    lpl_p = _pad_small(lp_label, 0.0)
    amask_p = _pad_small(mask_to_additive(masks.alpha), NEG_INF)

    if with_grads:
        # One bidirectional kernel advances both serial chains per step —
        # the scans' wall time is dependency latency, not VPU work.
        beta_virtual = mask_to_additive(
            jnp.arange(s1, dtype=jnp.int32)[None, :] == slen[:, None])
        bmask_p = _pad_small(mask_to_additive(masks.beta), NEG_INF)
        ilen_p = jnp.pad(ilen, (0, b_pad - batch), constant_values=1)
        bvirt_p = jnp.pad(beta_virtual, ((0, b_pad - batch), (0, 0)),
                          constant_values=NEG_INF)
        alphas, betas = fwdbwd_scan(lpb_p, lpl_p, amask_p, bmask_p,
                                    ilen_p[:, None, None], bvirt_p,
                                    interpret=interpret, tiles=(bt, tt))
        alphas = alphas[:batch, :t_max]
        betas = betas[:batch, :t_max]
    else:
        alphas = alpha_scan(lpb_p, lpl_p, amask_p, interpret=interpret,
                            tiles=(bt, tt))[:batch, :t_max]

    ll_fwd = jnp.take_along_axis(
        jnp.take_along_axis(alphas, jnp.clip(ilen - 1, 0)[:, None, None],
                            axis=1)[:, 0, :],
        slen[:, None], axis=1)[:, 0]
    costs = -ll_fwd
    if not with_grads:
        return costs, None

    occ, cb, cl = occupancy_coefficients(alphas, betas, ll_fwd, ilen, slen)
    # Write grads in the logits dtype: for bf16 training this halves the
    # gradient write traffic and saves the VJP's downstream cast pass (the
    # DP itself always accumulated in f32 above).
    grads = grad_pass(logits, denom, occ, cb, cl, labels_ext, blank_id,
                      out_dtype=logits.dtype, interpret=interpret)
    emit_loss_debug(ll_fwd, betas[:, 0, 0], grads)
    return costs, grads


def _dp_fused_alpha_half(logits, labels_ext, ilen, slen, bands, blank_id,
                         interpret, tiles):
    """stats_alpha_fused + windows + ll gather (the one-read forward)."""
    batch, t_max, s1, v = logits.shape
    a_lo, a_hi, b_lo, b_hi = _window_bounds(ilen, slen, bands, t_max, s1)
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :]
    valid_t = t_idx < ilen[:, None]
    # Conjoin t < T_b by emptying the window (hi < lo) on invalid rows.
    a_hi = jnp.where(valid_t, a_hi, -1)
    b_hi = jnp.where(valid_t, b_hi, -1)

    denom, lp_blank, lp_label, alphas = stats_alpha_fused(
        logits, labels_ext, a_lo, a_hi, blank_id, interpret=interpret,
        tiles=tiles)
    ll_fwd = jnp.take_along_axis(
        jnp.take_along_axis(alphas, jnp.clip(ilen - 1, 0)[:, None, None],
                            axis=1)[:, 0, :],
        slen[:, None], axis=1)[:, 0]
    return (denom, lp_blank, lp_label, alphas, ll_fwd,
            (b_lo, b_hi, valid_t))


def _dp_fused_grad_half(logits, labels_ext, ilen, slen, blank_id, interpret,
                        tiles, denom, lp_blank, lp_label, alphas, ll_fwd,
                        bwin, grad_scale=None):
    """beta_grad_fused + its small-array glue (the read+write backward)."""
    batch, t_max, s1, _ = logits.shape
    b_lo, b_hi, valid_t = bwin
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, None, :]
    badd = jnp.where((s_idx >= b_lo[:, :, None]) & (s_idx <= b_hi[:, :, None]),
                     0.0, NEG_INF).astype(jnp.float32)
    alpha_virt = jnp.broadcast_to(
        mask_to_additive(s_idx[0] == 0), (batch, s1))
    alpha_prev = jnp.concatenate([alpha_virt[:, None, :], alphas[:, :-1, :]],
                                 axis=1)
    ll_ok = jnp.isfinite(ll_fwd)
    llb = jnp.where(ll_ok, ll_fwd, 0.0)
    valid = valid_t[:, :, None] & ll_ok[:, None, None]
    aprev_m = jnp.where(valid, alpha_prev, NEG_INF)
    beta_virtual = mask_to_additive(
        jnp.arange(s1, dtype=jnp.int32)[None, :] == slen[:, None])

    grads, betas = beta_grad_fused(
        logits, denom, lp_blank + badd, lp_label + badd, aprev_m,
        ilen[:, None, None], llb[:, None, None], beta_virtual, labels_ext,
        blank_id, out_dtype=logits.dtype, interpret=interpret, tiles=tiles,
        grad_scale=grad_scale)
    emit_loss_debug(ll_fwd, betas[:, 0, 0], grads)
    return grads


def _pipeline_dp_fused(logits, labels_ext, ilen, slen, bands, blank_id,
                       with_grads, interpret, tiles):
    """DP-fused orchestration: two big-tensor passes, zero exposed scans.

    Produces bit-identical results to the split pipeline (the kernels fold
    the window masks via LSE(a, b) + m == LSE(a + m, b + m) and substitute
    the identical virtual-boundary rows); only the scheduling differs.
    """
    denom, lp_blank, lp_label, alphas, ll_fwd, bwin = _dp_fused_alpha_half(
        logits, labels_ext, ilen, slen, bands, blank_id, interpret, tiles)
    costs = -ll_fwd
    if not with_grads:
        return costs, None
    grads = _dp_fused_grad_half(logits, labels_ext, ilen, slen, blank_id,
                                interpret, tiles, denom, lp_blank, lp_label,
                                alphas, ll_fwd, bwin)
    return costs, grads


def deferred_grad_supported(logits_shape, dtype=jnp.float32) -> bool:
    """True when the deferred-gradient route (fwd 1 read, bwd 1 read +
    1 write, cotangent folded in-kernel) applies to this shape/dtype."""
    batch, t_max, s1, v = logits_shape
    if get_config().pipeline == "split":
        return False
    return fused_dp_tiles(batch, t_max, s1, v, dtype) is not None


def rnnt_loss_pallas_deferred_fwd(logits, labels, input_lengths,
                                  label_lengths, blank_id: int = 0,
                                  bands: Optional[Bands] = None,
                                  interpret: Optional[bool] = None):
    """Cost-only forward keeping SMALL residuals for a deferred gradient.

    The reference (and rnnt_loss_pallas) produce gradients during the
    forward pass, which costs an extra full read+write of the big tensor
    when the caller later scales them by the loss cotangent, and keeps a
    [B, T, S1, V] residual alive. This route runs ONE read now and defers
    the beta+gradient pass to rnnt_loss_pallas_deferred_bwd with the
    cotangent folded into the occupancy coefficients in-kernel: training
    traffic drops from 5 big-tensor passes to 3, and the residuals are
    four [B, T, S1] f32 arrays instead of the gradient tensor.

    Returns (costs [B] f32, residuals tuple to pass to the bwd).
    """
    cfg = get_config()
    if interpret is None:
        interpret = cfg.interpret
    batch, t_max, s1, v = logits.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    if bands is None:
        bands = default_bands(ilen, slen, t_max)
    labels_ext = extend_labels(labels, slen, s1)
    tiles = fused_dp_tiles(batch, t_max, s1, v, logits.dtype)
    report_space("dp-fused-deferred-fwd", logits.shape, logits.dtype,
                 tiles=tiles, reads=1, writes=0)
    denom, lp_blank, lp_label, alphas, ll_fwd, _ = _dp_fused_alpha_half(
        logits, labels_ext, ilen, slen, bands, blank_id, interpret, tiles)
    return -ll_fwd, (denom, lp_blank, lp_label, alphas, ll_fwd)


def rnnt_loss_pallas_deferred_bwd(logits, labels, input_lengths,
                                  label_lengths, residuals, cost_cotangent,
                                  blank_id: int = 0,
                                  bands: Optional[Bands] = None,
                                  interpret: Optional[bool] = None):
    """The deferred beta+gradient pass; returns dlogits (logits dtype).

    cost_cotangent: [B] — dL/dcosts, folded into the coefficients
    in-kernel (so dlogits == cost_cotangent[:, None, None, None] * grads
    up to one multiply's rounding).
    """
    cfg = get_config()
    if interpret is None:
        interpret = cfg.interpret
    batch, t_max, s1, v = logits.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    if bands is None:
        bands = default_bands(ilen, slen, t_max)
    labels_ext = extend_labels(labels, slen, s1)
    tiles = fused_dp_tiles(batch, t_max, s1, v, logits.dtype)
    report_space("dp-fused-deferred-bwd", logits.shape, logits.dtype,
                 tiles=tiles, reads=1, writes=1)
    denom, lp_blank, lp_label, alphas, ll_fwd = residuals
    a_lo, a_hi, b_lo, b_hi = _window_bounds(ilen, slen, bands, t_max, s1)
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :]
    valid_t = t_idx < ilen[:, None]
    b_hi = jnp.where(valid_t, b_hi, -1)
    scale = cost_cotangent.astype(jnp.float32)[:, None, None]
    return _dp_fused_grad_half(logits, labels_ext, ilen, slen, blank_id,
                               interpret, tiles, denom, lp_blank, lp_label,
                               alphas, ll_fwd, (b_lo, b_hi, valid_t),
                               grad_scale=scale)
