"""Fused banded Pallas pipeline (the alignment-restricted TPU hot path).

Mirrors ops/pallas/fused.py on the packed [B, T, W, V] band layout
(ops/bands.py): HBM traffic is 2 reads + 1 write of the *band* tensor, i.e.
W/(S+1) of the unrestricted pipeline's — the TPU equivalent of the
reference's band-pruned storage and kernels (cpu_workspace_manager.h:286-297,
gpu_rnnt_kernel.h:58-72). The stats kernel folds the reachability masks into
the DP operand streams directly from the per-(b, t) window bounds
(bands.band_relative_bounds — the same bounds the XLA oracle's masks are
built from, so the paths cannot diverge), leaving only O(B·T) glue (layout,
shifts, terminal gather) plus the occupancy coefficients to XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ...utils.config import get_config
from ...utils.debug import emit_loss_debug
from ..banded import band_labels, band_occupancy_coefficients
from ..bands import (Bands, band_final_slot, band_relative_bounds,
                     band_virtual_next_rows, compute_band_layout)
from ..helpers import NEG_INF
from .kernels import (alpha_scan_banded, dp_tiles_banded, fwdbwd_scan_banded,
                      grad_pass, softmax_stats_banded)


def rnnt_loss_banded_pallas(
    logits_band: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    bands: Bands,
    blank_id: int = 0,
    with_grads: bool = True,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Banded costs (+ packed-layout grads) via the fused Pallas pipeline.

    Same contract as ops.banded.rnnt_loss_banded_reference.
    """
    from ...utils.debug import report_space
    report_space("banded", logits_band.shape, logits_band.dtype,
                 reads=2 if with_grads else 1,
                 writes=1 if with_grads else 0)
    costs, parts = _banded_fwd_parts(logits_band, labels, input_lengths,
                                     label_lengths, bands, blank_id,
                                     with_grads, interpret)
    if not with_grads:
        return costs, None
    denom, alphas, betas, ll_fwd = parts
    grads = _banded_grad_part(logits_band, labels, input_lengths,
                              label_lengths, bands, blank_id, interpret,
                              denom, alphas, betas, ll_fwd)
    return costs, grads


def _banded_fwd_parts(logits_band, labels, input_lengths, label_lengths,
                      bands, blank_id, with_betas, interpret):
    """Stats + DP scans; returns (costs, (denom, alphas, betas, ll))."""
    cfg = get_config()
    if interpret is None:
        interpret = cfg.interpret
    batch, t_max, w, v = logits_band.shape
    s1 = labels.shape[1] + 1
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)

    layout = compute_band_layout(ilen, slen, bands, t_max, s1, w)
    lab_band = band_labels(labels, slen, layout, s1)
    rel_bounds = band_relative_bounds(ilen, slen, bands, layout, t_max, s1)

    stats = softmax_stats_banded(logits_band, lab_band, rel_bounds, blank_id,
                                 with_beta=with_betas, interpret=interpret)

    # Pad B/T so every DP block is full; pad value NEG_INF keeps padded rows
    # off-lattice.
    bt, b_pad, tt, t_pad = dp_tiles_banded(batch, t_max, w)

    def _pad_small(x, fill):
        return jnp.pad(x, ((0, b_pad - batch), (0, t_pad - t_max), (0, 0)),
                       constant_values=fill)

    d_p = _pad_small(layout.d[:, :, None], 0)

    if with_betas:
        denom, lpba, lpla, lpbb, lplb = stats
        # One bidirectional kernel advances both serial chains per step —
        # the scans' wall time is loop/dependency latency, not VPU work.
        bvirt = band_virtual_next_rows(layout, slen)
        ilen_p = jnp.pad(ilen, (0, b_pad - batch), constant_values=1)
        alphas, betas = fwdbwd_scan_banded(
            _pad_small(lpba, NEG_INF), _pad_small(lpla, NEG_INF), d_p,
            _pad_small(lpbb, NEG_INF), _pad_small(lplb, NEG_INF),
            _pad_small(layout.d_next[:, :, None], 0),
            ilen_p[:, None, None], _pad_small(bvirt, NEG_INF),
            interpret=interpret, tiles=(bt, tt))
        alphas = alphas[:batch, :t_max]
        betas = betas[:batch, :t_max]
    else:
        denom, lpba, lpla = stats
        betas = None
        alphas = alpha_scan_banded(_pad_small(lpba, NEG_INF),
                                   _pad_small(lpla, NEG_INF), d_p,
                                   interpret=interpret,
                                   tiles=(bt, tt))[:batch, :t_max]

    ll_fwd = band_final_slot(alphas, layout, ilen, slen)
    return -ll_fwd, (denom, alphas, betas, ll_fwd)


def _banded_grad_part(logits_band, labels, input_lengths, label_lengths,
                      bands, blank_id, interpret, denom, alphas, betas,
                      ll_fwd, grad_scale=None):
    """Occupancy coefficients (optionally cotangent-scaled) + grad pass."""
    cfg = get_config()
    if interpret is None:
        interpret = cfg.interpret
    batch, t_max, w, v = logits_band.shape
    s1 = labels.shape[1] + 1
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    layout = compute_band_layout(ilen, slen, bands, t_max, s1, w)
    lab_band = band_labels(labels, slen, layout, s1)
    occ, cb, cl = band_occupancy_coefficients(alphas, betas, ll_fwd, ilen,
                                              slen, layout)
    if grad_scale is not None:
        sc = grad_scale.astype(jnp.float32)[:, None, None]
        occ, cb, cl = occ * sc, cb * sc, cl * sc
    grads = grad_pass(logits_band, denom, occ, cb, cl, lab_band, blank_id,
                      out_dtype=logits_band.dtype, interpret=interpret)
    emit_loss_debug(ll_fwd, betas[:, 0, 0], grads)
    return grads


def banded_deferred_fwd(logits_band, labels, input_lengths, label_lengths,
                        bands: Bands, blank_id: int = 0,
                        interpret: Optional[bool] = None):
    """Banded forward keeping SMALL residuals for a deferred gradient.

    One read of the band tensor + one bidirectional V-free walk; the
    gradient pass (one read + one write) runs in banded_deferred_bwd with
    the cost cotangent folded into the occupancy coefficients. Training
    traffic over [B, T, W, V] drops from 5 passes to 3, and the residuals
    are four [B, T, W] f32 arrays instead of the packed gradient tensor.
    """
    return _banded_fwd_parts(logits_band, labels, input_lengths,
                             label_lengths, bands, blank_id, True, interpret)


def banded_deferred_bwd(logits_band, labels, input_lengths, label_lengths,
                        bands: Bands, residuals, cost_cotangent,
                        blank_id: int = 0,
                        interpret: Optional[bool] = None):
    """The deferred banded gradient pass; returns packed-layout dlogits."""
    denom, alphas, betas, ll_fwd = residuals
    return _banded_grad_part(logits_band, labels, input_lengths,
                             label_lengths, bands, blank_id, interpret,
                             denom, alphas, betas, ll_fwd,
                             grad_scale=cost_cotangent)
