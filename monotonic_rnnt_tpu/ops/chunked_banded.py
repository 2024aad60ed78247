"""Banded memory-efficient fused-joint loss: the full O(W) training path.

ops/chunked.py removes the [B, T, S+1, V] activation from memory by
streaming T-chunks; this module additionally removes the S+1 factor from
*compute*: the joint network itself is evaluated only on the packed band
window (ops/bands.py BandLayout), so the dominant training-time matmuls
(joint hidden + vocab projections) and the loss kernels all scale with the
static band width W instead of S+1. Combined effect for an
alignment-restricted long utterance: O(B·Tc·W·V) peak memory and
O(B·T·W·(H+V)) joint FLOPs, vs the reference's band-pruned *storage* with
full recompute per cell (cpu_workspace_manager.h:286-297).

Structure mirrors ops/chunked.py (alpha chunk scan forward; one reverse
chunk scan computing betas + dlogits + the joint VJP), with the band-coord
recurrences of ops/banded.py (per-step window shifts d/d_next in {0, 1}).

The joint function contract differs from the full-lattice one — the
predictor rows are gathered per cell:

    logits_band_chunk = joint_fn(params, enc_chunk [B, Tc, De],
                                 pred_band [B, Tc, W, Dp]) -> [B, Tc, W, V]

(for an additive joint, project enc once per (b, t) and broadcast over W).
The reference has no counterpart: its API receives materialized activations.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..utils.status import RnntError, Status
from .banded import BandStats, band_gradients, band_labels, band_stats
from .bands import (Bands, band_final_slot, band_lattice_masks,
                    band_virtual_next_rows, compute_band_layout)
from .chunked import _carry_vma, _chunk, _pad_t, _psum_to_primal, _vary_to
from .helpers import (NEG_INF, log_sum_exp, mask_to_additive, shift_left_s,
                      shift_right_s)


def _band_chunk_stats(logits_c, lab_k, blank_id, axis_name):
    """(BandStats, v_offset) for one chunk's packed band logits.

    With axis_name set, logits_c is this shard's local V slice (vocab
    tensor parallelism; ops/collective.py).

    On TPU the fused Pallas stats kernel computes this in ONE read of the
    chunk's band logits — the 3-D lab_k streams per-t label blocks (see
    kernels._label_operand); gating per loss.use_pallas_kernels."""
    if axis_name is None:
        from .loss import use_pallas_kernels

        if use_pallas_kernels():
            from .pallas.kernels import softmax_stats

            denom, lp_blank, lpl_raw = softmax_stats(logits_c, lab_k,
                                                     blank_id)
            lp_label = jnp.where(lab_k >= 0, lpl_raw, NEG_INF)
            return BandStats(denom=denom, lp_blank=lp_blank,
                             lp_label=lp_label), 0
        return band_stats(logits_c, lab_k, blank_id), 0
    from .collective import sharded_band_stats

    return sharded_band_stats(logits_c.astype(jnp.float32), lab_k, blank_id,
                              axis_name)


def _prep_banded(enc, ilen, slen, s1, bands, width, chunk_t):
    """Band layout + all chunked [nC, B, Tc, ...] glue arrays."""
    batch, t_max, _ = enc.shape
    n_chunks = -(-t_max // chunk_t)
    t_pad = n_chunks * chunk_t
    layout = compute_band_layout(ilen, slen, bands, t_max, s1, width)
    w = layout.width
    masks = band_lattice_masks(ilen, slen, bands, layout, t_max, s1)
    idx = layout.offset[:, :, None] + jnp.arange(w,
                                                 dtype=jnp.int32)[None, None,
                                                                  :]
    bvirt = band_virtual_next_rows(layout, slen)

    def ck(x, fill):
        return _chunk(_pad_t(x, t_pad, fill), n_chunks, chunk_t)

    return dict(
        layout=layout, w=w, n_chunks=n_chunks, t_pad=t_pad,
        amask=ck(mask_to_additive(masks.alpha), NEG_INF),
        bmask=ck(mask_to_additive(masks.beta), NEG_INF),
        bvirt=ck(bvirt, NEG_INF),
        idx=ck(idx, 0),
        d=ck(layout.d, 0),
        d_next=ck(layout.d_next, 0),
        enc=ck(enc, 0.0),
    )


def _gather_pred(pred, idx_c):
    """pred [B, S1, Dp], idx_c [B, Tc, W] -> [B, Tc, W, Dp].

    One-hot MXU matmul, NOT take_along_axis: a [B, Tc, W]-indexed gather
    lowers to serialized dynamic slices on TPU (~0.5 ms at the banded
    benchmark shape — the same trap band_labels documents, ops/banded.py).
    precision=HIGHEST keeps f32 operands un-rounded, and each output
    element receives exactly one nonzero term, so this is exact selection;
    its VJP is the matching transposed matmul (no scatter).
    """
    s1 = pred.shape[1]
    onehot = (idx_c[..., None] == jnp.arange(s1, dtype=idx_c.dtype)
              ).astype(jnp.float32)
    out = jnp.einsum("btws,bsd->btwd", onehot, pred.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(pred.dtype)


def _alphas_and_costs(enc, pred, labels, ilen, slen, joint_params, bands,
                      joint_fn, blank_id, chunk_t, width, axis_name):
    batch, t_max, _ = enc.shape
    s1 = pred.shape[1]
    P = _prep_banded(enc, ilen, slen, s1, bands, width, chunk_t)
    w = P["w"]
    lab_band = band_labels(labels, slen, P["layout"], s1)
    lab_c = _chunk(_pad_t(lab_band, P["t_pad"], -1), P["n_chunks"], chunk_t)

    w_lane = jnp.arange(w, dtype=jnp.int32)[None, :]
    row_vma = _carry_vma(enc, pred, labels, ilen, slen,
                         joint_params) - {axis_name}
    alpha_virt = _vary_to(jnp.zeros((batch, w), jnp.float32)
                          + mask_to_additive(w_lane == 0), row_vma)

    def alpha_chunk(carry, xs):
        enc_chunk, lab_k, am_k, d_k, idx_k = xs
        logits_c = joint_fn(joint_params, enc_chunk,
                            _gather_pred(pred, idx_k))
        stats, _ = _band_chunk_stats(logits_c, lab_k, blank_id, axis_name)
        lpbm = stats.lp_blank + am_k
        lplm = stats.lp_label + shift_left_s(am_k)

        def step(row, ts):
            lpb_t, lpl_t, sh = ts
            aligned = jnp.where(sh, shift_left_s(row), row)
            new = log_sum_exp(aligned + lpb_t,
                              shift_right_s(aligned + lpl_t))
            return new, new

        row, alphas_c = jax.lax.scan(
            step, carry,
            (jnp.moveaxis(lpbm, 1, 0), jnp.moveaxis(lplm, 1, 0),
             jnp.moveaxis(d_k[:, :, None] == 1, 1, 0)))
        return row, jnp.moveaxis(alphas_c, 0, 1)           # [B, Tc, W]

    _, alphas_c = jax.lax.scan(
        jax.checkpoint(alpha_chunk), alpha_virt,
        (P["enc"], lab_c, P["amask"], P["d"], P["idx"]))
    alphas = jnp.moveaxis(alphas_c, 0, 1).reshape(
        batch, P["t_pad"], w)[:, :t_max]

    ll_fwd = band_final_slot(alphas, P["layout"], ilen, slen)
    return alphas, ll_fwd


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _fused_banded_core(enc, pred, labels, ilen, slen, joint_params, band_min,
                       band_max, joint_fn, blank_id, chunk_t, width,
                       axis_name):
    _, ll_fwd = _alphas_and_costs(enc, pred, labels, ilen, slen,
                                  joint_params, Bands(band_min, band_max),
                                  joint_fn, blank_id, chunk_t, width,
                                  axis_name)
    return -ll_fwd


def _fused_banded_fwd(enc, pred, labels, ilen, slen, joint_params, band_min,
                      band_max, joint_fn, blank_id, chunk_t, width,
                      axis_name):
    alphas, ll_fwd = _alphas_and_costs(
        enc, pred, labels, ilen, slen, joint_params,
        Bands(band_min, band_max), joint_fn, blank_id, chunk_t, width,
        axis_name)
    res = (enc, pred, labels, ilen, slen, joint_params, band_min, band_max,
           alphas, ll_fwd)
    return -ll_fwd, res


def _fused_banded_bwd(joint_fn, blank_id, chunk_t, width, axis_name, res, ct):
    """Betas + gradients in one reverse chunk scan (band coordinates).

    Each chunk's band logits are evaluated once (jax.vjp primal) and reused
    for the beta recurrence and the dlogits -> joint-VJP push; the incoming
    cotangent is folded into the occupancy coefficients. d_pred accumulates
    by scatter-add through the band gather's transpose.
    """
    (enc, pred, labels, ilen, slen, joint_params, band_min, band_max,
     alphas, ll_fwd) = res
    bands = Bands(band_min, band_max)
    batch, t_max, _ = enc.shape
    s1 = pred.shape[1]
    P = _prep_banded(enc, ilen, slen, s1, bands, width, chunk_t)
    w, layout = P["w"], P["layout"]
    lab_band = band_labels(labels, slen, layout, s1)
    lab_c = _chunk(_pad_t(lab_band, P["t_pad"], -1), P["n_chunks"], chunk_t)

    # alpha(t-1, s) realigned into the coordinates of t (band-coordinate
    # analogue of chunked.py's alpha_prev), chunked like enc.
    w_lane = jnp.arange(w, dtype=jnp.int32)[None, :]
    virt = jnp.broadcast_to(mask_to_additive(w_lane == 0)[None],
                            (batch, 1, w))
    ap = jnp.concatenate([virt, alphas[:, :-1, :]], axis=1)
    alpha_prev = jnp.where(layout.d[:, :, None] == 1, shift_left_s(ap), ap)
    aprev_c = _chunk(_pad_t(alpha_prev, P["t_pad"], NEG_INF), P["n_chunks"],
                     chunk_t)

    ll_ok = jnp.isfinite(ll_fwd)
    llb = jnp.where(ll_ok, ll_fwd, 0.0)[:, None, None]
    wt = ct.astype(jnp.float32)[:, None, None]
    t_base = jnp.arange(P["n_chunks"] - 1, -1, -1, dtype=jnp.int32) * chunk_t
    tl_idx = jnp.arange(chunk_t, dtype=jnp.int32)
    b_idx = jnp.arange(batch)[:, None, None]

    def chunk_bwd(carry, xs):
        beta_row, d_pred_acc, d_params_acc = carry
        enc_chunk, lab_k, bm_k, dn_k, bv_k, idx_k, t0, aprev_k = xs
        logits_c, joint_vjp = jax.vjp(
            lambda params, e_c, pb: joint_fn(params, e_c, pb),
            joint_params, enc_chunk, _gather_pred(pred, idx_k))
        stats, v_offset = _band_chunk_stats(logits_c, lab_k, blank_id,
                                            axis_name)

        ts_local = jnp.arange(chunk_t - 1, -1, -1, dtype=jnp.int32)

        def step(row, ts):
            lpb_t, lpl_t, bm_t, dn_t, bv_t, tl = ts
            use_virtual = (t0 + tl + 1 >= ilen)[:, None]
            nxt = jnp.where(use_virtual, bv_t, row)
            # beta(t+1) realigned into t's coordinates — exactly the
            # beta_next row the gradient coefficients need (pre-mask).
            realigned = jnp.where(dn_t, shift_right_s(nxt), nxt)
            new = log_sum_exp(realigned + lpb_t,
                              shift_left_s(realigned) + lpl_t) + bm_t
            return new, (new, realigned)

        beta_row, (betas_rev, bnext_rev) = jax.lax.scan(
            step, beta_row,
            (jnp.moveaxis(stats.lp_blank, 1, 0)[::-1],
             jnp.moveaxis(stats.lp_label, 1, 0)[::-1],
             jnp.moveaxis(bm_k, 1, 0)[::-1],
             jnp.moveaxis(dn_k[:, :, None] == 1, 1, 0)[::-1],
             jnp.moveaxis(bv_k, 1, 0)[::-1],
             ts_local))
        betas_k = jnp.moveaxis(betas_rev[::-1], 0, 1)      # [B, Tc, W]
        bnext_k = jnp.moveaxis(bnext_rev[::-1], 0, 1)

        t_glob = t0 + tl_idx
        valid_t = ((t_glob[None, :, None] < ilen[:, None, None])
                   & ll_ok[:, None, None])

        def coef(b):
            return jnp.where(valid_t, jnp.exp(aprev_k + b - llb), 0.0) * wt

        dlogits = band_gradients(
            logits_c, stats.denom, lab_k, coef(betas_k), coef(bnext_k),
            coef(shift_left_s(bnext_k)), blank_id,
            v_offset=v_offset).astype(logits_c.dtype)
        d_params, d_enc_c, d_pred_band = joint_vjp(dlogits)
        d_pred_acc = d_pred_acc.at[b_idx, idx_k].add(
            d_pred_band.astype(d_pred_acc.dtype))
        return (beta_row, d_pred_acc,
                jax.tree.map(jnp.add, d_params_acc, d_params)), d_enc_c

    # Carry vma as in chunked.py: beta rows collapse the model axis (psum'd
    # stats); the accumulators keep each primal's own vma (jax.vjp already
    # reduces every cotangent to its primal's varying axes).
    row_vma = _carry_vma(enc, pred, labels, ilen, slen,
                         joint_params, ct) - {axis_name}
    init = (_vary_to(jnp.full((batch, w), NEG_INF, jnp.float32), row_vma),
            jnp.zeros_like(pred),
            jax.tree.map(jnp.zeros_like, joint_params))
    (_, d_pred, d_params), d_enc_rev = jax.lax.scan(
        jax.checkpoint(chunk_bwd), init,
        (P["enc"][::-1], lab_c[::-1], P["bmask"][::-1], P["d_next"][::-1],
         P["bvirt"][::-1], P["idx"][::-1], t_base, aprev_c[::-1]))
    d_enc = (jnp.moveaxis(d_enc_rev[::-1], 0, 1)
             .reshape(batch, P["t_pad"], -1)[:, :t_max].astype(enc.dtype))
    d_enc = _psum_to_primal(d_enc, enc)
    d_pred = _psum_to_primal(d_pred, pred)
    d_params = jax.tree.map(_psum_to_primal, d_params, joint_params)
    return (d_enc, d_pred, None, None, None, d_params, None, None)


_fused_banded_core.defvjp(_fused_banded_fwd, _fused_banded_bwd)


def rnnt_loss_fused_joint_banded(
    enc: jnp.ndarray,
    pred: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    joint_fn: Callable,
    joint_params,
    *,
    bands: Bands,
    band_width: int,
    blank_id: int = 0,
    chunk_t: int = 32,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Alignment-restricted costs from encoder/predictor outputs, O(W) compute.

    Args:
      enc: [B, T, De] encoder outputs; pred: [B, S+1, Dp] predictor rows.
      labels / input_lengths / label_lengths / blank_id: as usual.
      joint_fn: (params, enc_chunk [B,Tc,De], pred_band [B,Tc,W,Dp]) ->
        [B, Tc, W, V] raw logits — pred rows arrive pre-gathered per band
        cell (see module docstring).
      joint_params: pytree of joint parameters.
      bands: the restriction (packed-layout contract as in
        monotonic_rnnt_loss_banded; wider spans are clipped to band_width).
      band_width: static packed window width W (size with
        bands.required_band_width, round up to a multiple of 8).
      chunk_t: frames per streamed chunk (static).
      axis_name: if set, the vocab axis is sharded over this named mesh axis
        (call inside shard_map; see rnnt_loss_fused_joint's axis_name).

    Returns [B] f32 costs, differentiable w.r.t. enc, pred, joint_params.
    """
    if enc.ndim != 3 or pred.ndim != 3 or enc.shape[0] != pred.shape[0]:
        raise RnntError(Status.INVALID_VALUE,
                        f"enc must be [B,T,De] and pred [B,S+1,Dp] with the "
                        f"same B; got {enc.shape} and {pred.shape}")
    s1 = pred.shape[1]
    if labels.ndim != 2 or labels.shape[0] != enc.shape[0] or (
            labels.shape[1] < s1 - 1) or (labels.shape[1] > s1):
        raise RnntError(Status.INVALID_VALUE,
                        f"labels must be [B, S] or [B, S+1]; got "
                        f"{labels.shape} with pred S+1 = {s1}")
    if not 0 < band_width <= s1:
        raise RnntError(Status.INVALID_VALUE,
                        f"band_width must be in (0, S+1]; got {band_width} "
                        f"with S+1 = {s1}")
    for name, arr in (("input_lengths", input_lengths),
                      ("label_lengths", label_lengths)):
        if arr.shape != (enc.shape[0],) or not jnp.issubdtype(
                arr.dtype, jnp.integer):
            raise RnntError(Status.INVALID_VALUE,
                            f"{name} must be int [B]; got {arr.shape} "
                            f"{arr.dtype}")
    return _fused_banded_core(enc, pred, labels,
                              input_lengths.astype(jnp.int32),
                              label_lengths.astype(jnp.int32),
                              joint_params, bands.min_s, bands.max_s,
                              joint_fn, int(blank_id), int(chunk_t),
                              int(band_width), axis_name)
