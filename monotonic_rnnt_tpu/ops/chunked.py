"""Memory-efficient fused-joint monotonic RNN-T loss.

The standard pipeline materializes the joint-network output — the
[B, T, S+1, V] logits tensor — as a model activation, plus its gradient:
for large vocabularies and long utterances that tensor dominates HBM
(B=4, T'=512, S=64, V=8k fp32 is ~4.4 GB before gradients). This module
computes the loss *directly from the encoder and predictor outputs*,
streaming the lattice in T-chunks: each chunk's logits are computed on the
fly, consumed, and discarded — peak memory drops from O(B·T·S·V) to
O(B·T·S) + O(B·Tc·S·V) for one chunk. The same idea as sample-/chunk-wise
transducer memory reduction (see PAPERS.md: "Neural Transducer Training:
Reduced Memory Consumption with Sample-wise Computation"), expressed as
chunk scans:

  forward:  alpha rows carried across chunks (chunk logits recomputed);
  backward (VJP): ONE reverse chunk scan evaluating each chunk's logits once
     (jax.vjp primal) and reusing them for both the beta recurrence and the
     per-chunk occupancy coefficients — with the incoming cotangent folded
     in, so per-sample loss weights are exact — -> dlogits_chunk -> VJP
     through the user's joint_fn, accumulating (d_enc, d_pred, d_params).

Residuals between forward and backward are O(B·T·S) (alphas + ll); the big
tensor never exists. Everything is jit-compatible with static shapes.

The joint function contract:

    logits_chunk = joint_fn(params, enc_chunk [B,Tc,De], pred [B,S+1,Dp])
                   -> [B, Tc, S+1, V] raw logits

(any differentiable map works — the additive tanh joint in models/ fits).
The reference has no counterpart: its API *receives* the materialized
activation tensor (acts, tensorflow_binding/monotonic_rnnt_op.cu:28-33).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .bands import Bands, default_bands, lattice_masks
from .helpers import (NEG_INF, extend_labels, log_sum_exp, mask_to_additive,
                      shift_left_s, shift_right_s)
from .reference import (LatticeStats, compute_stats,
                        gradients_from_coefficients)
from ..utils.status import RnntError, Status
from ..utils.vma import (psum_to_primal as _psum_to_primal,
                         tree_vma as _carry_vma, vary_to as _vary_to)


def _chunk_stats(logits_c, labels, slen, blank_id, axis_name):
    """(LatticeStats, v_offset) for one chunk's logits.

    With axis_name set, logits_c is this shard's local V slice (vocab
    tensor parallelism): the global stats come from one local pass plus a
    pmax/psum pair over the named axis (ops/collective.py).

    On TPU the fused Pallas kernel computes the stats in ONE read of the
    chunk's logits (the XLA formulation is ~2: a logsumexp pass plus the
    gathers); gating per loss.use_pallas_kernels.
    """
    if axis_name is None:
        from .loss import use_pallas_kernels

        if use_pallas_kernels():
            from .pallas.kernels import softmax_stats

            labels_ext = extend_labels(labels, slen, logits_c.shape[2])
            denom, lp_blank, lpl_raw = softmax_stats(logits_c, labels_ext,
                                                     blank_id)
            lp_label = jnp.where((labels_ext >= 0)[:, None, :], lpl_raw,
                                 NEG_INF)
            return LatticeStats(denom=denom, lp_blank=lp_blank,
                                lp_label=lp_label), 0
        return compute_stats(logits_c, labels, slen, blank_id), 0
    from .collective import sharded_lattice_stats

    labels_ext = extend_labels(labels, slen, logits_c.shape[2])
    return sharded_lattice_stats(logits_c.astype(jnp.float32), labels_ext,
                                 blank_id, axis_name)


def _chunk(x: jnp.ndarray, n_chunks: int, chunk_t: int) -> jnp.ndarray:
    """[B, T, ...] -> [nC, B, Tc, ...] (T must be padded to nC * Tc)."""
    batch = x.shape[0]
    rest = x.shape[2:]
    return jnp.moveaxis(x.reshape(batch, n_chunks, chunk_t, *rest), 1, 0)


def _pad_t(x: jnp.ndarray, t_pad: int, value) -> jnp.ndarray:
    pad = [(0, 0), (0, t_pad - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, constant_values=value)


def rnnt_loss_fused_joint(
    enc: jnp.ndarray,
    pred: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    joint_fn: Callable,
    joint_params,
    *,
    blank_id: int = 0,
    chunk_t: int = 32,
    bands: Optional[Bands] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Monotonic RNN-T costs from encoder/predictor outputs, O(B·Tc·S·V) mem.

    Args:
      enc: [B, T, De] encoder outputs (T = frames after subsampling).
      pred: [B, S+1, Dp] predictor context vectors.
      labels / input_lengths / label_lengths / blank_id / bands: as in
        monotonic_rnnt_loss (lengths refer to enc frames / labels).
      joint_fn: (params, enc_chunk, pred) -> [B, Tc, S+1, V] raw logits.
      joint_params: pytree of joint parameters.
      chunk_t: frames per chunk (static); T is padded to a multiple.
      axis_name: if set, the vocab axis is sharded over this named mesh axis
        (call inside shard_map): joint_fn/joint_params produce only this
        shard's V slice, stats are combined with pmax/psum collectives, and
        d_enc/d_pred are psum-reduced so every shard returns the full
        gradient. d_joint_params stay local to the shard's weight slice.

    Returns [B] f32 costs, differentiable w.r.t. enc, pred, and joint_params.
    """
    if enc.ndim != 3 or pred.ndim != 3 or enc.shape[0] != pred.shape[0]:
        raise RnntError(Status.INVALID_VALUE,
                        f"enc must be [B,T,De] and pred [B,S+1,Dp] with the "
                        f"same B; got {enc.shape} and {pred.shape}")
    if labels.ndim != 2 or labels.shape[0] != enc.shape[0] or (
            labels.shape[1] < pred.shape[1] - 1) or (
            labels.shape[1] > pred.shape[1]):
        raise RnntError(Status.INVALID_VALUE,
                        f"labels must be [B, S] or [B, S+1]; got "
                        f"{labels.shape} with pred S+1 = {pred.shape[1]}")
    for name, arr in (("input_lengths", input_lengths),
                      ("label_lengths", label_lengths)):
        if arr.shape != (enc.shape[0],) or not jnp.issubdtype(
                arr.dtype, jnp.integer):
            raise RnntError(Status.INVALID_VALUE,
                            f"{name} must be int [B]; got {arr.shape} "
                            f"{arr.dtype}")
    bands_ = bands if bands is not None else default_bands(
        input_lengths, label_lengths, enc.shape[1])
    return _fused_core(enc, pred, labels,
                       input_lengths.astype(jnp.int32),
                       label_lengths.astype(jnp.int32),
                       joint_params, bands_.min_s, bands_.max_s,
                       joint_fn, int(blank_id), int(chunk_t), axis_name)


def _prep(enc, ilen, slen, s1, bands, chunk_t):
    batch, t_max, _ = enc.shape
    n_chunks = -(-t_max // chunk_t)
    t_pad = n_chunks * chunk_t
    masks = lattice_masks(ilen, slen, bands, t_max, s1)
    amask = _chunk(_pad_t(mask_to_additive(masks.alpha), t_pad, -jnp.inf),
                   n_chunks, chunk_t)
    bmask = _chunk(_pad_t(mask_to_additive(masks.beta), t_pad, -jnp.inf),
                   n_chunks, chunk_t)
    enc_c = _chunk(_pad_t(enc, t_pad, 0.0), n_chunks, chunk_t)
    return n_chunks, t_pad, amask, bmask, enc_c


def _alphas_and_costs(enc, pred, labels, ilen, slen, joint_params, bands,
                      joint_fn, blank_id, chunk_t, axis_name):
    batch, t_max, _ = enc.shape
    s1 = pred.shape[1]
    n_chunks, t_pad, amask, _, enc_c = _prep(enc, ilen, slen, s1, bands,
                                             chunk_t)
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, :]
    # The alpha rows inherit the data-batch mesh axes of the inputs; the
    # model axis (if any) is collapsed by the psum inside the sharded stats.
    row_vma = _carry_vma(enc, pred, labels, ilen, slen,
                         joint_params) - {axis_name}
    alpha_virt = _vary_to(jnp.zeros((batch, s1), jnp.float32)
                          + mask_to_additive(s_idx == 0), row_vma)

    def alpha_chunk(carry, xs):
        enc_chunk, am_c = xs
        stats, _ = _chunk_stats(joint_fn(joint_params, enc_chunk, pred),
                                labels, slen, blank_id, axis_name)

        def step(row, ts):
            lpb_t, lpl_t, am_t = ts
            new = log_sum_exp(row + lpb_t,
                              shift_right_s(row + lpl_t)) + am_t
            return new, new

        row, alphas_c = jax.lax.scan(
            step, carry,
            (jnp.moveaxis(stats.lp_blank, 1, 0),
             jnp.moveaxis(stats.lp_label, 1, 0),
             jnp.moveaxis(am_c, 1, 0)))
        return row, jnp.moveaxis(alphas_c, 0, 1)   # [B, Tc, S1]

    _, alphas_c = jax.lax.scan(
        jax.checkpoint(alpha_chunk), alpha_virt, (enc_c, amask))
    alphas = jnp.moveaxis(alphas_c, 0, 1).reshape(batch, t_pad, s1)[:, :t_max]

    ll_fwd = jnp.take_along_axis(
        jnp.take_along_axis(alphas, jnp.clip(ilen - 1, 0)[:, None, None],
                            axis=1)[:, 0, :],
        slen[:, None], axis=1)[:, 0]
    return alphas, ll_fwd


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _fused_core(enc, pred, labels, ilen, slen, joint_params, band_min,
                band_max, joint_fn, blank_id, chunk_t, axis_name):
    _, ll_fwd = _alphas_and_costs(enc, pred, labels, ilen, slen,
                                  joint_params, Bands(band_min, band_max),
                                  joint_fn, blank_id, chunk_t, axis_name)
    return -ll_fwd


def _fused_fwd(enc, pred, labels, ilen, slen, joint_params, band_min,
               band_max, joint_fn, blank_id, chunk_t, axis_name):
    alphas, ll_fwd = _alphas_and_costs(enc, pred, labels, ilen, slen,
                                       joint_params,
                                       Bands(band_min, band_max), joint_fn,
                                       blank_id, chunk_t, axis_name)
    res = (enc, pred, labels, ilen, slen, joint_params, band_min, band_max,
           alphas, ll_fwd)
    return -ll_fwd, res


def _fused_bwd(joint_fn, blank_id, chunk_t, axis_name, res, ct):
    """Betas + gradients in ONE reverse chunk scan: each chunk's logits are
    evaluated once (jax.vjp primal) and reused for the beta recurrence and
    the dlogits -> joint-VJP push; the incoming cotangent is folded into the
    occupancy coefficients so per-sample loss weights are exact."""
    (enc, pred, labels, ilen, slen, joint_params, band_min, band_max,
     alphas, ll_fwd) = res
    bands = Bands(band_min, band_max)
    batch, t_max, _ = enc.shape
    s1 = pred.shape[1]
    n_chunks, t_pad, _, bmask, enc_c = _prep(enc, ilen, slen, s1, bands,
                                             chunk_t)
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, :]
    zrow = jnp.zeros((batch, s1), jnp.float32)
    beta_virt = zrow + mask_to_additive(s_idx == slen[:, None])
    alpha_virt = zrow + mask_to_additive(s_idx == 0)

    # alpha(t-1, s) rows, chunked like enc (fill value irrelevant: valid_t
    # masks padded frames to zero coefficients).
    alpha_prev = jnp.concatenate([alpha_virt[:, None, :], alphas[:, :-1, :]],
                                 axis=1)
    aprev_c = _chunk(_pad_t(alpha_prev, t_pad, -jnp.inf), n_chunks, chunk_t)

    ll_ok = jnp.isfinite(ll_fwd)
    llb = jnp.where(ll_ok, ll_fwd, 0.0)[:, None, None]
    w = ct.astype(jnp.float32)[:, None, None]
    t_base = jnp.arange(n_chunks - 1, -1, -1, dtype=jnp.int32) * chunk_t
    tl_idx = jnp.arange(chunk_t, dtype=jnp.int32)

    def chunk_bwd(carry, xs):
        beta_row, d_pred_acc, d_params_acc = carry
        enc_chunk, bm_c, t0, aprev_k = xs
        logits_c, joint_vjp = jax.vjp(
            lambda params, e_c, p: joint_fn(params, e_c, p),
            joint_params, enc_chunk, pred)
        stats, v_offset = _chunk_stats(logits_c, labels, slen, blank_id,
                                       axis_name)

        ts_local = jnp.arange(chunk_t - 1, -1, -1, dtype=jnp.int32)

        def step(row, ts):
            lpb_t, lpl_t, bm_t, tl = ts
            # nxt is beta(t+1, ·) with the virtual terminal row substituted
            # at t == T_b - 1 — exactly the beta_next the gradient needs.
            use_virtual = (t0 + tl + 1 >= ilen)[:, None]
            nxt = jnp.where(use_virtual, beta_virt, row)
            new = log_sum_exp(nxt + lpb_t,
                              shift_left_s(nxt) + lpl_t) + bm_t
            return new, (new, nxt)

        beta_row, (betas_rev, bnext_rev) = jax.lax.scan(
            step, beta_row,
            (jnp.moveaxis(stats.lp_blank, 1, 0)[::-1],
             jnp.moveaxis(stats.lp_label, 1, 0)[::-1],
             jnp.moveaxis(bm_c, 1, 0)[::-1],
             ts_local))
        betas_k = jnp.moveaxis(betas_rev[::-1], 0, 1)      # [B, Tc, S1]
        bnext_k = jnp.moveaxis(bnext_rev[::-1], 0, 1)

        t_glob = t0 + tl_idx
        valid_t = ((t_glob[None, :, None] < ilen[:, None, None])
                   & ll_ok[:, None, None])

        def coef(b):
            return jnp.where(valid_t, jnp.exp(aprev_k + b - llb), 0.0) * w

        dlogits = gradients_from_coefficients(
            logits_c, stats.denom, labels, slen, coef(betas_k),
            coef(bnext_k), coef(shift_left_s(bnext_k)),
            blank_id, v_offset=v_offset).astype(logits_c.dtype)
        d_params, d_enc_c, d_pred_c = joint_vjp(dlogits)
        return (beta_row,
                jax.tree.map(jnp.add, d_pred_acc, d_pred_c),
                jax.tree.map(jnp.add, d_params_acc, d_params)), d_enc_c

    # Carry vma: beta rows collapse the model axis (psum'd stats) like the
    # alphas. The gradient accumulators keep each primal's own vma:
    # jax.vjp under vma-typed shard_map already reduces every cotangent to
    # its primal's varying axes (the pcast transposes insert the psums), so
    # zeros_like (which preserves vma) is the correctly-typed init — forcing
    # a wider type here would make the final reduction double-count.
    row_vma = _carry_vma(enc, pred, labels, ilen, slen,
                         joint_params, ct) - {axis_name}
    init = (_vary_to(jnp.full((batch, s1), -jnp.inf, jnp.float32), row_vma),
            jnp.zeros_like(pred),
            jax.tree.map(jnp.zeros_like, joint_params))
    (_, d_pred, d_params), d_enc_rev = jax.lax.scan(
        jax.checkpoint(chunk_bwd), init,
        (enc_c[::-1], bmask[::-1], t_base, aprev_c[::-1]))
    d_enc = (jnp.moveaxis(d_enc_rev[::-1], 0, 1)
             .reshape(batch, t_pad, -1)[:, :t_max].astype(enc.dtype))
    d_enc = _psum_to_primal(d_enc, enc)
    d_pred = _psum_to_primal(d_pred, pred)
    d_params = jax.tree.map(_psum_to_primal, d_params, joint_params)
    return (d_enc, d_pred, None, None, None, d_params, None, None)


_fused_core.defvjp(_fused_fwd, _fused_bwd)
