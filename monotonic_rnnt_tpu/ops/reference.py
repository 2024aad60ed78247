"""Pure-JAX reference implementation of the monotonic RNN-T loss.

This is the TPU framework's oracle: a direct, fully-vectorized transcription of
the forward-backward recurrences on a padded [B, T_max, S_max+1, V] lattice.
It plays the role the reference's CPU computer plays for its CUDA kernels
(reference: include/cpu_rnnt.h:98-263) — every Pallas kernel is validated
against it — and doubles as the "naive/debug" backend.

Math contract (reference README.md "Forward-backward"/"Gradients",
include/cpu_rnnt.h:155-236):

  log p(v | t, s)  = logits[t, s, v] + denom[t, s],
      denom = -logsumexp_v logits[t, s, :]                  (cpu_rnnt.h:98-115)
  alpha(t, s) = LSE( alpha(t-1, s)   + log p(blank   | t, s),
                     alpha(t-1, s-1) + log p(label[s-1] | t, s-1) )
      alpha(-1, s) = [s == 0] in log space                  (cpu_rnnt.h:155-183)
  beta(t, s)  = LSE( beta(t+1, s)   + log p(blank    | t, s),
                     beta(t+1, s+1) + log p(label[s] | t, s) )
      beta(T, s) = [s == S] in log space                    (cpu_rnnt.h:185-214)
  loss = -alpha(T-1, S) = -beta(0, 0)

  dL/dz[t, s, v] = p(v|t,s) * ( exp(alpha(t-1,s) + beta(t,s)   - ll)
        - [v == blank]    * exp(alpha(t-1,s) + beta(t+1,s)   - ll)
        - [v == label[s]] * exp(alpha(t-1,s) + beta(t+1,s+1) - ll) )
                                                            (cpu_rnnt.h:216-236)
All recurrences run in float32 log space regardless of input dtype.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.debug import emit_loss_debug
from .bands import Bands, LatticeMasks, default_bands, lattice_masks
from .helpers import (NEG_INF, extend_labels, log_sum_exp, mask_to_additive,
                      select_label_logits, shift_left_s, shift_right_s)


class LatticeStats(NamedTuple):
    """Per-cell softmax statistics, the only V-dependent inputs to the DP.

    denom:    [B, T, S1] f32, -logsumexp_v(logits)
    lp_blank: [B, T, S1] f32, log p(blank | t, s)
    lp_label: [B, T, S1] f32, log p(label[s] | t, s); -inf where s >= S_b.
    """

    denom: jnp.ndarray
    lp_blank: jnp.ndarray
    lp_label: jnp.ndarray


def compute_stats(logits: jnp.ndarray, labels: jnp.ndarray,
                  label_lengths: jnp.ndarray, blank_id: int) -> LatticeStats:
    """Fused log-softmax statistics over the vocab axis (XLA path)."""
    x = logits.astype(jnp.float32)
    denom = -jax.nn.logsumexp(x, axis=-1)
    lp_blank = x[..., blank_id] + denom

    s1 = x.shape[2]
    lab_ext = extend_labels(labels, label_lengths, s1)
    gathered = select_label_logits(x, lab_ext[:, None, :])
    lp_label = jnp.where((lab_ext >= 0)[:, None, :], gathered + denom,
                         NEG_INF)
    return LatticeStats(denom=denom, lp_blank=lp_blank, lp_label=lp_label)


def forward_backward(stats: LatticeStats, masks: LatticeMasks,
                     input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                     compute_betas: bool = True):
    """Run the alpha (and optionally beta) scans.

    Returns (alphas, betas, ll_fwd, ll_bwd); alphas/betas are [B, T, S1] with
    exact -inf outside the reachable band, betas/ll_bwd are None when
    compute_betas is False (the cost-only fast path, reference gpu_rnnt.h:139).
    """
    lpb = jnp.transpose(stats.lp_blank, (1, 0, 2))  # [T, B, S1]
    lpl = jnp.transpose(stats.lp_label, (1, 0, 2))
    amask = jnp.transpose(mask_to_additive(masks.alpha), (1, 0, 2))

    batch, s1 = stats.lp_blank.shape[0], stats.lp_blank.shape[2]
    t_max = stats.lp_blank.shape[1]
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, :]

    # Virtual starts: alpha(-1, s) = [s == 0]; beta(T_b, s) = [s == S_b].
    # zeros_like ties the carries to the inputs' sharding type (vma) so the
    # scans are valid inside shard_map.
    zrow = jnp.zeros_like(stats.lp_blank[:, 0, :])
    alpha_init = zrow + mask_to_additive(s_idx == 0)
    beta_virtual = zrow + mask_to_additive(s_idx == slen[:, None])

    def alpha_step(carry, xs):
        lpb_t, lpl_t, am_t = xs
        no_emit = carry + lpb_t
        emit = shift_right_s(carry + lpl_t)
        new = log_sum_exp(no_emit, emit) + am_t
        return new, new

    _, alphas = jax.lax.scan(alpha_step, alpha_init, (lpb, lpl, amask))
    alphas = jnp.transpose(alphas, (1, 0, 2))  # [B, T, S1]

    ll_fwd = jnp.take_along_axis(
        jnp.take_along_axis(alphas, jnp.clip(ilen - 1, 0)[:, None, None],
                            axis=1)[:, 0, :],
        slen[:, None], axis=1)[:, 0]

    if not compute_betas:
        return alphas, None, ll_fwd, None

    bmask = jnp.transpose(mask_to_additive(masks.beta), (1, 0, 2))
    t_rev = jnp.arange(t_max - 1, -1, -1, dtype=jnp.int32)

    def beta_step(carry, xs):
        lpb_t, lpl_t, bm_t, t = xs
        # Until t+1 < T_b, the "next" row is the virtual boundary row.
        use_virtual = (t + 1 >= ilen)[:, None]
        nxt = jnp.where(use_virtual, beta_virtual, carry)
        no_emit = nxt + lpb_t
        emit = shift_left_s(nxt) + lpl_t
        new = log_sum_exp(no_emit, emit) + bm_t
        return new, new

    _, betas_rev = jax.lax.scan(
        beta_step, zrow + NEG_INF,
        (lpb[::-1], lpl[::-1], bmask[::-1], t_rev))
    betas = jnp.transpose(betas_rev[::-1], (1, 0, 2))

    ll_bwd = betas[:, 0, 0]
    return alphas, betas, ll_fwd, ll_bwd


def occupancy_coefficients(alphas: jnp.ndarray, betas: jnp.ndarray,
                           ll: jnp.ndarray, input_lengths: jnp.ndarray,
                           label_lengths: jnp.ndarray):
    """Per-cell gradient coefficients (V-independent part of dL/dz).

      occ[t,s] = exp(alpha(t-1,s) + beta(t,s)   - ll)
      cb[t,s]  = exp(alpha(t-1,s) + beta(t+1,s)   - ll)  (blank transition)
      cl[t,s]  = exp(alpha(t-1,s) + beta(t+1,s+1) - ll)  (label transition)

    Rows with t >= T_b are zero; infeasible lattices (ll == -inf) yield zero
    coefficients so gradients stay finite while the cost is +inf.
    """
    batch, t_max, s1 = alphas.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, :]
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :, None]

    alpha_virt = jnp.broadcast_to(mask_to_additive(s_idx == 0),
                                  (batch, s1))
    alpha_prev = jnp.concatenate([alpha_virt[:, None, :], alphas[:, :-1, :]], axis=1)

    beta_virt = mask_to_additive(s_idx == slen[:, None])
    beta_next = jnp.concatenate(
        [betas[:, 1:, :], jnp.full((batch, 1, s1), NEG_INF, jnp.float32)], axis=1)
    beta_next = jnp.where(t_idx == (ilen[:, None, None] - 1),
                          beta_virt[:, None, :], beta_next)
    beta_next_up = shift_left_s(beta_next)

    ll_ok = jnp.isfinite(ll)
    llb = jnp.where(ll_ok, ll, 0.0)[:, None, None]
    valid_t = (t_idx < ilen[:, None, None]) & ll_ok[:, None, None]

    def _coef(b):
        return jnp.where(valid_t, jnp.exp(alpha_prev + b - llb), 0.0)

    return _coef(betas), _coef(beta_next), _coef(beta_next_up)


def gradients_from_coefficients(logits: jnp.ndarray, denom: jnp.ndarray,
                                labels: jnp.ndarray, label_lengths: jnp.ndarray,
                                occ: jnp.ndarray, cb: jnp.ndarray,
                                cl: jnp.ndarray, blank_id: int,
                                v_offset=0) -> jnp.ndarray:
    """Assemble dL/dz from per-cell coefficients (XLA path).

      dL/dz[t,s,v] = p(v|t,s) * (occ - [v==blank]*cb - [v==label[s]]*cl)

    v_offset shifts local vocab indices to global ids (vocab-sharded TP path,
    where this shard holds columns [v_offset, v_offset + V_local)).
    """
    batch, t_max, s1, v = logits.shape
    p = jnp.exp(logits.astype(jnp.float32) + denom[..., None])

    lab_ext = extend_labels(labels, label_lengths, s1)

    v_idx = jnp.arange(v, dtype=jnp.int32) + v_offset
    blank_mask = (v_idx == blank_id)[None, None, None, :]
    label_mask = v_idx[None, None, None, :] == lab_ext[:, None, :, None]

    coef = (occ[..., None]
            - jnp.where(blank_mask, cb[..., None], 0.0)
            - jnp.where(label_mask, cl[..., None], 0.0))
    return p * coef


def rnnt_loss_reference(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    bands: Optional[Bands] = None,
    with_grads: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Monotonic RNN-T loss (and logit gradients) on a padded lattice.

    Args:
      logits: [B, T_max, S_max+1, V] raw (pre-softmax) activations.
      labels: [B, S_max] int32.
      input_lengths / label_lengths: [B] int32, with T_b >= S_b >= 0, T_b >= 1.
      blank_id: blank symbol index.
      bands: optional alignment-restriction bands (see bands.py).
      with_grads: when False, runs the alpha-only cost path.

    Returns (costs [B] f32, grads [B, T_max, S_max+1, V] f32 or None).
    """
    _, t_max, s1, _ = logits.shape
    if bands is None:
        bands = default_bands(input_lengths, label_lengths, t_max)
    masks = lattice_masks(input_lengths, label_lengths, bands, t_max, s1)
    stats = compute_stats(logits, labels, label_lengths, blank_id)

    alphas, betas, ll_fwd, ll_bwd = forward_backward(
        stats, masks, input_lengths, label_lengths, compute_betas=with_grads)
    costs = -ll_fwd
    if not with_grads:
        return costs, None

    occ, cb, cl = occupancy_coefficients(
        alphas, betas, ll_fwd, input_lengths, label_lengths)
    grads = gradients_from_coefficients(
        logits, stats.denom, labels, label_lengths, occ, cb, cl, blank_id)
    emit_loss_debug(ll_fwd, ll_bwd, grads)
    return costs, grads
