"""Band-pruned monotonic RNN-T loss on the packed [B, T, W, V] layout.

This is the TPU-native counterpart of the reference's alignment-restricted
fast path, where both storage and compute are pruned to the allowed band
(reference: include/cpu_workspace_manager.h:286-297 prunes CPU storage to the
band; include/gpu_rnnt_kernel.h:58-72 clamps GPU DP work; :266-271 zero-fills
out-of-band gradients). Instead of per-cell index clamping, the lattice's s
axis is re-indexed into a static-width packed window (ops/bands.py BandLayout)
so that every tensor the loss touches is [B, T, W(, V)] — HBM traffic scales
with the band width W, not with S+1.

Band-coordinate recurrences: with s = offset[t] + w and per-step window shift
d[t] = offset[t] - offset[t-1] in {0, 1},

  alpha(t, w) = LSE( alpha(t-1, w + d[t])     + log p(blank | t, w),
                     alpha(t-1, w + d[t] - 1) + log p(label | t, w) )
  beta(t, w)  = LSE( beta(t+1, w - d[t+1])     + log p(blank | t, w),
                     beta(t+1, w - d[t+1] + 1) + log p(label | t, w) )

i.e. the usual recurrences with the +-1 lane shifts selected per (b, t) by
d / d_next — a pair of vector rolls and a select, no gathers. Values shifted
in from outside the window are exactly -inf, which is correct because the
packed window contains both DP bands by construction (bands.py).

The module provides the XLA (oracle/CPU) path; ops/pallas/banded.py provides
the fused TPU kernels. Both compute the loss of `clip_bands_to_width(bands)`,
which equals the requested band whenever band_layout_is_exact holds.
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.config import get_config
from ..utils.status import RnntError, Status, validate_loss_inputs
from .bands import (BandLayout, Bands, band_final_slot, band_lattice_masks,
                    band_virtual_next_rows, compute_band_layout, pack_band)
from .helpers import (NEG_INF, extend_labels, log_sum_exp, mask_to_additive,
                      select_label_logits, shift_left_s, shift_right_s)
from .loss import _resolve_backend


class BandStats(NamedTuple):
    """Per-cell softmax statistics in band coordinates ([B, T, W] f32 each)."""

    denom: jnp.ndarray
    lp_blank: jnp.ndarray
    lp_label: jnp.ndarray


def band_labels(labels: jnp.ndarray, label_lengths: jnp.ndarray,
                layout: BandLayout, s1: int) -> jnp.ndarray:
    """[B, T, W] int32 label id per packed slot (-1 sentinel where invalid).

    Implemented as one-hot(offset) @ sliding-windows rather than a [B, T, W]
    take_along_axis: XLA lowers multi-dim gathers on TPU to serialized
    dynamic slices (~0.5 ms at B=2, T=1600 — a quarter of the whole banded
    loss), while this form is one tiny MXU matmul. Precision HIGHEST is
    load-bearing: the TPU default runs f32 matmuls as single-pass bf16,
    which rounds label ids above 256; HIGHEST is exact for integers far
    below 2^24, and each output picks exactly one window row.
    """
    lab_ext = extend_labels(labels, label_lengths, s1)
    w = layout.width
    padded = jnp.pad(lab_ext, ((0, 0), (0, w - 1)), constant_values=-1)
    windows = jnp.stack([padded[:, k:k + s1] for k in range(w)],
                        axis=-1).astype(jnp.float32)       # [B, S1, W]
    onehot = jax.nn.one_hot(layout.offset, s1, dtype=jnp.float32)
    out = jnp.einsum("bts,bsw->btw", onehot, windows,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jax.lax.round(out, jax.lax.RoundingMethod.TO_NEAREST_EVEN).astype(
        jnp.int32)


def band_stats(logits_band: jnp.ndarray, lab_band: jnp.ndarray,
               blank_id: int) -> BandStats:
    """Fused log-softmax statistics over V on the packed layout (XLA path)."""
    x = logits_band.astype(jnp.float32)
    denom = -jax.nn.logsumexp(x, axis=-1)
    lp_blank = x[..., blank_id] + denom
    # select_label_logits, not take_along_axis: the [B, T, W]-indexed
    # V-gather serializes on TPU and can fault the worker (helpers.py).
    gathered = select_label_logits(x, lab_band)
    lp_label = jnp.where(lab_band >= 0, gathered + denom, NEG_INF)
    return BandStats(denom=denom, lp_blank=lp_blank, lp_label=lp_label)


def band_forward_backward(stats: BandStats, masks, layout: BandLayout,
                          input_lengths: jnp.ndarray,
                          label_lengths: jnp.ndarray,
                          compute_betas: bool = True):
    """Banded alpha (and optionally beta) scans; returns (alphas, betas, ll)."""
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    batch, t_max, w = stats.lp_blank.shape
    w_idx = jnp.arange(w, dtype=jnp.int32)[None, :]

    # Fold the additive reachability mask into both transition scores
    # (LSE(a, b) + m == LSE(a + m, b + m)). The emit term consumes lp_label
    # at the *source* slot w-1, so its mask — which must hit the destination
    # w — is pre-shifted down one slot before folding.
    amask = mask_to_additive(masks.alpha)
    lpbm = jnp.transpose(stats.lp_blank + amask, (1, 0, 2))  # [T, B, W]
    lplm = jnp.transpose(stats.lp_label + shift_left_s(amask), (1, 0, 2))
    d_t = jnp.transpose(layout.d[:, :, None] == 1, (1, 0, 2))  # [T, B, 1]

    zrow = jnp.zeros_like(stats.lp_blank[:, 0, :])
    # alpha(-1, .) = [s == 0] lives at offset 0, so band slot w == 0.
    alpha_init = zrow + mask_to_additive(w_idx == 0)

    def alpha_step(carry, xs):
        lpb_t, lpl_t, shifted = xs
        # Realign alpha(t-1) into the coordinates of t (rows sit at w + d[t]),
        # then apply the standard recurrence: no-emit stays at s, emit enters
        # s from s-1 consuming lp_label(t, s-1).
        aligned = jnp.where(shifted, shift_left_s(carry), carry)
        no_emit = aligned + lpb_t
        emit = shift_right_s(aligned + lpl_t)
        new = log_sum_exp(no_emit, emit)
        return new, new

    _, alphas = jax.lax.scan(alpha_step, alpha_init, (lpbm, lplm, d_t))
    alphas = jnp.transpose(alphas, (1, 0, 2))
    ll = band_final_slot(alphas, layout, ilen, slen)

    if not compute_betas:
        return alphas, None, ll

    bmask = mask_to_additive(masks.beta)
    lpbm_b = jnp.transpose(stats.lp_blank + bmask, (1, 0, 2))
    lplm_b = jnp.transpose(stats.lp_label + bmask, (1, 0, 2))
    dn_t = jnp.transpose(layout.d_next[:, :, None] == 1, (1, 0, 2))
    bvirt_t = jnp.transpose(band_virtual_next_rows(layout, slen), (1, 0, 2))
    t_rev = jnp.arange(t_max - 1, -1, -1, dtype=jnp.int32)

    def beta_step(carry, xs):
        lpb_t, lpl_t, dn, bv, t = xs
        use_virtual = (t + 1 >= ilen)[:, None]
        nxt = jnp.where(use_virtual, bv, carry)
        # beta(t+1) rows sit at w - d_next: shift *down* (toward w-1 reads)
        # when d_next == 1, i.e. select between row[w] and row[w-1].
        down = shift_right_s(nxt)
        no_emit = jnp.where(dn, down, nxt) + lpb_t
        emit = jnp.where(dn, nxt, shift_left_s(nxt)) + lpl_t
        new = log_sum_exp(no_emit, emit)
        return new, new

    _, betas_rev = jax.lax.scan(
        beta_step, zrow + NEG_INF,
        (lpbm_b[::-1], lplm_b[::-1], dn_t[::-1], bvirt_t[::-1], t_rev))
    betas = jnp.transpose(betas_rev[::-1], (1, 0, 2))
    return alphas, betas, ll


def band_occupancy_coefficients(alphas, betas, ll, input_lengths,
                                label_lengths, layout: BandLayout):
    """Per-cell gradient coefficients (occ, cb, cl) in band coordinates.

    Same math as ops.reference.occupancy_coefficients re-indexed to the packed
    window: neighbours at t-1 / t+1 are realigned into the coordinates of t by
    the d / d_next lane shifts.
    """
    batch, t_max, w = alphas.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    w_idx = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :, None]

    # alpha(t-1, s) in the coordinates of t: rows shift left when d[t] == 1.
    virt = jnp.broadcast_to(mask_to_additive(w_idx == 0), (batch, 1, w))
    ap = jnp.concatenate([virt, alphas[:, :-1, :]], axis=1)
    alpha_prev = jnp.where(layout.d[:, :, None] == 1, shift_left_s(ap), ap)

    # beta(t+1, s) in the coordinates of t: rows shift right when d_next == 1;
    # at t == T_b-1 the next row is the virtual [s == S_b] boundary.
    bn = jnp.concatenate(
        [betas[:, 1:, :], jnp.full((batch, 1, w), NEG_INF, jnp.float32)],
        axis=1)
    beta_next = jnp.where(layout.d_next[:, :, None] == 1, shift_right_s(bn),
                          bn)
    bvirt = mask_to_additive(
        layout.offset[:, :, None] + w_idx == slen[:, None, None])
    beta_next = jnp.where(t_idx == (ilen[:, None, None] - 1), bvirt,
                          beta_next)
    beta_next_up = shift_left_s(beta_next)

    ll_ok = jnp.isfinite(ll)
    llb = jnp.where(ll_ok, ll, 0.0)[:, None, None]
    valid_t = (t_idx < ilen[:, None, None]) & ll_ok[:, None, None]

    def _coef(b):
        return jnp.where(valid_t, jnp.exp(alpha_prev + b - llb), 0.0)

    return _coef(betas), _coef(beta_next), _coef(beta_next_up)


def band_gradients(logits_band, denom, lab_band, occ, cb, cl,
                   blank_id: int, v_offset=0) -> jnp.ndarray:
    """Assemble dL/dz on the packed layout (XLA path).

    v_offset shifts local vocab indices to global ids (vocab-sharded TP path,
    where this shard holds columns [v_offset, v_offset + V_local) of the
    packed band tensor; cf. reference.gradients_from_coefficients).
    """
    v = logits_band.shape[-1]
    p = jnp.exp(logits_band.astype(jnp.float32) + denom[..., None])
    v_idx = (jnp.arange(v, dtype=jnp.int32) + v_offset)[None, None, None, :]
    blank_mask = v_idx == blank_id
    label_mask = v_idx == lab_band[..., None]
    coef = (occ[..., None]
            - jnp.where(blank_mask, cb[..., None], 0.0)
            - jnp.where(label_mask, cl[..., None], 0.0))
    return p * coef


def rnnt_loss_banded_reference(
    logits_band: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    bands: Bands,
    blank_id: int = 0,
    with_grads: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Banded monotonic RNN-T loss on the packed layout (pure XLA).

    Args:
      logits_band: [B, T_max, W, V] — packed window of the joint activations,
        slot (t, w) holding lattice cell (t, offset[t] + w); see
        bands.pack_band / compute_band_layout.
      bands: the band being scored (clipped to width W; exact when
        band_layout_is_exact holds).
    Returns (costs [B] f32, grads [B, T_max, W, V] f32 or None) — gradients in
    the same packed layout (bands.unpack_band scatters them back if needed).
    """
    batch, t_max, w, v = logits_band.shape
    s1 = labels.shape[1] + 1
    layout = compute_band_layout(input_lengths, label_lengths, bands, t_max,
                                 s1, w)
    masks = band_lattice_masks(input_lengths, label_lengths, bands, layout,
                               t_max, s1)
    lab_band = band_labels(labels, label_lengths, layout, s1)
    stats = band_stats(logits_band, lab_band, blank_id)
    alphas, betas, ll = band_forward_backward(
        stats, masks, layout, input_lengths, label_lengths,
        compute_betas=with_grads)
    costs = -ll
    if not with_grads:
        return costs, None
    occ, cb, cl = band_occupancy_coefficients(
        alphas, betas, ll, input_lengths, label_lengths, layout)
    grads = band_gradients(logits_band, stats.denom, lab_band, occ, cb, cl,
                           blank_id)
    return costs, grads


# ---------------------------------------------------------------------------
# Public API (custom VJP, backend dispatch)
# ---------------------------------------------------------------------------


def _run_banded(logits_band, labels, input_lengths, label_lengths, bands,
                blank_id, backend, with_grads):
    if backend == "pallas":
        from .pallas.banded import rnnt_loss_banded_pallas
        return rnnt_loss_banded_pallas(
            logits_band, labels, input_lengths, label_lengths, bands,
            blank_id=blank_id, with_grads=with_grads)
    return rnnt_loss_banded_reference(
        logits_band, labels, input_lengths, label_lengths, bands,
        blank_id=blank_id, with_grads=with_grads)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _banded_core(logits_band, labels, input_lengths, label_lengths, band_min,
                 band_max, blank_id, backend):
    costs, _ = _run_banded(logits_band, labels, input_lengths, label_lengths,
                           Bands(band_min, band_max), blank_id, backend,
                           with_grads=False)
    return costs


def _banded_fwd(logits_band, labels, input_lengths, label_lengths, band_min,
                band_max, blank_id, backend):
    if backend == "pallas":
        # Deferred-gradient route: the forward runs stats + the V-free
        # bidirectional walk only (one read of the band tensor); the grad
        # pass (one read + one write) runs in the bwd rule with the cost
        # cotangent folded into the occupancy coefficients. Saves a full
        # read+write of [B, T, W, V] per training step vs scaling
        # forward-produced grads, and keeps [B, T, W] residuals instead.
        from .pallas.banded import banded_deferred_fwd

        costs, res = banded_deferred_fwd(
            logits_band, labels, input_lengths, label_lengths,
            Bands(band_min, band_max), blank_id)
        return costs, {"deferred": (logits_band, labels, input_lengths,
                                    label_lengths, band_min, band_max, res)}
    costs, grads = _run_banded(logits_band, labels, input_lengths,
                               label_lengths, Bands(band_min, band_max),
                               blank_id, backend, with_grads=True)
    return costs, {"eager": (grads,
                             jnp.zeros((0,), jnp.asarray(logits_band).dtype))}


def _banded_bwd(blank_id, backend, residuals, cost_cotangent):
    if "deferred" in residuals:
        from .pallas.banded import banded_deferred_bwd

        (logits_band, labels, input_lengths, label_lengths, band_min,
         band_max, res) = residuals["deferred"]
        dlogits = banded_deferred_bwd(
            logits_band, labels, input_lengths, label_lengths,
            Bands(band_min, band_max), res, cost_cotangent, blank_id)
        return (dlogits, None, None, None, None, None)
    grads, dtype_marker = residuals["eager"]
    dlogits = (grads * cost_cotangent[:, None, None, None]).astype(
        dtype_marker.dtype)
    return (dlogits, None, None, None, None, None)


_banded_core.defvjp(_banded_fwd, _banded_bwd)


def monotonic_rnnt_loss_banded(
    logits_band: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    *,
    bands: Bands,
    blank_id: int = 0,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Alignment-restricted monotonic RNN-T loss on the packed band layout.

    The long-utterance fast path: with a width-W band around a known
    alignment (bands_from_alignment), all loss-side compute and memory scale
    with W instead of S_max+1 — the role of the reference's band-pruned
    workspaces (cpu_workspace_manager.h:286-297, gpu_rnnt_kernel.h:58-72).

    Args:
      logits_band: [B, T_max, W, V] packed joint activations (see
        bands.compute_band_layout / pack_band for the slot <-> lattice map).
      labels / input_lengths / label_lengths: as monotonic_rnnt_loss.
      bands: the restriction being scored. Must satisfy the packed-layout
        contract (offset increments in {0, 1}; width covering the band —
        check with bands.band_layout_is_exact, size W with
        bands.required_band_width). Wider spans are clipped to W.
      backend: 'auto' (Pallas on TPU), 'pallas', or 'reference'.

    Returns [B] f32 costs, differentiable w.r.t. logits_band (gradients come
    from the same fused pass, in the packed layout).
    """
    if logits_band.ndim != 4:
        raise RnntError(Status.INVALID_VALUE,
                        "logits_band must be [B, T, W, V], got shape "
                        f"{logits_band.shape}")
    s1 = labels.shape[1] + 1
    if logits_band.shape[2] > s1:
        raise RnntError(Status.INVALID_VALUE,
                        f"band width {logits_band.shape[2]} exceeds S_max+1="
                        f"{s1}; use monotonic_rnnt_loss for unbanded lattices")
    validate_loss_inputs(
        jax.ShapeDtypeStruct(
            logits_band.shape[:2] + (s1, logits_band.shape[3]),
            logits_band.dtype),
        labels, input_lengths, label_lengths)
    resolved = _resolve_backend(backend)
    timed = (get_config().debug_time
             and not isinstance(logits_band, jax.core.Tracer))
    with contextlib.ExitStack() as stack:
        if timed:
            from ..utils.profiling import phase_timer
            stack.enter_context(
                phase_timer(f"monotonic_rnnt_loss_banded[{resolved}]"))
        out = _banded_core(logits_band, labels,
                           input_lengths.astype(jnp.int32),
                           label_lengths.astype(jnp.int32),
                           bands.min_s, bands.max_s, int(blank_id), resolved)
        if timed:
            jax.block_until_ready(out)
    return out
