"""Viterbi forced alignment for the monotonic RNN-T lattice.

Computes the most probable monotonic alignment path — for each frame t, the
emitted symbol (label or blank) on the best path — and its log-probability.
This closes the loop on the alignment-restricted training mode: the reference
consumes alignments produced by an external toolkit
(MonotonicRNNTAlignRestrict takes `alignment [B, T_max]`,
monotonic_rnnt_op_align_restrict.cu:25-41); this framework can also produce
them (e.g. from a previously trained model) and feed them straight into
`bands_from_alignment` / `monotonic_rnnt_loss(alignment=...)`.

The recursion is the loss's forward DP with max in place of log-sum-exp:

  vit(t, s) = max( vit(t-1, s)   + log p(blank      | t, s),
                   vit(t-1, s-1) + log p(label[s-1] | t, s-1) )

with the same virtual start (vit(-1, s) = [s == 0] in log space), band
clamping, and -inf boundary semantics. Backpointers are one bit per cell
(emit vs. no-emit); the backtrace is a reverse lax.scan, so the whole op is
jit/vmap/shard_map-compatible with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .bands import Bands, default_bands, lattice_masks
from .helpers import mask_to_additive, shift_right_s
from .reference import compute_stats


class ViterbiResult(NamedTuple):
    """alignment: [B, T_max] int32 — emitted symbol per frame (blank_id where
    no label is emitted, and on frames t >= T_b). score: [B] f32 — the path's
    negative log-probability (same scale as the loss; >= the loss, equality
    iff one path carries all mass).
    """

    alignment: jnp.ndarray
    score: jnp.ndarray


def occupancy_posteriors(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    *,
    blank_id: int = 0,
    bands: Optional[Bands] = None,
) -> jnp.ndarray:
    """Per-cell occupancy posteriors gamma[b, t, s] = p(path visits (t, s)).

    gamma(t, s) = exp(alpha(t-1, s) + beta(t, s) - ll): the probability mass
    of all monotonic paths that occupy lattice cell (t, s) — the quantity the
    gradient formula is built from (reference README.md "Gradients"), exposed
    for confidence estimation, soft-alignment distillation, and diagnostics.
    Rows sum to 1 over s for every valid frame t < T_b (and to 0 beyond).
    """
    from .reference import (compute_stats, forward_backward,
                            occupancy_coefficients)

    batch, t_max, s1, _ = logits.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    if bands is None:
        bands = default_bands(ilen, slen, t_max)
    masks = lattice_masks(ilen, slen, bands, t_max, s1)
    stats = compute_stats(logits, labels, slen, blank_id)
    alphas, betas, ll_fwd, _ = forward_backward(stats, masks, ilen, slen)
    occ, _, _ = occupancy_coefficients(alphas, betas, ll_fwd, ilen, slen)
    return occ


def viterbi_alignment(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    *,
    blank_id: int = 0,
    bands: Optional[Bands] = None,
) -> ViterbiResult:
    """Best monotonic alignment path and its score.

    Args match monotonic_rnnt_loss (padded layout, raw logits). When `bands`
    is given, the search is clamped to the band — restricted re-alignment.
    """
    batch, t_max, s1, _ = logits.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    if bands is None:
        bands = default_bands(ilen, slen, t_max)
    masks = lattice_masks(ilen, slen, bands, t_max, s1)
    stats = compute_stats(logits, labels, slen, blank_id)

    lpb = jnp.transpose(stats.lp_blank, (1, 0, 2))   # [T, B, S1]
    lpl = jnp.transpose(stats.lp_label, (1, 0, 2))
    amask = jnp.transpose(mask_to_additive(masks.alpha), (1, 0, 2))

    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, :]
    init = jnp.zeros_like(stats.lp_blank[:, 0, :]) + mask_to_additive(
        s_idx == 0)

    def fwd_step(carry, xs):
        lpb_t, lpl_t, am_t = xs
        no_emit = carry + lpb_t
        emit = shift_right_s(carry + lpl_t)
        # Tie-break toward no-emit (matches max(a, b) with a = no_emit).
        took_emit = emit > no_emit
        new = jnp.maximum(no_emit, emit) + am_t
        return new, (new, took_emit)

    _, (vit, bptr) = jax.lax.scan(fwd_step, init, (lpb, lpl, amask))
    # vit/bptr: [T, B, S1]

    vit_b = jnp.transpose(vit, (1, 0, 2))            # [B, T, S1]
    score = -jnp.take_along_axis(
        jnp.take_along_axis(vit_b, jnp.clip(ilen - 1, 0)[:, None, None],
                            axis=1)[:, 0, :],
        slen[:, None], axis=1)[:, 0]

    # Backtrace: walk t = T_max-1 .. 0 carrying the current s. Frames beyond
    # T_b - 1 are "inactive": s stays at S_b and blank is emitted.
    lab_pad = jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.zeros((batch, s1 - labels.shape[1]), jnp.int32)], axis=1)

    def back_step(s_cur, xs):
        bptr_t, t = xs
        active = t <= ilen - 1
        took = jnp.take_along_axis(bptr_t, s_cur[:, None], axis=1)[:, 0]
        emit_here = active & took & (s_cur > 0)
        sym = jnp.where(
            emit_here,
            jnp.take_along_axis(lab_pad, jnp.maximum(s_cur - 1, 0)[:, None],
                                axis=1)[:, 0],
            blank_id)
        s_next = jnp.where(emit_here, s_cur - 1, s_cur)
        # Entering the active region from padding: clamp to S_b.
        s_next = jnp.where(active, s_next, slen)
        return s_next, sym

    ts = jnp.arange(t_max - 1, -1, -1, dtype=jnp.int32)
    bptr_rev = bptr[::-1]                            # t descending
    _, syms_rev = jax.lax.scan(back_step, slen, (bptr_rev, ts))
    alignment = jnp.transpose(syms_rev[::-1], (1, 0)).astype(jnp.int32)
    return ViterbiResult(alignment=alignment, score=score)


def viterbi_alignment_banded(
    logits_band: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    *,
    bands: Bands,
    blank_id: int = 0,
) -> ViterbiResult:
    """Best path on the packed band layout — O(W) restricted re-alignment.

    The realignment loop of alignment-restricted training (align -> train
    restricted -> re-align in a band around the previous alignment) never
    needs the full lattice: this searches [B, T, W, V] band logits (see
    bands.compute_band_layout / monotonic_rnnt_loss_banded for the layout
    contract) with the same max-plus recursion as viterbi_alignment, the
    band-coordinate window shifts of ops/banded.py, and a lattice-coordinate
    backtrace. Same semantics as viterbi_alignment with
    clip_bands_to_width(bands) on the full lattice.
    """
    from .banded import band_labels, band_stats
    from .bands import (band_final_slot, band_lattice_masks,
                        compute_band_layout)
    from .helpers import shift_left_s

    batch, t_max, w, _ = logits_band.shape
    s1 = labels.shape[1] + 1
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    layout = compute_band_layout(ilen, slen, bands, t_max, s1, w)
    masks = band_lattice_masks(ilen, slen, bands, layout, t_max, s1)
    lab_band = band_labels(labels, slen, layout, s1)
    stats = band_stats(logits_band, lab_band, blank_id)

    amask = mask_to_additive(masks.alpha)
    lpbm = jnp.transpose(stats.lp_blank + amask, (1, 0, 2))      # [T, B, W]
    lplm = jnp.transpose(stats.lp_label + shift_left_s(amask), (1, 0, 2))
    d_t = jnp.transpose(layout.d[:, :, None] == 1, (1, 0, 2))

    w_idx = jnp.arange(w, dtype=jnp.int32)[None, :]
    init = jnp.zeros_like(stats.lp_blank[:, 0, :]) + mask_to_additive(
        w_idx == 0)

    def fwd_step(carry, xs):
        lpb_t, lpl_t, sh = xs
        aligned = jnp.where(sh, shift_left_s(carry), carry)
        no_emit = aligned + lpb_t
        emit = shift_right_s(aligned + lpl_t)
        took_emit = emit > no_emit
        return jnp.maximum(no_emit, emit), (jnp.maximum(no_emit, emit),
                                            took_emit)

    _, (vit, bptr) = jax.lax.scan(fwd_step, init, (lpbm, lplm, d_t))

    vit_b = jnp.transpose(vit, (1, 0, 2))
    score = -band_final_slot(vit_b, layout, ilen, slen)

    # Backtrace in lattice coordinates; the backpointer for lattice cell
    # (t, s) sits at packed slot s - offset[t].
    lab_pad = jnp.concatenate(
        [labels.astype(jnp.int32),
         jnp.zeros((batch, s1 - labels.shape[1]), jnp.int32)], axis=1)

    def back_step(s_cur, xs):
        bptr_t, off_t, t = xs
        active = t <= ilen - 1
        slot = s_cur - off_t
        in_band = (slot >= 0) & (slot < w)
        took = jnp.take_along_axis(bptr_t, jnp.clip(slot, 0, w - 1)[:, None],
                                   axis=1)[:, 0]
        emit_here = active & in_band & took & (s_cur > 0)
        sym = jnp.where(
            emit_here,
            jnp.take_along_axis(lab_pad, jnp.maximum(s_cur - 1, 0)[:, None],
                                axis=1)[:, 0],
            blank_id)
        s_next = jnp.where(emit_here, s_cur - 1, s_cur)
        s_next = jnp.where(active, s_next, slen)
        return s_next, sym

    ts = jnp.arange(t_max - 1, -1, -1, dtype=jnp.int32)
    off_rev = jnp.transpose(layout.offset, (1, 0))[::-1]
    _, syms_rev = jax.lax.scan(back_step, slen, (bptr[::-1], off_rev, ts))
    alignment = jnp.transpose(syms_rev[::-1], (1, 0)).astype(jnp.int32)
    return ViterbiResult(alignment=alignment, score=score)


def occupancy_posteriors_banded(
    logits_band: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    *,
    bands: Bands,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Packed-layout gamma[b, t, w] = p(path visits (t, offset[t] + w)).

    Banded counterpart of occupancy_posteriors (bands.unpack_band scatters
    back to the lattice if needed).
    """
    from .banded import (band_forward_backward, band_labels,
                         band_occupancy_coefficients, band_stats)
    from .bands import band_lattice_masks, compute_band_layout

    batch, t_max, w, _ = logits_band.shape
    s1 = labels.shape[1] + 1
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    layout = compute_band_layout(ilen, slen, bands, t_max, s1, w)
    masks = band_lattice_masks(ilen, slen, bands, layout, t_max, s1)
    lab_band = band_labels(labels, slen, layout, s1)
    stats = band_stats(logits_band, lab_band, blank_id)
    alphas, betas, ll = band_forward_backward(stats, masks, layout, ilen,
                                              slen)
    occ, _, _ = band_occupancy_coefficients(alphas, betas, ll, ilen, slen,
                                            layout)
    return occ
