"""Lattice reachability bands for the monotonic RNN-T alignment lattice.

TPU-native replacement for the reference's workspace-manager band machinery
(reference: include/cpu_workspace_manager.h:67-86, 161-224): instead of scalar
accessors clamping per-(b,t) loops, we precompute boolean masks over the padded
[B, T, S+1] lattice once, as pure functional array ops. The DP and gradient
kernels consume the masks; out-of-band cells are exactly -inf / zero-grad,
matching the reference's virtual-boundary semantics.

Two band sources combine:
  * structural reachability: alpha(t, s) exists iff s <= t+1 and
    S - s <= T - 1 - t (cpu_workspace_manager.h:176);
  * optional alignment restriction (Viterbi band around a given alignment,
    cpu_workspace_manager.h:207-224).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Bands(NamedTuple):
    """Per-(b, t) allowed label-count window [min_s, max_s], both inclusive.

    Shapes: [B, T_max] int32. Defaults are [0, S_b] (unrestricted).
    """

    min_s: jnp.ndarray
    max_s: jnp.ndarray


def default_bands(input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                  t_max: int) -> Bands:
    """Unrestricted bands: min=0, max=S_b for every t (cpu_workspace_manager.h:53-56)."""
    batch = input_lengths.shape[0]
    min_s = jnp.zeros((batch, t_max), dtype=jnp.int32)
    max_s = jnp.broadcast_to(label_lengths.astype(jnp.int32)[:, None], (batch, t_max))
    return Bands(min_s, max_s)


def bands_from_alignment(alignment: jnp.ndarray, input_lengths: jnp.ndarray,
                         label_lengths: jnp.ndarray, max_shift: int,
                         blank_id: int) -> Bands:
    """Viterbi band around a reference alignment.

    Matches reference restrict_to_alignment (cpu_workspace_manager.h:207-224):
      s_index_mapping[t+1] = number of non-blank symbols in alignment[0..t];
      min_allowed_s[t] = mapping[max(0, t+1-max_shift)]
      max_allowed_s[t] = mapping[min(T_b, t+1+max_shift)]

    Args:
      alignment: [B, T_max] int32 label ids (blank_id marks blank frames).
      input_lengths: [B] frames per sample.
      label_lengths: [B] labels per sample.
      max_shift: window half-width in frames; 0 pins the lattice to the
        alignment path exactly.
      blank_id: index of the blank symbol.
    """
    batch, t_max = alignment.shape
    ilen = input_lengths.astype(jnp.int32)[:, None]
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :]
    nonblank = (alignment != blank_id) & (t_idx < ilen)
    # mapping[b, k] = #nonblank in alignment[b, :k]; shape [B, T_max+1].
    mapping = jnp.concatenate(
        [jnp.zeros((batch, 1), jnp.int32),
         jnp.cumsum(nonblank.astype(jnp.int32), axis=1)], axis=1)
    lo_idx = jnp.clip(t_idx + 1 - max_shift, 0, ilen)
    hi_idx = jnp.clip(t_idx + 1 + max_shift, 0, ilen)
    min_s = jnp.take_along_axis(mapping, lo_idx, axis=1)
    max_s = jnp.take_along_axis(mapping, hi_idx, axis=1)
    # Guard against alignments containing more labels than label_lengths.
    slen = label_lengths.astype(jnp.int32)[:, None]
    return Bands(jnp.minimum(min_s, slen), jnp.minimum(max_s, slen))


class LatticeMasks(NamedTuple):
    """Boolean reachability masks over the padded [B, T_max, S_max+1] lattice.

    alpha[b, t, s]: alpha(t, s) is computed/stored (else exactly -inf).
    beta[b, t, s]: beta(t, s) likewise (code convention: beta(t, s) is the
      reference's backward variable written at time-step t; its band is the
      allowed window at t-1, cpu_workspace_manager.h:73-86, 196).
    """

    alpha: jnp.ndarray
    beta: jnp.ndarray


def _window_bounds(input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                   bands: Bands, t_max: int, s1: int):
    """Per-(b, t) inclusive alpha/beta window bounds (a_lo, a_hi, b_lo, b_hi).

    alpha window at t (cpu_workspace_manager.h:67-71):
        max(min_s[t], t - (T-1-S)) <= s <= min(max_s[t], t+1, S)
    beta window at t (cpu_workspace_manager.h:73-86):
        t == 0: s == 0
        else:   max(min_s[t-1], t - (T-S)) <= s <= min(max_s[t-1], t, S)
    All four are [B, T] int32 (hi < lo means an empty window).
    """
    ilen = input_lengths.astype(jnp.int32)[:, None]
    slen = label_lengths.astype(jnp.int32)[:, None]
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :]

    a_lo = jnp.maximum(bands.min_s, t_idx - (ilen - 1 - slen))
    a_hi = jnp.minimum(jnp.minimum(bands.max_s, t_idx + 1), slen)

    prev_min = jnp.concatenate(
        [jnp.zeros_like(bands.min_s[:, :1]), bands.min_s[:, :-1]], axis=1)
    prev_max = jnp.concatenate(
        [jnp.full_like(bands.max_s[:, :1], s1), bands.max_s[:, :-1]], axis=1)
    b_lo = jnp.maximum(prev_min, t_idx - (ilen - slen))
    b_hi = jnp.minimum(jnp.minimum(prev_max, t_idx), slen)
    return a_lo, a_hi, b_lo, b_hi


def lattice_masks(input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                  bands: Bands, t_max: int, s1: int) -> LatticeMasks:
    """Build alpha/beta reachability masks (see _window_bounds), plus t < T_b."""
    ilen = input_lengths.astype(jnp.int32)[:, None, None]
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, None, :]
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :, None]
    a_lo, a_hi, b_lo, b_hi = _window_bounds(
        input_lengths, label_lengths, bands, t_max, s1)
    valid_t = t_idx < ilen
    alpha = (s_idx >= a_lo[:, :, None]) & (s_idx <= a_hi[:, :, None]) & valid_t
    beta = (s_idx >= b_lo[:, :, None]) & (s_idx <= b_hi[:, :, None]) & valid_t
    return LatticeMasks(alpha=alpha, beta=beta)


# ---------------------------------------------------------------------------
# Packed band layout
# ---------------------------------------------------------------------------
#
# TPU-native replacement for the reference's band-pruned *storage and compute*
# (cpu_workspace_manager.h:286-297 prunes CPU storage to the band;
# gpu_rnnt_kernel.h:58-72 skips out-of-band GPU work). Instead of per-cell
# clamped loops, the lattice's s axis is re-indexed into a packed window of
# static width W: packed[b, t, w] <-> lattice[b, t, offset[b, t] + w].
# All loss traffic then scales with W instead of S+1, which is the whole point
# of the alignment-restricted regime (W ~ 2*max_shift labels vs S hundreds).
#
# The layout is valid when offset increments are in {0, 1} per time step —
# guaranteed for bands_from_alignment (min_s is a cumsum of 0/1 indicators)
# and for the structural band (t - (T-1-S) advances by 1); arbitrary Bands
# with faster-growing min_s are not supported by the packed path (the
# increments are clamped, which would silently tighten the band; use
# band_layout_is_exact to check).


class BandLayout(NamedTuple):
    """Static-width packed view of a banded [B, T, S+1] lattice.

    offset:  [B, T] int32 — lattice s-index of packed slot w=0 at time t;
             nondecreasing with per-step increments in {0, 1}.
    d:       [B, T] int32 — offset[t] - offset[t-1] (offset[-1] := 0), the
             per-step window shift the banded DP kernels consume.
    d_next:  [B, T] int32 — d[t+1] (0 at t = T-1), consumed by the backward
             scan and the occupancy shifts.
    width:   static int W; packed arrays have shape [B, T, W(, V)].
    """

    offset: jnp.ndarray
    d: jnp.ndarray
    d_next: jnp.ndarray
    width: int


def _raw_offsets(input_lengths, label_lengths, bands: Bands, t_max: int,
                 s1: int) -> jnp.ndarray:
    """Unclipped packed-window offsets: the beta window's lower bound.

    The beta lower bound is pointwise <= the alpha one (it reads the band at
    t-1 and subtracts one more from t), so it anchors both DP windows.
    Increments outside {0, 1} are unsupported (see module comment); they are
    clamped, which tightens such bands (band_layout_is_exact detects this).
    """
    _, _, b_lo, _ = _window_bounds(input_lengths, label_lengths, bands,
                                   t_max, s1)
    slen = label_lengths.astype(jnp.int32)[:, None]
    o = jnp.clip(b_lo, 0, slen)
    prev = jnp.concatenate([jnp.zeros_like(o[:, :1]), o[:, :-1]], axis=1)
    return jnp.cumsum(jnp.clip(o - prev, 0, 1), axis=1)


def compute_band_layout(input_lengths: jnp.ndarray,
                        label_lengths: jnp.ndarray, bands: Bands,
                        t_max: int, s1: int, width: int) -> BandLayout:
    """Derive the packed window layout for `bands` at static width `width`.

    offset[t] is the beta window's lower bound at t-1 (offset[0] = 0) — one
    step *behind* the band. The lag is load-bearing: the window at t must
    also cover the alpha band of t-1, because (a) the emit transition into
    alpha(t, s) consumes lp_label at the source cell (t, s-1), and (b) the
    gradient at cell (t, s) is nonzero wherever alpha(t-1, s) is finite —
    both one slot below the beta bound at t when the band advances. The
    bound at t-1 sits below all of: itself (beta band at t-1), the alpha
    band at t-1, and (being nondecreasing) both bands at t. Offsets are
    clipped so [offset, offset + W) stays inside [0, s1); clipping by a
    constant preserves the {0, 1}-increment property.
    """
    width = int(min(width, s1))
    o_raw = _raw_offsets(input_lengths, label_lengths, bands, t_max, s1)
    o_lag = jnp.concatenate([jnp.zeros_like(o_raw[:, :1]), o_raw[:, :-1]],
                            axis=1)
    offset = jnp.minimum(o_lag, s1 - width)
    prev = jnp.concatenate([jnp.zeros_like(offset[:, :1]), offset[:, :-1]],
                           axis=1)
    d = offset - prev
    d_next = jnp.concatenate([d[:, 1:], jnp.zeros_like(d[:, :1])], axis=1)
    return BandLayout(offset=offset, d=d, d_next=d_next, width=width)


def band_layout_is_exact(input_lengths, label_lengths, bands: Bands,
                         t_max: int, s1: int, width: int) -> jnp.ndarray:
    """[B] bool: the packed (layout, width) covers both DP windows exactly.

    False means the packed path computes the loss of a *tighter* band than
    requested (offset increments were clamped, or the window span exceeds
    width). Concrete-input helper for tests and callers choosing W.
    """
    layout = compute_band_layout(input_lengths, label_lengths, bands, t_max,
                                 s1, width)
    a_lo, a_hi, b_lo, b_hi = _window_bounds(input_lengths, label_lengths,
                                            bands, t_max, s1)
    # The window at t must also hold the alpha band of t-1 (emit sources and
    # alpha_prev-driven gradient cells; see compute_band_layout). At t = 0
    # the previous "band" is the virtual cell s = 0.
    pa_lo = jnp.concatenate([jnp.zeros_like(a_lo[:, :1]), a_lo[:, :-1]],
                            axis=1)
    pa_hi = jnp.concatenate([jnp.zeros_like(a_hi[:, :1]), a_hi[:, :-1]],
                            axis=1)
    ilen = input_lengths.astype(jnp.int32)[:, None]
    t_valid = jnp.arange(t_max, dtype=jnp.int32)[None, :] < ilen
    top = layout.offset + layout.width - 1
    ok = ((a_hi < a_lo) | ((a_lo >= layout.offset) & (a_hi <= top)))
    ok &= ((b_hi < b_lo) | ((b_lo >= layout.offset) & (b_hi <= top)))
    ok &= ((pa_hi < pa_lo) | ((pa_lo >= layout.offset) & (pa_hi <= top)))
    return jnp.all(ok | ~t_valid, axis=1)


def required_band_width(input_lengths, label_lengths, bands: Bands,
                        t_max: int, s1: int) -> jnp.ndarray:
    """Smallest W such that band_layout_is_exact holds (scalar int32).

    Concrete-input helper: call outside jit with real band arrays to size W
    (then round up to a multiple of 8 for clean Mosaic sublane tiling).
    Clipping the actual width-W layout's offsets to s1 - W only ever lowers
    them below these raw offsets, so the span measured here stays covered.
    """
    o_raw = _raw_offsets(input_lengths, label_lengths, bands, t_max, s1)
    offset = jnp.concatenate([jnp.zeros_like(o_raw[:, :1]), o_raw[:, :-1]],
                             axis=1)
    a_lo, a_hi, b_lo, b_hi = _window_bounds(input_lengths, label_lengths,
                                            bands, t_max, s1)
    pa_hi = jnp.concatenate([jnp.zeros_like(a_hi[:, :1]), a_hi[:, :-1]],
                            axis=1)
    ilen = input_lengths.astype(jnp.int32)[:, None]
    t_valid = jnp.arange(t_max, dtype=jnp.int32)[None, :] < ilen
    span = jnp.maximum(jnp.maximum(a_hi, b_hi), pa_hi) - offset + 1
    return jnp.max(jnp.where(t_valid, span, 1))


def suggested_band_width(input_lengths, label_lengths, bands: Bands,
                         t_max: int, s1: int) -> int:
    """required_band_width rounded up to a sublane multiple, capped at s1.

    The one-liner every caller wants when sizing a packed layout from
    concrete bands: exact coverage plus clean Mosaic tiling.
    """
    req = int(required_band_width(input_lengths, label_lengths, bands, t_max,
                                  s1))
    return int(min(s1, -(-req // 8) * 8))


def clip_bands_to_width(bands: Bands, layout: BandLayout) -> Bands:
    """The bands the packed path actually computes: max_s clipped to the window."""
    return Bands(bands.min_s,
                 jnp.minimum(bands.max_s, layout.offset + layout.width - 1))


def band_relative_bounds(input_lengths, label_lengths, bands: Bands,
                         layout: BandLayout, t_max: int, s1: int):
    """Per-(b, t) inclusive DP windows in packed slot coordinates.

    Returns (ra_lo, ra_hi, rb_lo, rb_hi), each [B, T] int32: the alpha/beta
    reachability window at t expressed relative to layout.offset[t] (width
    clipping applied). Frames t >= T_b get an empty window (lo=1, hi=0).
    Single source of truth for the band-coordinate masks — consumed both by
    band_lattice_masks (bool masks for the XLA paths) and by the banded
    stats kernel, which folds the masks into the transition streams
    directly from these bounds.
    """
    clipped = clip_bands_to_width(bands, layout)
    ilen = input_lengths.astype(jnp.int32)[:, None]
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :]
    a_lo, a_hi, b_lo, b_hi = _window_bounds(input_lengths, label_lengths,
                                            clipped, t_max, s1)
    valid_t = t_idx < ilen

    def rel(lo, hi):
        return (jnp.where(valid_t, lo - layout.offset, 1),
                jnp.where(valid_t, hi - layout.offset, 0))

    ra_lo, ra_hi = rel(a_lo, a_hi)
    rb_lo, rb_hi = rel(b_lo, b_hi)
    return ra_lo, ra_hi, rb_lo, rb_hi


def band_lattice_masks(input_lengths, label_lengths, bands: Bands,
                       layout: BandLayout, t_max: int,
                       s1: int) -> LatticeMasks:
    """Alpha/beta reachability masks in packed band coordinates [B, T, W]."""
    ra_lo, ra_hi, rb_lo, rb_hi = band_relative_bounds(
        input_lengths, label_lengths, bands, layout, t_max, s1)
    w_idx = jnp.arange(layout.width, dtype=jnp.int32)[None, None, :]
    alpha = (w_idx >= ra_lo[:, :, None]) & (w_idx <= ra_hi[:, :, None])
    beta = (w_idx >= rb_lo[:, :, None]) & (w_idx <= rb_hi[:, :, None])
    return LatticeMasks(alpha=alpha, beta=beta)


def band_final_slot(values_band: jnp.ndarray, layout: BandLayout,
                    input_lengths: jnp.ndarray,
                    label_lengths: jnp.ndarray) -> jnp.ndarray:
    """values_band[b, T_b-1, slot of s = S_b], NEG_INF when out of window.

    The terminal-cell gather shared by every banded forward pass (loss
    oracle, Pallas pipeline, fused-joint, Viterbi): with width clipping the
    final cell can fall outside the packed window, in which case the lattice
    is infeasible under the clipped band and the log-likelihood is -inf.
    """
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    w = values_band.shape[-1]
    last_t = jnp.clip(ilen - 1, 0)
    o_last = jnp.take_along_axis(layout.offset, last_t[:, None], axis=1)[:, 0]
    w_ll = slen - o_last
    last_rows = jnp.take_along_axis(values_band, last_t[:, None, None],
                                    axis=1)[:, 0, :]
    out = jnp.take_along_axis(last_rows, jnp.clip(w_ll, 0, w - 1)[:, None],
                              axis=1)[:, 0]
    return jnp.where((w_ll >= 0) & (w_ll < w), out, -jnp.inf)


def band_virtual_next_rows(layout: BandLayout,
                           label_lengths: jnp.ndarray) -> jnp.ndarray:
    """[B, T, W] additive rows: beta(t+1, s) = [s == S_b] in t+1's coords.

    The virtual terminal boundary consumed by the banded backward scans at
    t = T_b - 1, expressed at offset[t] + d_next[t] (= offset[t+1]).
    """
    slen = label_lengths.astype(jnp.int32)
    w_idx = jnp.arange(layout.width, dtype=jnp.int32)[None, None, :]
    o_next = layout.offset + layout.d_next
    return jnp.where(o_next[:, :, None] + w_idx == slen[:, None, None],
                     0.0, -jnp.inf).astype(jnp.float32)


def pack_band(x: jnp.ndarray, layout: BandLayout) -> jnp.ndarray:
    """Gather lattice rows into the packed window.

    x: [B, T, S1] or [B, T, S1, V] -> [B, T, W(, V)]. Reads only the gathered
    rows (XLA gather is O(output)), so packing a full tensor costs one
    band-sized read + write.
    """
    idx = layout.offset[:, :, None] + jnp.arange(layout.width,
                                                 dtype=jnp.int32)[None, None, :]
    if x.ndim == 4:
        return jnp.take_along_axis(x, idx[..., None], axis=2)
    return jnp.take_along_axis(x, idx, axis=2)


def unpack_band(x_band: jnp.ndarray, layout: BandLayout, s1: int,
                fill=0.0) -> jnp.ndarray:
    """Scatter a packed [B, T, W(, V)] tensor back to the [B, T, S1(, V)] lattice.

    Out-of-band cells get `fill`. Costs a full-lattice write — use only at
    the boundary to full-layout consumers (tests, interop); the loss itself
    stays in band layout.
    """
    batch, t_max = x_band.shape[:2]
    idx = layout.offset[:, :, None] + jnp.arange(layout.width,
                                                 dtype=jnp.int32)[None, None, :]
    out_shape = (batch, t_max, s1) + x_band.shape[3:]
    out = jnp.full(out_shape, fill, dtype=x_band.dtype)
    b_idx = jnp.arange(batch)[:, None, None]
    t_idx = jnp.arange(t_max)[None, :, None]
    return out.at[b_idx, t_idx, idx].set(x_band)
