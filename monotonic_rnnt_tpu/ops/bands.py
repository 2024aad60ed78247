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


def lattice_masks(input_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                  bands: Bands, t_max: int, s1: int) -> LatticeMasks:
    """Build alpha/beta reachability masks.

    alpha window at t (cpu_workspace_manager.h:67-71):
        max(min_s[t], t - (T-1-S)) <= s <= min(max_s[t], t+1, S)
    beta window at t (cpu_workspace_manager.h:73-86):
        t == 0: s == 0
        else:   max(min_s[t-1], t - (T-S)) <= s <= min(max_s[t-1], t, S)
    plus t < T_b everywhere.
    """
    ilen = input_lengths.astype(jnp.int32)[:, None, None]
    slen = label_lengths.astype(jnp.int32)[:, None, None]
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :, None]
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, None, :]

    band_min = bands.min_s[:, :, None]
    band_max = bands.max_s[:, :, None]

    a_lo = jnp.maximum(band_min, t_idx - (ilen - 1 - slen))
    a_hi = jnp.minimum(jnp.minimum(band_max, t_idx + 1), slen)
    alpha = (s_idx >= a_lo) & (s_idx <= a_hi) & (t_idx < ilen)

    # beta band at t reads the allowed window at t-1.
    prev_min = jnp.concatenate(
        [jnp.zeros_like(bands.min_s[:, :1]), bands.min_s[:, :-1]], axis=1)[:, :, None]
    prev_max = jnp.concatenate(
        [jnp.full_like(bands.max_s[:, :1], s1), bands.max_s[:, :-1]], axis=1)[:, :, None]
    b_lo = jnp.maximum(prev_min, t_idx - (ilen - slen))
    b_hi = jnp.minimum(jnp.minimum(prev_max, t_idx), slen)
    beta = (s_idx >= b_lo) & (s_idx <= b_hi) & (t_idx < ilen)

    return LatticeMasks(alpha=alpha, beta=beta)
