"""Packed-layout compatibility shims.

The reference consumes activations in a *packed* layout — one flat
[sum_b T_b*(S_b+1), V] array with per-sample row offset
`(t*(S_b+1)+s)` (reference: cpu_workspace_manager.h:125-135,
gpu_workspace_manager.h:112-122) — so that variable-length batches waste no
memory. On TPU the idiomatic layout is padded [B, T_max, S_max+1, V] with
masks (static shapes for XLA); these shims convert between the two so that
reference test vectors and embedders using the packed layout run unchanged.

Both directions are differentiable gathers, so `monotonic_rnnt_loss_packed`
returns packed gradients through ordinary JAX autodiff. Sequence lengths must
be host-concrete (numpy) here — the packed layout's shape depends on them,
exactly as in the reference where T[]/S[] are host arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.status import RnntError, Status
from .loss import monotonic_rnnt_loss


def _as_host_lengths(input_lengths, label_lengths) -> Tuple[np.ndarray, np.ndarray]:
    try:
        ilen = np.asarray(input_lengths).astype(np.int64)
        slen = np.asarray(label_lengths).astype(np.int64)
    except Exception as exc:
        raise RnntError(
            Status.INVALID_VALUE,
            "packed-layout APIs need concrete (host) lengths; call outside "
            "jit or use the padded-layout API") from exc
    return ilen, slen


def packed_row_indices(ilen: np.ndarray, slen: np.ndarray, t_max: int,
                       s1: int):
    """Map padded cells -> packed rows.

    Returns (idx [B, t_max, s1] int32 with -1 on padding, total_rows).
    Row of cell (b, t, s) is offset_b + t*(S_b+1) + s, matching
    cpu_workspace_manager.h:125-135.
    """
    batch = len(ilen)
    rows_per_sample = ilen * (slen + 1)
    offsets = np.concatenate([[0], np.cumsum(rows_per_sample)[:-1]])
    t_idx = np.arange(t_max)[None, :, None]
    s_idx = np.arange(s1)[None, None, :]
    valid = (t_idx < ilen[:, None, None]) & (s_idx <= slen[:, None, None])
    idx = (offsets[:, None, None] + t_idx * (slen[:, None, None] + 1) + s_idx)
    idx = np.where(valid, idx, -1)
    return idx.astype(np.int32), int(rows_per_sample.sum())


def unpack_acts(acts_packed: jnp.ndarray, input_lengths, label_lengths,
                t_max: Optional[int] = None,
                s_max: Optional[int] = None) -> jnp.ndarray:
    """Packed [sum T_b*(S_b+1), V] -> padded [B, T_max, S_max+1, V] (zeros pad)."""
    ilen, slen = _as_host_lengths(input_lengths, label_lengths)
    t_max = int(t_max or ilen.max())
    s1 = int((s_max or slen.max()) + 1)
    idx, total = packed_row_indices(ilen, slen, t_max, s1)
    if acts_packed.shape[0] != total:
        raise RnntError(
            Status.INVALID_VALUE,
            f"packed acts have {acts_packed.shape[0]} rows, lengths imply "
            f"{total}")
    gathered = jnp.take(acts_packed, jnp.asarray(np.maximum(idx, 0)), axis=0)
    valid = jnp.asarray(idx >= 0)
    return jnp.where(valid[..., None], gathered, 0.0)


def pack_acts(acts_padded: jnp.ndarray, input_lengths, label_lengths) -> jnp.ndarray:
    """Padded [B, T_max, S_max+1, V] -> packed [sum T_b*(S_b+1), V]."""
    ilen, slen = _as_host_lengths(input_lengths, label_lengths)
    batch, t_max, s1, v = acts_padded.shape
    idx, total = packed_row_indices(ilen, slen, t_max, s1)
    # Invert: packed row r -> flat padded row.
    flat_src = np.empty(total, np.int64)
    flat_idx = idx.reshape(batch, -1)
    padded_rows = np.arange(t_max * s1)
    for b in range(batch):
        mask = flat_idx[b] >= 0
        flat_src[flat_idx[b][mask]] = b * t_max * s1 + padded_rows[mask]
    flat = acts_padded.reshape(batch * t_max * s1, v)
    return jnp.take(flat, jnp.asarray(flat_src), axis=0)


def monotonic_rnnt_loss_packed(
    acts: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths,
    label_lengths,
    *,
    blank_id: int = 0,
    alignment: Optional[jnp.ndarray] = None,
    max_distance_from_alignment: int = 0,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Reference-compatible packed-layout loss.

    Mirrors the reference Python API surface (monotonic_rnnt_op.py:121-163):
    acts [sum_b T_b*(S_b+1), V], labels [B, S_max], per-sample lengths,
    optional alignment restriction. Returns [B] costs; gradients w.r.t. the
    packed acts flow through JAX autodiff (the unpack gather is linear).
    """
    ilen, slen = _as_host_lengths(input_lengths, label_lengths)
    t_max, s_max = int(ilen.max()), int(slen.max())
    padded = unpack_acts(acts, ilen, slen, t_max, s_max)
    if labels.shape[1] < s_max:
        raise RnntError(Status.INVALID_VALUE,
                        f"labels second dim {labels.shape[1]} < S_max {s_max}")
    align = alignment
    if align is not None and align.shape[1] != t_max:
        align = align[:, :t_max]
    return monotonic_rnnt_loss(
        padded, labels[:, :s_max] if s_max else jnp.zeros(
            (padded.shape[0], 0), jnp.int32),
        jnp.asarray(ilen, jnp.int32), jnp.asarray(slen, jnp.int32),
        blank_id=blank_id, alignment=align,
        max_distance_from_alignment=max_distance_from_alignment,
        backend=backend)
