"""Collective (vocab-sharded) softmax statistics for tensor parallelism.

When the logits' vocab axis is sharded over a named mesh axis, each shard
computes local per-cell (max, sum-exp) in one pass; a pmax/psum pair over ICI
combines them into the global log-softmax denominator, and cross-shard psum
picks recover the blank/label columns. These helpers are the V-dependent core
shared by every tensor-parallel loss surface: the rectangular lattice
(parallel/sharding.py), the packed band layout, and the memory-efficient
fused-joint loss (ops/chunked.py with axis_name=...).

The reference has no tensor-parallel path (its GPU kernel strides one thread
block over the whole V per lattice cell, gpu_rnnt_kernel.h:273-287); this is
the TPU-native scale-out of the same math. Call only inside shard_map (or
another context where `axis_name` is bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .banded import BandStats
from .helpers import NEG_INF, select_label_logits
from .reference import LatticeStats


def local_max_sumexp(x_local):
    """Pre-reduction (m, sum-exp) per lattice cell over the local V slice.

    On TPU the fused Pallas kernel does this in ONE read of the shard (the
    XLA formulation below needs a max pass and a sum pass); gating per
    loss.use_pallas_kernels.
    """
    from .loss import use_pallas_kernels

    if use_pallas_kernels():
        from .pallas.kernels import softmax_stats_partial

        return softmax_stats_partial(x_local)
    m = jnp.max(x_local, axis=-1)
    se = jnp.sum(jnp.exp(x_local - m[..., None]), axis=-1)
    return m, se


def _global_denom(x_local, axis_name):
    m_loc, se_loc = local_max_sumexp(x_local)
    m = jax.lax.pmax(m_loc, axis_name)
    se = jax.lax.psum(se_loc * jnp.exp(m_loc - m), axis_name)
    return -(m + jnp.log(se))


def _pick_blank(x_local, blank_id, v_offset, axis_name):
    v_local = x_local.shape[-1]
    rel_b = jnp.asarray(blank_id) - v_offset
    in_b = (rel_b >= 0) & (rel_b < v_local)
    xb = jnp.where(in_b,
                   jnp.take(x_local, jnp.clip(rel_b, 0, v_local - 1), axis=-1),
                   0.0)
    return jax.lax.psum(xb, axis_name)


def sharded_lattice_stats(x_local, labels_ext, blank_id, axis_name):
    """Global LatticeStats from a local vocab slice; returns (stats, v_offset).

    x_local: [B, T, S1, V_local] — this shard's columns
      [v_offset, v_offset + V_local) of the joint logits.
    labels_ext: [B, S1] global label ids (-1 padding never matches a shard).
    """
    v_local = x_local.shape[-1]
    v_offset = jax.lax.axis_index(axis_name) * v_local

    denom = _global_denom(x_local, axis_name)
    lp_blank = _pick_blank(x_local, blank_id, v_offset, axis_name) + denom

    rel = labels_ext - v_offset
    in_shard = (rel >= 0) & (rel < v_local)
    # select_label_logits, not take_along_axis (helpers.py: the V-axis
    # gather can fault the TPU worker); out-of-shard rel ids select 0.
    gathered = select_label_logits(x_local, rel[:, None, :])
    xl = jax.lax.psum(jnp.where(in_shard[:, None, :], gathered, 0.0),
                      axis_name)
    any_valid = jax.lax.psum(in_shard.astype(jnp.int32), axis_name) > 0
    lp_label = jnp.where(any_valid[:, None, :], xl + denom, NEG_INF)
    return LatticeStats(denom=denom, lp_blank=lp_blank,
                        lp_label=lp_label), v_offset


def sharded_band_stats(x_local, lab_band, blank_id, axis_name):
    """Global BandStats from a local vocab slice of the packed band layout.

    Same collective recipe as sharded_lattice_stats, re-indexed to [B, T, W].
    lab_band varies over [B, T, W], so a take_along_axis here would be a
    serialized multi-dim gather on TPU (see banded.band_labels); a
    compare-select-reduce over the local slice vectorizes and fuses. The -1
    sentinel is owned by no shard.
    """
    v_local = x_local.shape[-1]
    v_offset = jax.lax.axis_index(axis_name) * v_local

    denom = _global_denom(x_local, axis_name)
    lp_blank = _pick_blank(x_local, blank_id, v_offset, axis_name) + denom

    rel = lab_band - v_offset                                   # [B,T,W]
    owned = (rel >= 0) & (rel < v_local)
    v_iota = jnp.arange(v_local, dtype=jnp.int32)
    xl_loc = jnp.sum(jnp.where(rel[..., None] == v_iota, x_local, 0.0),
                     axis=-1)
    xl = jax.lax.psum(jnp.where(owned, xl_loc, 0.0), axis_name)
    any_owned = jax.lax.psum(owned.astype(jnp.int32), axis_name) > 0
    lp_label = jnp.where(any_owned, xl + denom, NEG_INF)
    return BandStats(denom=denom, lp_blank=lp_blank,
                     lp_label=lp_label), v_offset
