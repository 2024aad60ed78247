"""Vocab-sharded (tensor-parallel) monotonic RNN-T loss.

When V * T * S exceeds one chip's HBM (e.g. 10k-BPE joint outputs on long
utterances), the logits' vocab axis is sharded over the 'model' mesh axis.
Each shard computes local softmax statistics in one pass; a pmax/psum pair
over ICI combines them into the global denominator; the tiny forward-backward
recursion is computed redundantly on every shard; gradients are produced for
the local vocab slice only — so the big tensor is never gathered.

The reference has no tensor-parallel path (its GPU kernel strides one thread
block over the whole V per lattice cell, gpu_rnnt_kernel.h:273-287); this is
the TPU-native scale-out of the same math.

Use inside shard_map with a named 'model' axis, or via
make_dp_tp_loss(mesh) below.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.banded import (BandStats, band_forward_backward, band_gradients,
                          band_labels, band_occupancy_coefficients)
from ..ops.bands import (Bands, band_lattice_masks, compute_band_layout,
                         default_bands, lattice_masks)
from ..ops.helpers import NEG_INF, extend_labels
from ..ops.reference import (LatticeStats, forward_backward,
                             gradients_from_coefficients,
                             occupancy_coefficients)
from .mesh import DATA_AXIS, MODEL_AXIS




def _local_max_sumexp(x_local):
    """Pre-reduction (m, sum-exp) per lattice cell over the local V slice.

    On TPU the fused Pallas kernel does this in ONE read of the shard (the
    XLA formulation below needs a max pass and a sum pass). Two gates:
    the actual device platform (interpret mode cannot execute inside
    shard_map and a compiled Pallas call can't run on CPU, so non-TPU hosts
    keep the XLA path regardless of MRNNT_BACKEND), AND the resolved config
    backend (MRNNT_BACKEND=reference must bypass the kernel on hardware too
    — that is the whole point of the debug backend).
    """
    from ..ops.loss import _resolve_backend

    if (jax.default_backend() == "tpu"
            and _resolve_backend(None) == "pallas"
            and not jax.config.jax_disable_jit):
        from ..ops.pallas.kernels import softmax_stats_partial

        return softmax_stats_partial(x_local)
    m = jnp.max(x_local, axis=-1)
    se = jnp.sum(jnp.exp(x_local - m[..., None]), axis=-1)
    return m, se


def _sharded_stats(x_local, labels_ext, blank_id, axis_name):
    """Global softmax stats from a local vocab slice (one pass + collectives)."""
    v_local = x_local.shape[-1]
    shard = jax.lax.axis_index(axis_name)
    v_offset = shard * v_local

    m_loc, se_loc = _local_max_sumexp(x_local)
    m = jax.lax.pmax(m_loc, axis_name)                          # [B,T,S1]
    se = jax.lax.psum(se_loc * jnp.exp(m_loc - m), axis_name)
    denom = -(m + jnp.log(se))

    def pick(col_global):
        """x[..., col] for a global column living on whichever shard owns it."""
        rel = col_global - v_offset                             # [...]
        in_shard = (rel >= 0) & (rel < v_local)
        safe = jnp.clip(rel, 0, v_local - 1)
        return in_shard, safe

    in_b, safe_b = pick(jnp.asarray(blank_id))
    xb = jnp.where(in_b, jnp.take(x_local, safe_b, axis=-1), 0.0)
    lp_blank = jax.lax.psum(xb, axis_name) + denom

    # labels_ext: [B, S1] global ids (-1 padding never matches any shard).
    rel = labels_ext - v_offset
    in_shard = (rel >= 0) & (rel < v_local)
    safe = jnp.clip(rel, 0, v_local - 1)
    gathered = jnp.take_along_axis(x_local, safe[:, None, :, None],
                                   axis=-1)[..., 0]
    xl = jax.lax.psum(jnp.where(in_shard[:, None, :], gathered, 0.0),
                      axis_name)
    valid = in_shard  # true on exactly one shard for real labels
    any_valid = jax.lax.psum(valid.astype(jnp.int32), axis_name) > 0
    lp_label = jnp.where(any_valid[:, None, :], xl + denom, NEG_INF)
    return denom, lp_blank, lp_label, v_offset


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def rnnt_loss_vocab_sharded(logits_local, labels, input_lengths,
                            label_lengths, band_min, band_max, blank_id,
                            axis_name):
    costs, _ = _vocab_sharded_impl(logits_local, labels, input_lengths,
                                   label_lengths, Bands(band_min, band_max),
                                   blank_id, axis_name, with_grads=False)
    return costs


def _vocab_sharded_impl(logits_local, labels, input_lengths, label_lengths,
                        bands, blank_id, axis_name, with_grads):
    x = logits_local.astype(jnp.float32)
    batch, t_max, s1, _ = x.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    labels_ext = extend_labels(labels, slen, s1)

    denom, lp_blank, lp_label, v_offset = _sharded_stats(
        x, labels_ext, blank_id, axis_name)
    masks = lattice_masks(ilen, slen, bands, t_max, s1)
    stats = LatticeStats(denom=denom, lp_blank=lp_blank, lp_label=lp_label)
    alphas, betas, ll_fwd, _ = forward_backward(stats, masks, ilen, slen,
                                                compute_betas=with_grads)
    costs = -ll_fwd
    if not with_grads:
        return costs, None
    occ, cb, cl = occupancy_coefficients(alphas, betas, ll_fwd, ilen, slen)
    grads_local = gradients_from_coefficients(
        x, denom, labels, slen, occ, cb, cl, blank_id, v_offset=v_offset)
    return costs, grads_local


def _vs_fwd(logits_local, labels, input_lengths, label_lengths, band_min,
            band_max, blank_id, axis_name):
    costs, grads = _vocab_sharded_impl(
        logits_local, labels, input_lengths, label_lengths,
        Bands(band_min, band_max), blank_id, axis_name, with_grads=True)
    return costs, (grads, jnp.zeros((0,), logits_local.dtype))


def _vs_bwd(blank_id, axis_name, residuals, ct):
    grads, marker = residuals
    return (grads * ct[:, None, None, None]).astype(marker.dtype), \
        None, None, None, None, None


rnnt_loss_vocab_sharded.defvjp(_vs_fwd, _vs_bwd)


# ---------------------------------------------------------------------------
# Banded (packed band layout) vocab-sharded loss
# ---------------------------------------------------------------------------


def _sharded_band_stats(x_local, lab_band, blank_id, axis_name):
    """Global BandStats from a local vocab slice of the packed band layout.

    Same collective recipe as _sharded_stats, re-indexed to [B, T, W]: one
    local pass for (max, sum-exp), a pmax/psum pair for the denominator, and
    cross-shard picks for the blank/label columns.
    """
    v_local = x_local.shape[-1]
    shard = jax.lax.axis_index(axis_name)
    v_offset = shard * v_local

    m_loc, se_loc = _local_max_sumexp(x_local)                  # [B,T,W]
    m = jax.lax.pmax(m_loc, axis_name)
    se = jax.lax.psum(se_loc * jnp.exp(m_loc - m), axis_name)
    denom = -(m + jnp.log(se))

    rel_b = jnp.asarray(blank_id) - v_offset
    in_b = (rel_b >= 0) & (rel_b < v_local)
    xb = jnp.where(in_b,
                   jnp.take(x_local, jnp.clip(rel_b, 0, v_local - 1), axis=-1),
                   0.0)
    lp_blank = jax.lax.psum(xb, axis_name) + denom

    # Label column per packed slot. lab_band varies over [B, T, W], so a
    # take_along_axis here would be a serialized multi-dim gather on TPU
    # (see band_labels); a compare-select-reduce over the local slice
    # vectorizes and fuses. The -1 sentinel is owned by no shard.
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


def _banded_vocab_sharded_impl(logits_band_local, labels, input_lengths,
                               label_lengths, bands, blank_id, axis_name,
                               with_grads):
    x = logits_band_local.astype(jnp.float32)
    batch, t_max, w, _ = x.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    s1 = labels.shape[1] + 1

    layout = compute_band_layout(ilen, slen, bands, t_max, s1, w)
    masks = band_lattice_masks(ilen, slen, bands, layout, t_max, s1)
    lab_band = band_labels(labels, slen, layout, s1)

    stats, v_offset = _sharded_band_stats(x, lab_band, blank_id, axis_name)
    alphas, betas, ll = band_forward_backward(
        stats, masks, layout, ilen, slen, compute_betas=with_grads)
    costs = -ll
    if not with_grads:
        return costs, None
    occ, cb, cl = band_occupancy_coefficients(alphas, betas, ll, ilen, slen,
                                              layout)
    grads_local = band_gradients(x, stats.denom, lab_band, occ, cb, cl,
                                 blank_id, v_offset=v_offset)
    return costs, grads_local


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def rnnt_loss_banded_vocab_sharded(logits_band_local, labels, input_lengths,
                                   label_lengths, band_min, band_max,
                                   blank_id, axis_name):
    """Banded loss on a local vocab slice of the packed [B, T, W, V] layout.

    The composition of the long-utterance fast path (ops/banded.py) with
    vocab tensor parallelism: HBM traffic scales with W * V_local. Call
    inside shard_map with `axis_name` the model axis; gradients are produced
    for the local slice only, in the packed layout.
    """
    costs, _ = _banded_vocab_sharded_impl(
        logits_band_local, labels, input_lengths, label_lengths,
        Bands(band_min, band_max), blank_id, axis_name, with_grads=False)
    return costs


def _bvs_fwd(logits_band_local, labels, input_lengths, label_lengths,
             band_min, band_max, blank_id, axis_name):
    costs, grads = _banded_vocab_sharded_impl(
        logits_band_local, labels, input_lengths, label_lengths,
        Bands(band_min, band_max), blank_id, axis_name, with_grads=True)
    return costs, (grads, jnp.zeros((0,), logits_band_local.dtype))


def _bvs_bwd(blank_id, axis_name, residuals, ct):
    grads, marker = residuals
    return (grads * ct[:, None, None, None]).astype(marker.dtype), \
        None, None, None, None, None


rnnt_loss_banded_vocab_sharded.defvjp(_bvs_fwd, _bvs_bwd)


def make_dp_tp_banded_loss(mesh: Mesh, *, blank_id: int = 0,
                           mean_over_batch: bool = True):
    """Jitted banded loss: batch on 'data', vocab on 'model', compute O(W).

    fn(logits_band [B,T,W,V], labels, input_lengths, label_lengths,
       band_min [B,T], band_max [B,T]) -> scalar.

    The packed band tensor comes from ops.bands.pack_band (or the model's
    joint evaluated on band cells only, ops/chunked_banded.py); band_min/max
    from bands_from_alignment.
    """

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, None, None, MODEL_AXIS), P(DATA_AXIS),
                       P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                       P(DATA_AXIS)),
             out_specs=P())
    def _fn(logits_band, labels, input_lengths, label_lengths, band_min,
            band_max):
        costs = rnnt_loss_banded_vocab_sharded(
            logits_band, labels, input_lengths, label_lengths, band_min,
            band_max, blank_id, MODEL_AXIS)
        total = jax.lax.psum(jnp.sum(costs), DATA_AXIS)
        if mean_over_batch:
            n = jax.lax.psum(jnp.asarray(costs.shape[0], jnp.float32),
                             DATA_AXIS)
            return total / n
        return total

    return jax.jit(_fn)


def make_dp_tp_loss(mesh: Mesh, *, blank_id: int = 0,
                    mean_over_batch: bool = True):
    """Jitted loss with batch sharded on 'data' and vocab on 'model'.

    fn(logits [B,T,S1,V], labels, input_lengths, label_lengths) -> scalar.
    """

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, None, None, MODEL_AXIS), P(DATA_AXIS),
                       P(DATA_AXIS), P(DATA_AXIS)),
             out_specs=P())
    def _fn(logits, labels, input_lengths, label_lengths):
        t_max = logits.shape[1]
        bands = default_bands(input_lengths, label_lengths, t_max)
        costs = rnnt_loss_vocab_sharded(
            logits, labels, input_lengths, label_lengths, bands.min_s,
            bands.max_s, blank_id, MODEL_AXIS)
        total = jax.lax.psum(jnp.sum(costs), DATA_AXIS)
        if mean_over_batch:
            n = jax.lax.psum(jnp.asarray(costs.shape[0], jnp.float32),
                             DATA_AXIS)
            return total / n
        return total

    return jax.jit(_fn)
