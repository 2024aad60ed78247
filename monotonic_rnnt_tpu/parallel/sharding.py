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

from ..ops.banded import (band_forward_backward, band_gradients, band_labels,
                          band_occupancy_coefficients)
from ..ops.bands import (Bands, band_lattice_masks, compute_band_layout,
                         default_bands, lattice_masks)
from ..ops.collective import sharded_band_stats, sharded_lattice_stats
from ..ops.helpers import extend_labels
from ..ops.reference import (forward_backward, gradients_from_coefficients,
                             occupancy_coefficients)
from .mesh import DATA_AXIS, MODEL_AXIS


def _vocab_sharded_parts(logits_local, labels, input_lengths, label_lengths,
                         bands, blank_id, axis_name, compute_betas):
    """Sharded stats + the V-free recursions; no gradient assembly."""
    x = logits_local.astype(jnp.float32)
    batch, t_max, s1, _ = x.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    labels_ext = extend_labels(labels, slen, s1)

    stats, _ = sharded_lattice_stats(x, labels_ext, blank_id, axis_name)
    masks = lattice_masks(ilen, slen, bands, t_max, s1)
    alphas, betas, ll_fwd, _ = forward_backward(stats, masks, ilen, slen,
                                                compute_betas=compute_betas)
    return -ll_fwd, (stats.denom, alphas, betas, ll_fwd)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def rnnt_loss_vocab_sharded(logits_local, labels, input_lengths,
                            label_lengths, band_min, band_max, blank_id,
                            axis_name):
    costs, _ = _vocab_sharded_parts(
        logits_local, labels, input_lengths, label_lengths,
        Bands(band_min, band_max), blank_id, axis_name, compute_betas=False)
    return costs


def _vs_fwd(logits_local, labels, input_lengths, label_lengths, band_min,
            band_max, blank_id, axis_name):
    # Deferred gradients (cf. ops/loss.py): the forward stops after the
    # V-free recursions; the bwd rule assembles the local-shard gradient
    # with the cost cotangent folded into the occupancy coefficients —
    # saving one full read+write of the local shard per training step and
    # keeping [B, T, S1] residuals instead of the local gradient tensor.
    costs, (denom, alphas, betas, ll_fwd) = _vocab_sharded_parts(
        logits_local, labels, input_lengths, label_lengths,
        Bands(band_min, band_max), blank_id, axis_name, compute_betas=True)
    return costs, (logits_local, labels, input_lengths, label_lengths,
                   denom, alphas, betas, ll_fwd)


def _vs_bwd(blank_id, axis_name, residuals, ct):
    (logits_local, labels, input_lengths, label_lengths, denom, alphas,
     betas, ll_fwd) = residuals
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    v_offset = jax.lax.axis_index(axis_name) * logits_local.shape[-1]
    occ, cb, cl = occupancy_coefficients(alphas, betas, ll_fwd, ilen, slen)
    sc = ct.astype(jnp.float32)[:, None, None]
    grads = gradients_from_coefficients(
        logits_local.astype(jnp.float32), denom, labels, slen, occ * sc,
        cb * sc, cl * sc, blank_id, v_offset=v_offset)
    return (grads.astype(logits_local.dtype), None, None, None, None, None)


rnnt_loss_vocab_sharded.defvjp(_vs_fwd, _vs_bwd)


# ---------------------------------------------------------------------------
# Banded (packed band layout) vocab-sharded loss
# ---------------------------------------------------------------------------


def _banded_vocab_sharded_parts(logits_band_local, labels, input_lengths,
                                label_lengths, bands, blank_id, axis_name,
                                compute_betas):
    """Sharded banded stats + the V-free recursions; no gradient assembly."""
    x = logits_band_local.astype(jnp.float32)
    batch, t_max, w, _ = x.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    s1 = labels.shape[1] + 1

    layout = compute_band_layout(ilen, slen, bands, t_max, s1, w)
    masks = band_lattice_masks(ilen, slen, bands, layout, t_max, s1)
    lab_band = band_labels(labels, slen, layout, s1)

    stats, _ = sharded_band_stats(x, lab_band, blank_id, axis_name)
    alphas, betas, ll = band_forward_backward(
        stats, masks, layout, ilen, slen, compute_betas=compute_betas)
    return -ll, (stats.denom, alphas, betas, ll)


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
    costs, _ = _banded_vocab_sharded_parts(
        logits_band_local, labels, input_lengths, label_lengths,
        Bands(band_min, band_max), blank_id, axis_name, compute_betas=False)
    return costs


def _bvs_fwd(logits_band_local, labels, input_lengths, label_lengths,
             band_min, band_max, blank_id, axis_name):
    # Deferred gradients on the packed layout (cf. _vs_fwd): forward stops
    # after the V-free banded recursions; bwd assembles the local-slice
    # gradient with the cotangent folded into the coefficients.
    costs, (denom, alphas, betas, ll) = _banded_vocab_sharded_parts(
        logits_band_local, labels, input_lengths, label_lengths,
        Bands(band_min, band_max), blank_id, axis_name, compute_betas=True)
    return costs, (logits_band_local, labels, input_lengths, label_lengths,
                   band_min, band_max, denom, alphas, betas, ll)


def _bvs_bwd(blank_id, axis_name, residuals, ct):
    (logits_band_local, labels, input_lengths, label_lengths, band_min,
     band_max, denom, alphas, betas, ll) = residuals
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    batch, t_max, w, v_local = logits_band_local.shape
    s1 = labels.shape[1] + 1
    layout = compute_band_layout(ilen, slen, Bands(band_min, band_max),
                                 t_max, s1, w)
    lab_band = band_labels(labels, slen, layout, s1)
    v_offset = jax.lax.axis_index(axis_name) * v_local
    occ, cb, cl = band_occupancy_coefficients(alphas, betas, ll, ilen, slen,
                                              layout)
    sc = ct.astype(jnp.float32)[:, None, None]
    grads = band_gradients(logits_band_local.astype(jnp.float32), denom,
                           lab_band, occ * sc, cb * sc, cl * sc, blank_id,
                           v_offset=v_offset)
    return (grads.astype(logits_band_local.dtype), None, None, None, None,
            None)


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


def make_dp_tp_fused_loss(mesh: Mesh, joint_fn, params_specs, *,
                          blank_id: int = 0, chunk_t: int = 32,
                          mean_over_batch: bool = True,
                          with_bands: bool = False):
    """Jitted memory-efficient fused-joint loss: batch on 'data', V on 'model'.

    The production configuration for large vocabularies: the joint network's
    output projection is sharded over the model axis, each shard computes
    only its [B, Tc, S1, V/n_model] logits slice chunk by chunk, and the
    loss combines softmax statistics with pmax/psum collectives — the
    monolithic [B, T, S1, V] tensor never exists on any chip.

    Args:
      joint_fn: (params_local, enc_chunk, pred) -> local V-slice logits.
      params_specs: pytree of PartitionSpec matching joint_params; leaves
        producing the vocab axis must be sharded on MODEL_AXIS (e.g. the
        output projection's last axis), the rest replicated.
      with_bands: if True the returned fn takes trailing (band_min, band_max)
        [B, T] arrays restricting the lattice (bands_from_alignment).

    Returns fn(enc [B,T,De], pred [B,S1,Dp], labels, input_lengths,
    label_lengths, joint_params[, band_min, band_max]) -> scalar loss,
    differentiable w.r.t. enc, pred, and joint_params (parameter gradients
    come back in the same sharded layout as params_specs).
    """
    from ..ops.chunked import rnnt_loss_fused_joint

    dspec3 = P(DATA_AXIS, None, None)
    base_specs = (dspec3, dspec3, P(DATA_AXIS, None), P(DATA_AXIS),
                  P(DATA_AXIS), params_specs)
    band_specs = (P(DATA_AXIS, None), P(DATA_AXIS, None))

    def _body(enc, pred, labels, ilen, slen, params, bands):
        costs = rnnt_loss_fused_joint(
            enc, pred, labels, ilen, slen, joint_fn, params,
            blank_id=blank_id, chunk_t=chunk_t, bands=bands,
            axis_name=MODEL_AXIS)
        total = jax.lax.psum(jnp.sum(costs), DATA_AXIS)
        if mean_over_batch:
            n = jax.lax.psum(jnp.asarray(costs.shape[0], jnp.float32),
                             DATA_AXIS)
            return total / n
        return total

    if with_bands:
        @partial(shard_map, mesh=mesh, in_specs=base_specs + band_specs,
                 out_specs=P())
        def _fn(enc, pred, labels, ilen, slen, params, band_min, band_max):
            return _body(enc, pred, labels, ilen, slen, params,
                         Bands(band_min, band_max))
    else:
        @partial(shard_map, mesh=mesh, in_specs=base_specs, out_specs=P())
        def _fn(enc, pred, labels, ilen, slen, params):
            return _body(enc, pred, labels, ilen, slen, params, None)

    return jax.jit(_fn)


def make_dp_tp_fused_banded_loss(mesh: Mesh, joint_fn, params_specs, *,
                                 band_width: int, blank_id: int = 0,
                                 chunk_t: int = 32,
                                 mean_over_batch: bool = True):
    """Jitted O(W) fused-joint loss: batch on 'data', vocab on 'model'.

    The full composition for alignment-restricted long utterances with
    large vocabularies: the joint network is evaluated only on band cells
    (ops/chunked_banded.py), streamed in T-chunks, with its output
    projection sharded over the model axis — per-chip work is
    O(B/n_data · T · W · V/n_model) and the [B, T, W, V] band tensor never
    exists on any chip.

    joint_fn follows the banded contract: (params_local, enc_chunk
    [B,Tc,De], pred_band [B,Tc,W,Dp]) -> [B, Tc, W, V_local] logits.

    Returns fn(enc, pred, labels, input_lengths, label_lengths,
    joint_params, band_min [B,T], band_max [B,T]) -> scalar loss.
    """
    from ..ops.chunked_banded import rnnt_loss_fused_joint_banded

    dspec3 = P(DATA_AXIS, None, None)

    @partial(shard_map, mesh=mesh,
             in_specs=(dspec3, dspec3, P(DATA_AXIS, None), P(DATA_AXIS),
                       P(DATA_AXIS), params_specs, P(DATA_AXIS, None),
                       P(DATA_AXIS, None)),
             out_specs=P())
    def _fn(enc, pred, labels, ilen, slen, params, band_min, band_max):
        costs = rnnt_loss_fused_joint_banded(
            enc, pred, labels, ilen, slen, joint_fn, params,
            bands=Bands(band_min, band_max), band_width=band_width,
            blank_id=blank_id, chunk_t=chunk_t, axis_name=MODEL_AXIS)
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
