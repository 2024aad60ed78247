"""Public monotonic RNN-T loss API (padded layout, custom VJP).

This is the framework's top-level entry point — the role the reference's
framework bindings play (reference: pytorch_binding/monotonic_rnnt_op.py:121-163
and tensorflow_binding/register_op.py:20-72) — expressed as a single JAX
function that works under jit/grad/vmap/shard_map.

Design decisions mirrored from the reference, re-idiomized for TPU:
  * gradients are produced by the forward-backward pass itself, so the VJP
    backward rule is just a broadcast multiply by the incoming cotangent
    (reference monotonic_rnnt_op.py:96-118 "repeat_interleave" chain rule —
    here a [B] -> [B,1,1,1] broadcast on the padded layout);
  * when the loss is *not* differentiated, the primal path runs the alpha-only
    cost computation and skips betas/gradients entirely (the reference's
    `training` flag fast path, gpu_rnnt.h:37,139);
  * the alignment-restricted variant is the same lattice with band masks
    (reference restrict_to_alignment, cpu_workspace_manager.h:207-224).
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils.config import get_config
from ..utils.status import validate_loss_inputs
from .bands import Bands, bands_from_alignment, default_bands
from .reference import rnnt_loss_reference

_BACKENDS = ("auto", "reference", "pallas")


def _resolve_backend(backend: Optional[str]) -> str:
    backend = backend or get_config().backend
    if backend not in _BACKENDS:
        raise ValueError(f"backend must be one of {_BACKENDS}, got {backend!r}")
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "reference"
    return backend


def use_pallas_kernels() -> bool:
    """True when compiled Pallas kernels should run on this host.

    Two gates: the actual device platform (interpret mode cannot execute
    inside shard_map and a compiled Pallas call can't run on CPU, so non-TPU
    hosts keep the XLA path regardless of MRNNT_BACKEND), AND the resolved
    config backend (MRNNT_BACKEND=reference must bypass the kernels on
    hardware too — that is the whole point of the debug backend).
    jax_disable_jit rules out compiled calls entirely.
    """
    return (jax.default_backend() == "tpu"
            and _resolve_backend(None) == "pallas"
            and not jax.config.jax_disable_jit)


def _run(logits, labels, input_lengths, label_lengths, bands, blank_id,
         backend, with_grads):
    if backend == "pallas":
        from .pallas.fused import rnnt_loss_pallas
        return rnnt_loss_pallas(logits, labels, input_lengths, label_lengths,
                                blank_id=blank_id, bands=bands,
                                with_grads=with_grads)
    return rnnt_loss_reference(logits, labels, input_lengths, label_lengths,
                               blank_id=blank_id, bands=bands,
                               with_grads=with_grads)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _loss_core(logits, labels, input_lengths, label_lengths, band_min,
               band_max, blank_id, backend):
    costs, _ = _run(logits, labels, input_lengths, label_lengths,
                    Bands(band_min, band_max), blank_id, backend,
                    with_grads=False)
    return costs


def _loss_fwd(logits, labels, input_lengths, label_lengths, band_min,
              band_max, blank_id, backend):
    if backend == "pallas":
        from .pallas.fused import (deferred_grad_supported,
                                   rnnt_loss_pallas_deferred_fwd)

        if deferred_grad_supported(jnp.shape(logits),
                                   jnp.asarray(logits).dtype):
            # Deferred-gradient route: forward is ONE read of the logits;
            # the beta+gradient pass runs in the bwd rule with the cost
            # cotangent folded into the occupancy coefficients in-kernel.
            # vs the forward-produced route, a training step saves a full
            # read+write of the big tensor (the cotangent scaling pass)
            # and keeps four [B, T, S1] residuals instead of [B, T, S1, V].
            costs, res = rnnt_loss_pallas_deferred_fwd(
                logits, labels, input_lengths, label_lengths,
                blank_id=blank_id, bands=Bands(band_min, band_max))
            return costs, {"deferred": (logits, labels, input_lengths,
                                        label_lengths, band_min, band_max,
                                        res)}
    costs, grads = _run(logits, labels, input_lengths, label_lengths,
                        Bands(band_min, band_max), blank_id, backend,
                        with_grads=True)
    # Zero-size marker array records the primal dtype for the cotangent cast.
    return costs, {"eager": (grads,
                             jnp.zeros((0,), jnp.asarray(logits).dtype))}


def _loss_bwd(blank_id, backend, residuals, cost_cotangent):
    if "deferred" in residuals:
        from .pallas.fused import rnnt_loss_pallas_deferred_bwd

        (logits, labels, input_lengths, label_lengths, band_min, band_max,
         res) = residuals["deferred"]
        dlogits = rnnt_loss_pallas_deferred_bwd(
            logits, labels, input_lengths, label_lengths, res,
            cost_cotangent, blank_id=blank_id,
            bands=Bands(band_min, band_max))
        return (dlogits, None, None, None, None, None)
    grads, dtype_marker = residuals["eager"]
    dlogits = (grads * cost_cotangent[:, None, None, None]).astype(
        dtype_marker.dtype)
    return (dlogits, None, None, None, None, None)


_loss_core.defvjp(_loss_fwd, _loss_bwd)


def monotonic_rnnt_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    *,
    blank_id: int = 0,
    alignment: Optional[jnp.ndarray] = None,
    max_distance_from_alignment: int = 0,
    bands: Optional[Bands] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Monotonic RNN-T negative log-likelihood per sample.

    Args:
      logits: [B, T_max, S_max+1, V] raw (pre-softmax) joint-network outputs.
        Padding cells may hold arbitrary finite values. f32 or bf16 (the
        forward-backward recursion always accumulates in f32).
      labels: [B, S_max] int32 target labels (no blanks).
      input_lengths: [B] int32 frames per sample, 1 <= T_b <= T_max.
      label_lengths: [B] int32 labels per sample, 0 <= S_b <= min(S_max, T_b).
      blank_id: vocabulary index of the blank symbol (static).
      alignment: optional [B, T_max] int32 reference alignment for the
        alignment-restricted variant (reference MonotonicRNNTAlignRestrict op).
      max_distance_from_alignment: half-width of the allowed band around
        `alignment` in frames; 0 scores exactly the given path.
      bands: pre-computed Bands, mutually exclusive with `alignment`.
      backend: 'auto' (default; Pallas on TPU), 'pallas', or 'reference'.

    Returns:
      [B] float32 costs (negative log-likelihoods). Differentiable w.r.t.
      logits; the gradient is produced by the same fused pass.
    """
    validate_loss_inputs(logits, labels, input_lengths, label_lengths)
    t_max = logits.shape[1]
    if alignment is not None and bands is not None:
        raise ValueError("pass either alignment or bands, not both")
    if bands is None:
        if alignment is not None:
            bands = bands_from_alignment(alignment, input_lengths,
                                         label_lengths,
                                         max_distance_from_alignment, blank_id)
        else:
            bands = default_bands(input_lengths, label_lengths, t_max)
    resolved = _resolve_backend(backend)
    timed = (get_config().debug_time
             and not isinstance(logits, jax.core.Tracer))
    with contextlib.ExitStack() as stack:
        if timed:
            from ..utils.profiling import phase_timer
            stack.enter_context(
                phase_timer(f"monotonic_rnnt_loss[{resolved}]"))
        out = _loss_core(logits, labels,
                         input_lengths.astype(jnp.int32),
                         label_lengths.astype(jnp.int32),
                         bands.min_s, bands.max_s, int(blank_id), resolved)
        if timed:
            jax.block_until_ready(out)
    return out


def monotonic_rnnt_alignment_score(logits, labels, input_lengths,
                                   label_lengths, alignment, *,
                                   blank_id: int = 0, backend=None):
    """Negative log-probability of exactly the given alignment path.

    Convenience wrapper for max_distance_from_alignment=0 (reference
    pytorch_binding/test.py:110-128 semantics).
    """
    return monotonic_rnnt_loss(
        logits, labels, input_lengths, label_lengths, blank_id=blank_id,
        alignment=alignment, max_distance_from_alignment=0, backend=backend)
