"""Data-parallel loss over a device mesh.

The reference parallelizes over the batch inside one device (OpenMP over b,
cpu_rnnt.h:54-57; CUDA grid dim b, gpu_rnnt_kernel.h:129). The TPU equivalent
is SPMD over the 'data' mesh axis: every chip runs the identical fused kernel
pipeline on its batch shard; the only cross-chip communication is the scalar
metric psum over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.loss import monotonic_rnnt_loss
from .mesh import DATA_AXIS


def make_data_parallel_loss(mesh: Mesh, *, blank_id: int = 0,
                            backend: Optional[str] = None,
                            mean_over_batch: bool = True):
    """Build a jitted data-parallel loss fn over `mesh`'s 'data' axis.

    Returned fn(logits, labels, input_lengths, label_lengths) -> scalar loss
    (mean or sum over the global batch, psum'd over ICI). Inputs must have
    their batch dim shardable by the data axis size. Differentiable; each
    shard's logit gradients stay local (no gradient communication is needed
    for the loss itself — it is batch-separable).
    """
    spec = P(DATA_AXIS)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, None, None, None), spec, spec, spec),
             out_specs=P())
    def _sharded(logits, labels, input_lengths, label_lengths):
        costs = monotonic_rnnt_loss(logits, labels, input_lengths,
                                    label_lengths, blank_id=blank_id,
                                    backend=backend)
        total = jax.lax.psum(jnp.sum(costs), DATA_AXIS)
        if mean_over_batch:
            count = jax.lax.psum(jnp.asarray(costs.shape[0], jnp.float32),
                                 DATA_AXIS)
            return total / count
        return total

    return jax.jit(_sharded)


def make_per_sample_loss(mesh: Mesh, *, blank_id: int = 0,
                         backend: Optional[str] = None):
    """Data-parallel loss returning per-sample costs (batch-sharded [B])."""
    spec = P(DATA_AXIS)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, None, None, None), spec, spec, spec),
             out_specs=spec)
    def _sharded(logits, labels, input_lengths, label_lengths):
        return monotonic_rnnt_loss(logits, labels, input_lengths,
                                   label_lengths, blank_id=blank_id,
                                   backend=backend)

    return jax.jit(_sharded)
