"""Device mesh construction and multi-host runtime initialization.

TPU-native replacement for the reference's transport layer. The reference has
no distributed layer at all — its "backend" is CUDA streams + cudaMemcpy
(reference: options.h:17, gpu_workspace_manager.h:87-189); scaling here rides
jax.sharding meshes: data-parallel over batch on the 'data' axis, optional
vocab sharding on the 'model' axis, with XLA collectives over ICI.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices.

    Args:
      data: size of the data axis; defaults to n_devices // model.
      model: size of the model (vocab-sharding) axis.
      devices: explicit device list (defaults to jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for loss inputs."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the multi-host JAX runtime (no-op on a single host).

    Reads the standard JAX env vars when args are omitted. On TPU pods the
    runtime discovers topology automatically; loss/grad all-reduce then rides
    ICI within a slice, with DCN used only for host-side data feeding.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_slice(global_batch: int, mesh: Mesh) -> Tuple[int, int]:
    """(start, size) of this process's batch shard along the data axis.

    When there are more processes than data shards (e.g. vocab sharding
    across hosts with data=1), the shard owner is the process whose id
    matches the shard; the others feed the same replicated slice — every
    process must see identical data for a replicated axis.
    """
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"data axis {n_data}")
    per = global_batch // n_data
    idx = jax.process_index()
    procs = max(1, jax.process_count())
    if procs >= n_data:
        # >= 1 process per shard: processes sharing a shard get the same
        # slice (procs_per_shard of them each feed identical data). A
        # non-divisible ratio would need JAX's actual device->process layout
        # to assign the remainder correctly — reject rather than guess.
        if procs % n_data:
            raise ValueError(
                f"process count {procs} not divisible by data axis {n_data}; "
                "shard assignment would depend on the device->process layout")
        shard = idx // (procs // n_data)
        return shard * per, per
    if n_data % procs:
        raise ValueError(
            f"data axis {n_data} not divisible by process count {procs}; "
            "some shards would never be fed")
    shards_per_proc = n_data // procs
    return idx * shards_per_proc * per, shards_per_proc * per
