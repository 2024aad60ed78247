"""Worker for the 2-process jax.distributed test (see test_multiprocess.py).

Launched as: python _multiproc_worker.py <proc_id> <num_procs> <port>
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=2 in the
environment (set by the parent BEFORE interpreter startup — sitecustomize
imports jax eagerly, so in-process env tweaks would be too late).

Each process owns 2 virtual CPU devices; the pair forms a 4-way 'data' mesh.
Every process generates the same global batch deterministically, feeds only
its local_batch_slice through make_array_from_process_local_data, and runs
the data-parallel mean loss. Process 0 prints the result for the parent to
compare against the single-process oracle.
"""

import sys

proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import numpy as np
import jax

# The container's sitecustomize registers the axon TPU plugin at interpreter
# startup, overriding JAX_PLATFORMS env — force CPU through jax.config (the
# backend itself is created lazily, so this is still in time). gloo provides
# the cross-process CPU collectives.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from monotonic_rnnt_tpu.parallel import (initialize_multihost,  # noqa: E402
                                         local_batch_slice,
                                         make_data_parallel_loss, make_mesh)

initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=num_procs, process_id=proc_id)
assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == 2 * num_procs, jax.devices()

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

GB, T, S, V = 8, 12, 4, 10
mesh = make_mesh(data=len(jax.devices()))
start, size = local_batch_slice(GB, mesh)
assert size == GB // num_procs, (start, size)
assert start == proc_id * size, (start, size)

rng = np.random.RandomState(0)  # identical global batch on every process
logits = rng.randn(GB, T, S + 1, V).astype(np.float32)
labels = rng.randint(1, V, size=(GB, S)).astype(np.int32)
ilen = np.full((GB,), T, np.int32)
slen = np.full((GB,), S, np.int32)


def _global(x, spec):
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, x[start:start + size])


loss_fn = make_data_parallel_loss(mesh, backend="reference")
loss = loss_fn(_global(logits, P("data")), _global(labels, P("data")),
               _global(ilen, P("data")), _global(slen, P("data")))
val = float(jax.device_get(loss))

# DP x TP over process boundaries: 2x2 mesh puts both model shards of a
# data row on one process, so the vocab psum/pmax collectives cross device
# (not process) links here, while the data-mean psum crosses processes —
# the same topology split a 2-host TPU pod would use.
from monotonic_rnnt_tpu.parallel import make_dp_tp_loss  # noqa: E402

mesh2 = make_mesh(data=len(jax.devices()) // 2, model=2)
start2, size2 = local_batch_slice(GB, mesh2)


def _global2(x, spec):
    sharding = NamedSharding(mesh2, spec)
    return jax.make_array_from_process_local_data(
        sharding, x[start2:start2 + size2])


tp_fn = make_dp_tp_loss(mesh2)
tp_loss = tp_fn(_global2(logits, P("data", None, None, "model")),
                _global2(labels, P("data")), _global2(ilen, P("data")),
                _global2(slen, P("data")))
tp_val = float(jax.device_get(tp_loss))
if proc_id == 0:
    print(f"DP_LOSS={val:.6f}", flush=True)
    print(f"TP_LOSS={tp_val:.6f}", flush=True)
