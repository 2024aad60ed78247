"""Weak-scaling benchmark: fixed per-device batch, growing device count.

Reports audio-equivalent throughput and scaling efficiency (BASELINE.json
north star: >= 90% weak-scaling efficiency). On a single real chip this
degenerates to the 1-device row; run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu to
exercise the sharded code path on a virtual mesh (functional check; CPU
timing is not a TPU perf claim).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_mesh(n_devices: int, per_device_batch: int = 8,
               t: int = 200, s: int = 50, v: int = 1000, iters: int = 10):
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from functools import partial
    from monotonic_rnnt_tpu.parallel import make_mesh, DATA_AXIS
    from monotonic_rnnt_tpu.ops.loss import _resolve_backend, _run
    from monotonic_rnnt_tpu.ops.bands import default_bands

    mesh = make_mesh(data=n_devices, model=1)
    batch = per_device_batch * n_devices
    rng = np.random.RandomState(0)
    logits = jax.device_put(rng.randn(batch, t, s + 1, v).astype(np.float32))
    labels = jax.device_put(rng.randint(1, v, (batch, s)).astype(np.int32))
    ilen = jnp.full((batch,), t, jnp.int32)
    slen = jnp.full((batch,), s, jnp.int32)
    backend = _resolve_backend(None)

    spec = P(DATA_AXIS)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(DATA_AXIS, None, None, None), spec, spec, spec),
             out_specs=P())
    def sharded_step(x, labels, ilen, slen):
        bands = default_bands(ilen, slen, t)
        c, g = _run(x, labels, ilen, slen, bands, 0, backend, True)
        return jax.lax.psum(jnp.sum(c) + g[0, 0, 0, 0] * 1e-20, DATA_AXIS)

    def body(i, carry):
        x, acc = carry
        x = x.at[:, 0, 0, 0].add(acc * 1e-20)
        return (x, sharded_step(x, labels, ilen, slen))

    run = jax.jit(lambda x: jax.lax.fori_loop(
        0, iters, body, (x, jnp.float32(0)))[1])
    _ = float(run(logits))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(logits))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, batch


def main():
    import jax
    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    print(f"devices available: {n_avail} ({jax.devices()[0].platform})")
    base = None
    for n in sizes:
        dt, batch = bench_mesh(n)
        cells = batch * 200 * 51
        if base is None:
            base = dt
        eff = base / dt
        print(f"n={n:2d}: {dt * 1e3:8.3f} ms/iter, batch {batch:3d}, "
              f"{cells / dt / 1e6:8.1f} Mcells/s, "
              f"weak-scaling efficiency {eff * 100:5.1f}%")


if __name__ == "__main__":
    main()
