"""Shape sweep — parity with the reference TF-binding size/perf tests.

Reference: tensorflow_binding/test.py:127-176 sweeps the shapes below,
asserts no inf/nan in costs or grads, and prints average latency. Same
protocol here (honest in-jit dependent timing).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (B, T, S, V, iters) — reference tensorflow_binding/test.py:164-170.
SWEEP = [
    (1, 150, 20, 50, 20),
    (1, 150, 20, 5000, 20),
    (16, 150, 20, 50, 20),
    (16, 150, 20, 5000, 10),
    (2, 391, 300, 79, 1),
]


def main():
    import jax
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.loss import _resolve_backend, _run
    from monotonic_rnnt_tpu.ops.bands import default_bands
    from monotonic_rnnt_tpu.utils.profiling import (default_perturb,
                                                    dependent_loop_bench)

    backend = _resolve_backend(None)
    print(f"backend={backend} device={jax.devices()[0]}")
    for (B, T, S, V, iters) in SWEEP:
        rng = np.random.RandomState(0)
        logits = jax.device_put(rng.randn(B, T, S + 1, V).astype(np.float32))
        labels = jax.device_put(rng.randint(1, V, (B, S)).astype(np.int32))
        ilen = jnp.full((B,), T, jnp.int32)
        slen = jnp.full((B,), S, jnp.int32)
        bands = default_bands(ilen, slen, T)

        # correctness: no inf/nan (reference asserts exactly this)
        f = jax.jit(lambda x: _run(x, labels, ilen, slen, bands, 0, backend,
                                   True))
        costs, grads = f(logits)
        ok = bool(jnp.isfinite(costs).all()) and bool(
            jnp.isfinite(grads).all())

        def step(x, labels, ilen, slen):
            c, g = _run(x, labels, ilen, slen, bands, 0, backend, True)
            return c[0] + g[0, 0, 0, 0]

        mean_s, _ = dependent_loop_bench(
            step, default_perturb, lambda o: o * 1e-20,
            (logits, labels, ilen, slen), iters=max(iters, 3), trials=1)
        print(f"B={B:3d} T={T:4d} S={S:4d} V={V:5d}: "
              f"{mean_s * 1e3:8.3f} ms  finite={ok}")
        assert ok, f"inf/nan at shape {(B, T, S, V)}"


if __name__ == "__main__":
    main()
