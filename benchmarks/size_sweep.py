"""Shape sweep — parity with the reference TF-binding size/perf tests.

Reference: tensorflow_binding/test.py:127-176 sweeps the shapes below,
asserts no inf/nan in costs or grads, and prints average latency. Same
protocol here, with honest timing for a tunneled async device: K dependent
iterations inside one jit, two-point dispatch-corrected (the axon tunnel
adds ~30 ms fixed cost per dispatch — fatal to naive per-call timing at
these sub-millisecond shapes).

    python benchmarks/size_sweep.py [--json-out SIZE_SWEEP.json]
                                    [--ceiling-gbps 650]

Each row also reports achieved HBM GB/s against the pipeline's algorithmic
minimum traffic (2 reads + 1 write of [B, T, S+1, V] f32) and the fraction
of the measured stream ceiling that implies. Tiny shapes are launch-bound,
not bandwidth-bound (the whole lattice is < 2 MB, a few microseconds of
traffic vs fixed per-kernel costs), so low fractions there are expected;
the large-V rows are the ones the bound is meaningful for.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (B, T, S, V, iters) — reference tensorflow_binding/test.py:164-170 shape
# list; iters scaled up from the reference's counts for the two-point
# dispatch correction (sub-ms shapes need a long chain to resolve).
SWEEP = [
    (1, 150, 20, 50, 200),
    (1, 150, 20, 5000, 100),
    (16, 150, 20, 50, 200),
    (16, 150, 20, 5000, 40),
    (2, 391, 300, 79, 40),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json-out", default=None)
    p.add_argument("--ceiling-gbps", type=float, default=650.0,
                   help="measured HBM stream ceiling (bench.py calibrates "
                        "~650 GB/s f32 on v5e through the axon tunnel)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from monotonic_rnnt_tpu.ops.bands import default_bands
    from monotonic_rnnt_tpu.ops.loss import _resolve_backend, _run
    from monotonic_rnnt_tpu.utils.profiling import (corrected_loop_bench,
                                                    default_perturb)

    backend = _resolve_backend(None)
    print(f"backend={backend} device={jax.devices()[0]}")
    rows = []
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
            return c[0] + g[0, 0, 0, 0].astype(jnp.float32)

        iter_s, oh = corrected_loop_bench(
            step, default_perturb, lambda o: o * 1e-20,
            (logits, labels, ilen, slen), iters=iters, trials=3)
        nbytes = B * T * (S + 1) * V * 4
        gbps = 3 * nbytes / iter_s / 1e9
        frac = gbps / args.ceiling_gbps
        print(f"B={B:3d} T={T:4d} S={S:4d} V={V:5d}: "
              f"{iter_s * 1e3:8.3f} ms  {gbps:6.1f} GB/s "
              f"({frac:.2f} of ceiling)  finite={ok}")
        rows.append({
            "B": B, "T": T, "S": S, "V": V, "iters": iters,
            "iter_ms": round(iter_s * 1e3, 4),
            "dispatch_overhead_ms": round(oh * 1e3, 1),
            "achieved_GBps": round(gbps, 1),
            "fraction_of_ceiling": round(frac, 3),
            "lattice_MB": round(nbytes / 2**20, 2),
            "finite": ok,
        })
        assert ok, f"inf/nan at shape {(B, T, S, V)}"

    if args.json_out:
        from monotonic_rnnt_tpu.utils.provenance import provenance_stamp

        Path(args.json_out).write_text(json.dumps({
            "protocol": "in-jit dependent chain, two-point dispatch-"
                        "corrected; GB/s = 3 passes of [B,T,S+1,V] f32 "
                        "(the fused pipeline's algorithmic minimum)",
            "ceiling_GBps": args.ceiling_gbps,
            "backend": backend,
            "rows": rows,
            "provenance": provenance_stamp(seed=0),
        }, indent=1) + "\n")
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
