"""Kernel benchmark CLI — parity with the reference timing harness.

Reference: tests/test_time.cpp / test_time.cu take (B, T, S, V [, threads])
on the CLI and print mean + variance wall time over iterations. Same here,
plus TPU-specific extras: backend choice, bf16 inputs, cost-only fast path,
and a measured-HBM roofline report.

Usage:
  python benchmarks/kernel_bench.py B T S V [--iters N] [--backend pallas]
      [--dtype f32|bf16] [--cost-only] [--align-shift K]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("B", type=int)
    p.add_argument("T", type=int)
    p.add_argument("S", type=int)
    p.add_argument("V", type=int)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--backend", default=None,
                   choices=[None, "pallas", "reference"])
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--cost-only", action="store_true")
    p.add_argument("--align-shift", type=int, default=None,
                   help="benchmark the alignment-restricted variant")
    p.add_argument("--banded", action="store_true",
                   help="with --align-shift: run the packed band-layout "
                        "pipeline instead of the full-lattice one")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.bands import bands_from_alignment
    from monotonic_rnnt_tpu.ops.loss import _resolve_backend, _run
    from monotonic_rnnt_tpu.ops.bands import default_bands
    from monotonic_rnnt_tpu.utils.profiling import (default_perturb,
                                                    dependent_loop_bench)

    B, T, S, V = args.B, args.T, args.S, args.V
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    logits = jax.device_put(
        rng.randn(B, T, S + 1, V).astype(np.float32)).astype(dtype)
    labels = jax.device_put(rng.randint(1, V, size=(B, S)).astype(np.int32))
    ilen = jnp.full((B,), T, jnp.int32)
    slen = jnp.full((B,), S, jnp.int32)
    backend = _resolve_backend(args.backend)

    if args.align_shift is not None:
        align = np.zeros((B, T), np.int32)
        for b in range(B):
            pos = np.sort(rng.choice(T, size=S, replace=False))
            align[b, pos] = np.asarray(labels)[b]
        bands = bands_from_alignment(jnp.asarray(align), ilen, slen,
                                     args.align_shift, 0)
    else:
        bands = default_bands(ilen, slen, T)

    s_rows = S + 1  # lattice rows actually streamed (W when banded)
    if args.banded:
        if args.align_shift is None:
            p.error("--banded requires --align-shift")
        from monotonic_rnnt_tpu.ops.banded import _run_banded
        from monotonic_rnnt_tpu.ops.bands import (compute_band_layout,
                                                  pack_band,
                                                  suggested_band_width)

        w = suggested_band_width(ilen, slen, bands, T, S + 1)
        layout = compute_band_layout(ilen, slen, bands, T, S + 1, w)
        logits = jax.device_put(pack_band(logits, layout))
        s_rows = w
        print(f"packed band width {w} (vs S+1={S + 1})")

    runner = _run_banded if args.banded else (
        lambda x, la, il, sl, bd, blank, be, with_grads:
        _run(x, la, il, sl, bd, blank, be, with_grads))

    def step(x, labels, ilen, slen):
        costs, grads = runner(x, labels, ilen, slen, bands, 0, backend,
                              not args.cost_only)
        fb = costs[0]
        if grads is not None:
            fb = fb + grads[0, 0, 0, 0].astype(jnp.float32)
        return fb

    mean_s, var_s = dependent_loop_bench(
        step, default_perturb, lambda out: out * 1e-20,
        (logits, labels, ilen, slen), iters=args.iters)

    cells = B * T * s_rows
    bpe = 2 if args.dtype == "bf16" else 4
    passes = 1 if args.cost_only else 3
    traffic = passes * B * T * s_rows * V * bpe
    print(f"backend={backend} dtype={args.dtype} "
          f"{'cost-only' if args.cost_only else 'fwd+bwd+grad'} "
          f"B={B} T={T} S={S} V={V}"
          f"{f' (banded W={s_rows})' if args.banded else ''}")
    print(f"mean {mean_s * 1e3:.3f} ms/iter (var {var_s * 1e6:.4f} ms^2, "
          f"{args.iters} iters)")
    print(f"{cells / mean_s / 1e6:.1f} Mcells/s, "
          f"{traffic / mean_s / 1e9:.1f} GB/s effective "
          f"({passes} logical passes over the "
          f"{'packed band' if args.banded else 'activation'} tensor)")


if __name__ == "__main__":
    main()
