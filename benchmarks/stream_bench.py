"""Sweep the streaming-copy kernels to find the true HBM bandwidth ceiling.

Answers the calibration question behind bench.py's roofline: is the ~650
GB/s measured copy rate the axon tunnel's realizable ceiling, or was the
XLA multiply-add chain a weak calibrator? Runs every stream_copy config
(VMEM block sizes, DMA buffer counts) plus the XLA chain, f32 and bf16, on
a ~1.3 GB tensor, dependent-chain timed with two-point dispatch correction
(the tunnel adds ~30 ms fixed cost per dispatch).

Usage: python benchmarks/stream_bench.py [--rows 327680] [--cols 1024]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=327680)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--full", action="store_true",
                    help="widen the config sweep (more chip compiles)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.pallas.stream import stream_copy
    from monotonic_rnnt_tpu.utils.profiling import corrected_args_loop_bench

    results = {"device": str(jax.devices()[0]),
               "shape": [args.rows, args.cols], "configs": {}}

    for dtype, dname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jax.device_put(
            np.random.RandomState(0)
            .randn(args.rows, args.cols).astype(np.float32)).astype(dtype)
        nbytes = args.rows * args.cols * x.dtype.itemsize

        # Each config costs two ~25 s chip compiles (the two-point fit), so
        # keep the set tight: the XLA RMW chain, two VMEM block sizes, one
        # multi-engine DMA. --full widens the sweep.
        configs = [("xla_chain", "xla"),
                   ("vmem_512", ("vmem", 512)),
                   ("vmem_2048", ("vmem", 2048)),
                   ("dma_4", ("dma", 4))]
        if args.full:
            configs += [("vmem_256", ("vmem", 256)),
                        ("vmem_1024", ("vmem", 1024)), ("dma_1", ("dma", 1)),
                        ("dma_8", ("dma", 8))]

        for name, cfg in configs:
            if cfg == "xla":
                def body(y):
                    return y * 1.0000001 + jnp.asarray(1e-9, y.dtype)
            elif cfg[0] == "vmem":
                def body(y, br=cfg[1]):
                    return stream_copy(y, mode="vmem", block_rows=br)
            else:
                def body(y, nb=cfg[1]):
                    return stream_copy(y, mode="dma", nbuf=nb)

            if cfg == "xla":
                # The XLA RMW chain must run as a fori_loop: unrolled, XLA
                # fuses the k multiply-adds into ONE pass over the tensor
                # (meaningless TB/s). In the loop, XLA updates the carry
                # buffer in place — the in-place RMW stream rate.
                def make_loop(k, body=body):
                    return jax.jit(lambda a: jax.lax.fori_loop(
                        0, k, lambda i, y: body(y), a))
            else:
                # Pallas copies run as an unrolled dependent chain: inside a
                # fori_loop the while-carry forces an extra full-tensor copy
                # per iteration (a pallas_call output cannot alias the
                # carry), which halves the apparent rate. Unrolled, XLA
                # ping-pongs two buffers — the clean out-of-place stream.
                def make_loop(k, body=body):
                    def chain(a):
                        for _ in range(k):
                            a = body(a)
                        return a
                    return jax.jit(chain)

            t = corrected_args_loop_bench(make_loop, (x,), iters=24)
            gbps = 2 * nbytes / t / 1e9
            results["configs"][f"{dname}/{name}"] = round(gbps, 1)
            print(f"{dname}/{name}: {gbps:.1f} GB/s", file=sys.stderr)

    best_f32 = max(v for k, v in results["configs"].items()
                   if k.startswith("f32/"))
    best_bf16 = max(v for k, v in results["configs"].items()
                    if k.startswith("bf16/"))
    results["best_f32_GBps"] = best_f32
    results["best_bf16_GBps"] = best_bf16
    print(json.dumps(results))


if __name__ == "__main__":
    main()
