"""Split-pipeline (fallback) benchmark on the real chip.

The DP-fused pipeline admits shapes up to its VMEM budget
(ops/pallas/kernels.fused_dp_tiles); past the cap the orchestrator falls
back to the split pipeline (softmax_stats -> lane-packed fwdbwd_scan ->
grad_pass). This bench records that regime's compiled throughput — the
perf side of the reference's naive-kernel fallback role
(gpu_rnnt.h:98-110), unquantified before round 4:

    python benchmarks/split_bench.py [--json-out BENCH_SPLIT.json]
                                     [--ceiling-gbps 650]

Rows:
  * natural over-cap shape (8, 850, 299, 512) f32 with grads —
    fused_dp_tiles is None, the public path takes the split pipeline on
    its own (asserted);
  * cost-only at the same shape with V=1024 (stats read + alpha scan);
  * the headline shape (32, 200, 50, 1000) with the split pipeline FORCED
    (pipeline='split') next to the DP-fused default from the same run,
    quantifying what the fused orchestration buys where both apply.

GB/s uses each path's algorithmic big-tensor traffic (2 reads + 1 write
with grads; 1 read cost-only). The split pipeline's distance from that
bound is its *exposed scan time* — the serial fwd/bwd DP running as its
own kernel, which the DP-fused orchestration hides inside the streams.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json-out", default=None)
    p.add_argument("--ceiling-gbps", type=float, default=650.0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from monotonic_rnnt_tpu.ops.pallas.fused import rnnt_loss_pallas
    from monotonic_rnnt_tpu.ops.pallas.kernels import fused_dp_tiles
    from monotonic_rnnt_tpu.utils.config import config_override
    from monotonic_rnnt_tpu.utils.profiling import (corrected_loop_bench,
                                                    default_perturb)

    assert jax.default_backend() != "cpu", "run this on a TPU host"
    print(f"device: {jax.devices()[0]}")
    rows = []

    def bench(name, B, T, S, V, with_grads, iters, pipeline="auto"):
        rng = np.random.RandomState(0)
        logits = jax.device_put(rng.randn(B, T, S + 1, V).astype(np.float32))
        labels = jax.device_put(rng.randint(1, V, (B, S)).astype(np.int32))
        ilen = jnp.full((B,), T, jnp.int32)
        slen = jnp.full((B,), S, jnp.int32)

        def step(x, labels, ilen, slen):
            c, g = rnnt_loss_pallas(x, labels, ilen, slen,
                                    with_grads=with_grads)
            out = c[0]
            if with_grads:
                out = out + g[0, 0, 0, 0].astype(jnp.float32)
            return out

        with config_override(pipeline=pipeline):
            iter_s, oh = corrected_loop_bench(
                step, default_perturb, lambda o: o * 1e-20,
                (logits, labels, ilen, slen), iters=iters, trials=3)
        nbytes = B * T * (S + 1) * V * 4
        passes = 3 if with_grads else 1
        gbps = passes * nbytes / iter_s / 1e9
        frac = gbps / args.ceiling_gbps
        print(f"{name}: {iter_s * 1e3:8.3f} ms  {gbps:6.1f} GB/s "
              f"({frac:.2f} of ceiling, {passes} passes)")
        rows.append({
            "name": name, "B": B, "T": T, "S": S, "V": V,
            "pipeline": pipeline, "with_grads": with_grads, "iters": iters,
            "iter_ms": round(iter_s * 1e3, 3),
            "dispatch_overhead_ms": round(oh * 1e3, 1),
            "achieved_GBps": round(gbps, 1),
            "fraction_of_ceiling": round(frac, 3),
            "big_tensor_GB": round(nbytes / 1e9, 2),
        })
        # free the ~GB-scale operands before the next row
        del logits, labels

    # Natural split regime: fused_dp_tiles is None at these shapes.
    assert fused_dp_tiles(8, 850, 300, 512) is None
    assert fused_dp_tiles(8, 850, 300, 1024) is None
    bench("split natural (8,850,299,512) fwd+grad", 8, 850, 299, 512,
          True, 12)
    bench("split natural (8,850,299,1024) cost-only", 8, 850, 299, 1024,
          False, 12)

    # Headline shape, both orchestrations from the same run.
    bench("headline (32,200,50,1000) split FORCED", 32, 200, 50, 1000,
          True, 40, pipeline="split")
    bench("headline (32,200,50,1000) dp-fused", 32, 200, 50, 1000,
          True, 40, pipeline="auto")

    if args.json_out:
        from monotonic_rnnt_tpu.utils.provenance import provenance_stamp

        Path(args.json_out).write_text(json.dumps({
            "protocol": "in-jit dependent chain, two-point dispatch-"
                        "corrected; GB/s = algorithmic passes of "
                        "[B,T,S+1,V] f32 (2r+1w grads, 1r cost-only)",
            "ceiling_GBps": args.ceiling_gbps,
            "rows": rows,
            "provenance": provenance_stamp(seed=0),
        }, indent=1) + "\n")
        print(f"wrote {args.json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
