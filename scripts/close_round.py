"""One-command round closing: every on-device evidence harness -> artifact.

Round 4 built evidence harnesses but persisted none of their artifacts; the
round-4 verdict's top ask is that "run the harnesses to committed artifacts"
be one command so no future round ships bare. This runs each harness in its
OWN subprocess (a clean device heap per harness — the multi-GB benches
poison later allocations in a process that hit RESOURCE_EXHAUSTED) and
writes the per-round artifact set:

    python scripts/close_round.py --round 5 [--only SUBSTR] [--skip SUBSTR]

Artifacts produced (same roles as the r02/r03 sets):
  ACCEPTANCE_rNN.json      compiled-kernel acceptance + fuzz (tpu golden runs
                           — the evidentiary role of reference
                           tests/test_gpu.cu:16-83)
  BENCH_SPLIT_rNN.json     split-pipeline (fallback) regime throughput
  SIZE_SWEEP_rNN.json      the reference TF test's exact shape list
  TRAIN_rNN.json           fresh-seed overfit run (seed = round number, so
                           consecutive rounds can never be byte-identical)
  BENCH_BANDED_rNN.json    packed band layout speedup (f32 + bf16)
  BENCH_FUSED_BANDED_rNN.json  fused banded joint+loss pipeline
  BENCH_DECODE_rNN.json    greedy/beam serving latency
  BENCH_MEMORY_rNN.json    fused-joint memory ceiling
The headline BENCH_rNN.json / MULTICHIP_rNN.json are driver-captured at
round end (bench.py / __graft_entry__.py) — not duplicated here.

Exit status is nonzero if any step failed; a summary table prints last.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def steps_for(n: int, seed: int):
    r = f"r{n:02d}"
    py = sys.executable

    def art(name):
        return f"{name}_{r}.json"

    return [
        (art("ACCEPTANCE"),
         [py, "-u", "scripts/run_acceptance.py", "--out", art("ACCEPTANCE"),
          "--cases", "30", "--seed", str(seed)]),
        (art("BENCH_SPLIT"),
         [py, "-u", "benchmarks/split_bench.py", "--json-out",
          art("BENCH_SPLIT")]),
        (art("SIZE_SWEEP"),
         [py, "-u", "benchmarks/size_sweep.py", "--json-out",
          art("SIZE_SWEEP")]),
        (art("TRAIN"),
         [py, "-u", "examples/train_tiny.py", "--steps", "300", "--batch",
          "8", "--overfit", "--seed", str(seed), "--json-out", art("TRAIN")]),
        (art("BENCH_BANDED"),
         [py, "-u", "benchmarks/banded_bench.py", "--json-out",
          art("BENCH_BANDED")]),
        (art("BENCH_BANDED_BF16"),
         [py, "-u", "benchmarks/banded_bench.py", "--dtype", "bf16",
          "--json-out", art("BENCH_BANDED_BF16")]),
        (art("BENCH_FUSED_BANDED"),
         [py, "-u", "benchmarks/fused_banded_bench.py", "--json-out",
          art("BENCH_FUSED_BANDED")]),
        (art("BENCH_DECODE"),
         [py, "-u", "benchmarks/decode_bench.py", "--json-out",
          art("BENCH_DECODE")]),
        (art("BENCH_MEMORY"),
         [py, "-u", "benchmarks/memory_bench.py", "--json-out",
          art("BENCH_MEMORY")]),
    ]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--seed", type=int, default=None,
                    help="fuzz/train seed (default: the round number, so "
                         "every round's randomized evidence is fresh)")
    ap.add_argument("--only", default=None,
                    help="run only steps whose artifact name contains this")
    ap.add_argument("--skip", default=None)
    ap.add_argument("--timeout", type=int, default=10800,
                    help="per-step timeout in seconds (the acceptance step "
                         "alone runs ~100 min through the tunnel: ~25 "
                         "compiled checks + 30 fuzz cases + the over-cap "
                         "subprocesses, compile-dominated)")
    args = ap.parse_args(argv)
    seed = args.round if args.seed is None else args.seed

    results = []
    for name, cmd in steps_for(args.round, seed):
        if args.only and args.only not in name:
            continue
        if args.skip and args.skip in name:
            print(f"SKIP {name}")
            continue
        print(f"\n=== {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, cwd=REPO, timeout=args.timeout)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = -9
        ok = rc == 0 and (REPO / name).exists()
        results.append((name, ok, rc, time.time() - t0))
        print(f"=== {name}: {'OK' if ok else f'FAILED rc={rc}'} "
              f"({time.time() - t0:.0f}s)", flush=True)

    print("\n== close_round summary ==")
    for name, ok, rc, dt in results:
        print(f"  {'PASS' if ok else 'FAIL':4s} {name:28s} {dt:6.0f}s"
              + ("" if ok else f"  rc={rc}"))
    n_fail = sum(1 for _, ok, _, _ in results if not ok)
    print(f"{len(results) - n_fail}/{len(results)} artifacts written")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
