"""Per-round on-device acceptance: kernels + fuzz, persisted as one artifact.

Runs the compiled-kernel acceptance checks (scripts/tpu_acceptance.py) and
the randomized fuzz sweep (scripts/fuzz_tpu.py) on the attached TPU and
writes a single JSON record — the role the reference's test_gpu.cu plays
(compiled-kernel goldens on real hardware, tests/test_gpu.cu:16-83), made
repeatable and recorded per round:

    python scripts/run_acceptance.py [--out ACCEPTANCE.json] [--cases 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ACCEPTANCE.json")
    ap.add_argument("--cases", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import fuzz_tpu
    import tpu_acceptance

    import json as _json
    import subprocess
    import tempfile

    t0 = time.time()
    # The multi-GB over-cap checks run LAST and in their own processes:
    # they need a clean device heap (usable HBM through the tunnel is
    # ~12-14 GB and the checks peak near 10), and one RESOURCE_EXHAUSTED
    # poisons every later allocation in the process that hit it.
    rc_acc = tpu_acceptance.main(["--skip", "split natural"])

    # The fuzz sweep ALSO runs in its own process: in round 5 a fuzz case
    # that passes standalone crashed the TPU worker when run in the same
    # process right after the boundary checks' near-10GB allocations —
    # heap-pressure-triggered worker faults must not poison (or lose) the
    # whole artifact.
    fuzz_error = None
    fuzz_script = Path(__file__).resolve().parent / "fuzz_tpu.py"
    with tempfile.NamedTemporaryFile(suffix=".json") as tmp:
        try:
            proc = subprocess.run(
                [sys.executable, "-u", str(fuzz_script),
                 "--cases", str(args.cases), "--seed", str(args.seed),
                 "--json-out", tmp.name], timeout=5400)
            rc_fuzz = proc.returncode
        except subprocess.TimeoutExpired:
            rc_fuzz = -9
        try:
            fuzz_rec = _json.loads(Path(tmp.name).read_text())
            if not fuzz_rec.get("ok", False):
                rc_fuzz = rc_fuzz or 1
                fuzz_error = fuzz_rec.get("failed_case")
        except Exception:  # noqa: BLE001 - subprocess died before dump
            rc_fuzz = rc_fuzz or 1
            fuzz_error = f"fuzz subprocess died (rc={rc_fuzz}) before json"

    script = Path(__file__).resolve().parent / "tpu_acceptance.py"
    for sub in ("split natural over-cap (8,850,299,512)",
                "split natural over-cap (8,850,299,1024)"):
        with tempfile.NamedTemporaryFile(suffix=".json") as tmp:
            proc = subprocess.run(
                [sys.executable, "-u", str(script), "--only", sub,
                 "--json-out", tmp.name], capture_output=True, text=True,
                timeout=3600)
            sys.stdout.write(proc.stdout)
            try:
                res = _json.loads(Path(tmp.name).read_text())["checks"]
            except Exception:  # noqa: BLE001 - subprocess died before dump
                res = [{"name": sub, "ok": False,
                        "error": f"subprocess rc={proc.returncode}: "
                                 f"{proc.stdout[-200:]}"}]
        tpu_acceptance.RESULTS.extend(res)
        for r in res:
            if not r["ok"]:
                tpu_acceptance.failures.append(r["name"])
                rc_acc = 1

    import jax

    from monotonic_rnnt_tpu.utils.provenance import provenance_stamp

    record = {
        "provenance": provenance_stamp(seed=args.seed),
        "device": str(jax.devices()[0]),
        "elapsed_s": round(time.time() - t0, 1),
        "acceptance": {
            "checks": tpu_acceptance.RESULTS,
            "n_failed": len(tpu_acceptance.failures),
        },
        "fuzz": {"cases": args.cases, "seed": args.seed,
                 "dimensions": fuzz_tpu.DIMENSIONS,
                 "ok": rc_fuzz == 0, "error": fuzz_error},
        "ok": rc_acc == 0 and rc_fuzz == 0,
    }
    Path(args.out).write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {args.out}: ok={record['ok']}")
    return 0 if record["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
