"""Provenance stamps for generated evidence artifacts.

Every BENCH_*/ACCEPTANCE_*/TRAIN_*/SIZE_SWEEP_* JSON this repo emits embeds
a `provenance` record so a reader can distinguish a genuine re-run from a
copied file: wall-clock timestamp, the device it ran on, the jax version,
the repo git sha (+dirty flag), and the RNG seed that drove the run. This
is the evidentiary role of the reference's compiled-on-hardware golden
suite (reference: tests/test_gpu.cu:16-83) — the artifact itself must carry
enough context to be auditable.
"""

from __future__ import annotations

import datetime
import subprocess
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def _git(*args: str) -> str:
    try:
        return subprocess.run(
            ["git", *args], cwd=_REPO_ROOT, capture_output=True, text=True,
            timeout=10, check=True).stdout.strip()
    except Exception:
        return "unknown"


def provenance_stamp(seed=None, **extra) -> dict:
    """{timestamp, device, jax_version, git_sha, git_dirty, seed, ...extra}.

    Imports jax lazily so CPU-only tooling can stamp without touching the
    TPU tunnel; device reads the already-initialized backend (artifact
    writers call this after their run, so no extra device traffic).
    """
    import jax

    stamp = {
        "timestamp": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "device": str(jax.devices()[0]),
        "device_kind": jax.devices()[0].device_kind,
        "jax_version": jax.__version__,
        "git_sha": _git("rev-parse", "HEAD"),
        "git_dirty": bool(_git("status", "--porcelain")),
    }
    if seed is not None:
        stamp["seed"] = seed
    stamp.update(extra)
    return stamp
