"""Runtime configuration flags.

TPU-native replacement for the reference's two-tier config system
(reference: CMakeLists.txt:9-17 compile-time -D macros + include/options.h:12-24
runtime struct): everything is a runtime flag here — no recompiles — settable
via environment variables or programmatically. Debug instrumentation
(reference DEBUG_* printf macros, documented at returnn_tf_op.py:61-69) maps to
`debug_*` flags consumed by utils/debug.py.
"""

from __future__ import annotations

import dataclasses
import os
from contextlib import contextmanager


def _env_bool(name: str, default: bool) -> bool:
    val = os.environ.get(name)
    if val is None:
        return default
    return val.lower() not in ("0", "false", "off", "")


@dataclasses.dataclass
class Config:
    """Global runtime options (reference RNNTOptions equivalent, options.h:12-24).

    backend: 'auto' | 'pallas' | 'reference'. 'auto' selects the fused Pallas
      kernels on TPU and the pure-XLA reference path elsewhere.
    interpret: run Pallas kernels in interpreter mode (the reference's
      USE_NAIVE_KERNEL debugging fallback, gpu_rnnt.h:98-103).
    debug_time: wall-clock each eager (non-traced) loss call (reference
      DEBUG_TIME); under jit use utils.profiling.device_trace instead.
    debug_fwdbwd / debug_grads: per-call log-likelihood prints and gradient
      summaries via jax.debug.print (reference DEBUG_FWDBWD / DEBUG_GRADS).
    debug_space: one line per traced loss call reporting the chosen
      pipeline, predicted kernel VMEM footprint, and big-tensor HBM
      traffic (reference DEBUG_SPACE workspace reports,
      cpu_workspace_manager.h:110-112 / gpu_workspace_manager.h:249-251).
    check_fwd_bwd: warn when |ll_fwd - ll_bwd| > fwd_bwd_tol, the reference's
      only runtime self-check (cpu_rnnt.h:256-259).
    pipeline: 'auto' | 'fused' | 'split'. 'auto' picks the DP-fused
      orchestration whenever the shape fits its VMEM budget and the split
      (stats / fwdbwd scan / grad) pipeline otherwise; 'split' forces the
      fallback (the reference's USE_NAIVE_KERNEL selection role,
      gpu_rnnt.h:98-110, as a runtime flag); 'fused' asserts the shape
      fits and never silently falls back.
    """

    backend: str = os.environ.get("MRNNT_BACKEND", "auto")
    pipeline: str = os.environ.get("MRNNT_PIPELINE", "auto")
    interpret: bool = _env_bool("MRNNT_INTERPRET", False)
    debug_time: bool = _env_bool("MRNNT_DEBUG_TIME", False)
    debug_space: bool = _env_bool("MRNNT_DEBUG_SPACE", False)
    debug_fwdbwd: bool = _env_bool("MRNNT_DEBUG_FWDBWD", False)
    debug_grads: bool = _env_bool("MRNNT_DEBUG_GRADS", False)
    check_fwd_bwd: bool = _env_bool("MRNNT_CHECK_FWD_BWD", False)
    fwd_bwd_tol: float = float(os.environ.get("MRNNT_FWD_BWD_TOL", "0.1"))


_config = Config()


def get_config() -> Config:
    return _config


def update_config(**kwargs) -> Config:
    for key, value in kwargs.items():
        if not hasattr(_config, key):
            raise AttributeError(f"unknown config field: {key}")
        setattr(_config, key, value)
    return _config


@contextmanager
def config_override(**kwargs):
    """Temporarily override config fields (test / debug scoping)."""
    saved = {k: getattr(_config, k) for k in kwargs}
    update_config(**kwargs)
    try:
        yield _config
    finally:
        update_config(**saved)
