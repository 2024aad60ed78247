"""ctypes binding for the native CPU engine (native/mrnnt.cpp).

This is the framework's external-embedder surface — the counterpart of the
reference's C entry point `compute_rnnt_loss` (rnnt_entrypoint.h:24-25) that
toolkits like RASR link against — and an implementation-independent oracle
for the JAX/Pallas kernels in tests. The library is compiled on demand with
g++ (OpenMP when available) and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from .utils.status import RnntError, Status

# Sources ship inside the package (native_src/), so the on-demand build works
# from an installed wheel, not just a source checkout; the standalone CMake
# build (native/CMakeLists.txt) compiles the same files.
_NATIVE_DIR = Path(__file__).resolve().parent / "native_src"
_BUILD_DIR = _NATIVE_DIR / "build"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _compile() -> Path:
    src = _NATIVE_DIR / "mrnnt.cpp"
    hdr = _NATIVE_DIR / "mrnnt.h"
    out = _BUILD_DIR / "libmrnnt.so"
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    src_mtime = max(src.stat().st_mtime, hdr.stat().st_mtime)
    if out.exists() and out.stat().st_mtime >= src_mtime:
        return out
    # Build to a temp path and rename: concurrent importers (pytest workers,
    # two frameworks on one host) must never dlopen a half-written .so.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD_DIR)
    os.close(fd)
    base = ["g++", f"-I{_NATIVE_DIR}", "-std=c++17", "-O3", "-shared",
            "-fPIC", str(src), "-o", tmp]
    last = None
    for extra in (["-fopenmp", "-march=native"], ["-fopenmp"], []):
        try:
            subprocess.run(base[:7] + extra + base[7:], check=True,
                           capture_output=True)
            os.replace(tmp, out)
            return out
        except FileNotFoundError as exc:
            os.unlink(tmp)
            raise RnntError(Status.EXECUTION_FAILED,
                            "native build needs g++ on PATH") from exc
        except subprocess.CalledProcessError as exc:
            last = exc
    os.unlink(tmp)
    raise RnntError(Status.EXECUTION_FAILED,
                    f"native build failed: {last.stderr.decode()[-500:]}")


def load_library() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_compile()))
            lib.mrnnt_loss_packed.restype = ctypes.c_int
            lib.mrnnt_workspace_bytes.restype = ctypes.c_int
            lib.mrnnt_status_string.restype = ctypes.c_char_p
            _LIB = lib
    return _LIB


def _i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int32))


def rnnt_loss_native(
    acts: np.ndarray,
    labels: np.ndarray,
    input_lengths,
    label_lengths,
    blank_id: int = 0,
    num_threads: int = 0,
    alignment: Optional[np.ndarray] = None,
    max_distance_from_alignment: int = 0,
    with_grads: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Packed-layout loss via the native engine.

    acts: [sum_b T_b*(S_b+1), V] float32 (reference packed layout);
    labels: [B, S_max] int32. Returns (costs [B], grads like acts or None).
    """
    lib = load_library()
    acts = np.ascontiguousarray(np.asarray(acts, dtype=np.float32))
    labels = _i32(labels)
    ilen, slen = _i32(input_lengths), _i32(label_lengths)
    batch = len(ilen)

    # Validate sizes before handing raw pointers to C (the engine trusts
    # them; a mismatch would read/write out of bounds, not raise).
    if acts.ndim != 2:
        raise RnntError(Status.INVALID_VALUE,
                        f"acts must be packed 2-D [rows, V], got {acts.shape}")
    if len(slen) != batch:
        raise RnntError(Status.INVALID_VALUE,
                        "input_lengths and label_lengths disagree on batch")
    expect_rows = int((ilen.astype(np.int64) * (slen + 1)).sum())
    if acts.shape[0] != expect_rows:
        raise RnntError(Status.INVALID_VALUE,
                        f"packed acts have {acts.shape[0]} rows, lengths "
                        f"imply {expect_rows}")
    if labels.ndim != 2 or labels.shape[0] != batch or (
            batch and labels.shape[1] < int(slen.max())):
        raise RnntError(Status.INVALID_VALUE,
                        f"labels must be [B, >=max(S_b)], got {labels.shape}")
    v = acts.shape[-1]
    costs = np.zeros((batch,), np.float32)
    grads = np.zeros_like(acts) if with_grads else None

    if alignment is not None:
        alignment = _i32(alignment)
        if alignment.ndim != 2 or alignment.shape[0] != batch or (
                batch and alignment.shape[1] < int(ilen.max())):
            raise RnntError(Status.INVALID_VALUE,
                            f"alignment must be [B, >=max(T_b)], got "
                            f"{alignment.shape}")
        t_stride = alignment.shape[1]
        align_ptr = alignment.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        t_stride = 0
        align_ptr = None

    rc = lib.mrnnt_loss_packed(
        acts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(batch),
        ilen.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        slen.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int32(v),
        ctypes.c_int32(labels.shape[1] if labels.ndim == 2 else 0),
        ctypes.c_int32(blank_id),
        ctypes.c_int32(num_threads),
        align_ptr,
        ctypes.c_int32(t_stride),
        ctypes.c_int32(max_distance_from_alignment),
        costs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grads.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if grads is not None else None,
        None,
    )
    if rc != 0:
        msg = lib.mrnnt_status_string(rc).decode()
        raise RnntError(Status.INVALID_VALUE, f"native engine: {msg}")
    return costs, grads
