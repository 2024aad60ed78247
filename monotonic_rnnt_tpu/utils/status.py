"""Input validation and error reporting.

TPU-native equivalent of the reference's status-code layer
(reference: include/status.h:4-31, cpu_workspace_manager.h:99-115): instead of
C enum return codes threaded through every call, invalid inputs raise a typed
Python exception eagerly (shape/dtype problems) and a traced helper clamps or
flags length constraints that can only be checked at runtime.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class Status(enum.Enum):
    """Parity enum with reference include/status.h:4-10."""

    SUCCESS = 0
    MEMOPS_FAILED = 1
    INVALID_VALUE = 2
    EXECUTION_FAILED = 3
    UNKNOWN_ERROR = 4


class RnntError(ValueError):
    """Raised for invalid monotonic RNN-T inputs."""

    def __init__(self, status: Status, message: str):
        super().__init__(f"[{status.name}] {message}")
        self.status = status


def validate_loss_inputs(logits, labels, input_lengths, label_lengths) -> None:
    """Eager (trace-time) shape/dtype validation of the padded-layout API.

    Enforces the reference's constraints (cpu_workspace_manager.h:99-115):
    B > 0 and, when lengths are concrete, T_b > 0, S_b >= 0, T_b >= S_b.
    """
    if logits.ndim != 4:
        raise RnntError(Status.INVALID_VALUE,
                        f"logits must be [B, T, S+1, V], got shape {logits.shape}")
    batch, t_max, s1, v = logits.shape
    if batch <= 0 or t_max <= 0 or s1 <= 0 or v <= 0:
        raise RnntError(Status.INVALID_VALUE,
                        f"all logits dims must be positive, got {logits.shape}")
    if labels.ndim != 2 or labels.shape[0] != batch:
        raise RnntError(Status.INVALID_VALUE,
                        f"labels must be [B, S_max], got {labels.shape}")
    if labels.shape[1] < s1 - 1:
        raise RnntError(Status.INVALID_VALUE,
                        f"labels second dim ({labels.shape[1]}) must be >= "
                        f"S_max ({s1 - 1})")
    for name, arr in (("input_lengths", input_lengths),
                      ("label_lengths", label_lengths)):
        if arr.shape != (batch,):
            raise RnntError(Status.INVALID_VALUE,
                            f"{name} must be [B]={batch}, got {arr.shape}")
        if not jnp.issubdtype(arr.dtype, jnp.integer):
            raise RnntError(Status.INVALID_VALUE,
                            f"{name} must be integer, got {arr.dtype}")

    # Concrete-value checks only when available (outside jit).
    try:
        ilen = np.asarray(input_lengths)
        slen = np.asarray(label_lengths)
    except Exception:  # traced values — checked structurally only
        return
    if np.any(ilen <= 0):
        raise RnntError(Status.INVALID_VALUE, "input_lengths must be >= 1")
    if np.any(slen < 0):
        raise RnntError(Status.INVALID_VALUE, "label_lengths must be >= 0")
    if np.any(ilen < slen):
        raise RnntError(Status.INVALID_VALUE,
                        "monotonic RNN-T requires T_b >= S_b for every sample")
    if np.any(ilen > t_max):
        raise RnntError(Status.INVALID_VALUE,
                        f"input_lengths exceed padded T_max={t_max}")
    if np.any(slen > s1 - 1):
        raise RnntError(Status.INVALID_VALUE,
                        f"label_lengths exceed padded S_max={s1 - 1}")
