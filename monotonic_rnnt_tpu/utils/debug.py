"""Debug instrumentation.

Runtime-flag equivalents of the reference's compile-time printf macros
(reference: DEBUG_TIME / DEBUG_FWDBWD / DEBUG_GRADS, documented at
returnn_tf_op.py:61-69 and CMakeLists.txt:9-17). Everything here is a runtime
switch — no recompiles:

  * interpret_mode(): run Pallas kernels on the interpreter (the reference's
    USE_NAIVE_KERNEL fallback, gpu_rnnt.h:98-103);
  * dump_lattice(): print alpha/beta tables for a sample the way the
    reference's DEBUG_FWDBWD blocks do (cpu_rnnt.h:169-178);
  * check_lattice(): fwd/bwd likelihood self-check (cpu_rnnt.h:256-259).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.numpy as jnp
import numpy as np

from .config import config_override


@contextmanager
def interpret_mode():
    """Force Pallas kernels onto the interpreter within the scope."""
    with config_override(interpret=True):
        yield


def _fmt_table(arr: np.ndarray) -> str:
    rows = []
    for s in range(arr.shape[1] - 1, -1, -1):
        rows.append("  ".join(f"{v:8.3f}" for v in arr[:, s]))
    return "\n".join(rows)


def dump_lattice(logits, labels, input_lengths, label_lengths, sample: int = 0,
                 blank_id: int = 0, file=None) -> str:
    """Compute and pretty-print alphas/betas/costs for one sample.

    Returns the formatted dump (and prints it unless file=False).
    """
    import jax
    from ..ops.bands import default_bands, lattice_masks
    from ..ops.reference import compute_stats, forward_backward

    t_max, s1 = logits.shape[1], logits.shape[2]

    @jax.jit
    def _run(logits, labels, ilen, slen):
        stats = compute_stats(logits, labels, slen, blank_id)
        bands = default_bands(ilen, slen, t_max)
        masks = lattice_masks(ilen, slen, bands, t_max, s1)
        return forward_backward(stats, masks, ilen, slen)

    alphas, betas, ll_fwd, ll_bwd = _run(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(input_lengths), jnp.asarray(label_lengths))
    b = sample
    t_b = int(np.asarray(input_lengths)[b])
    s_b = int(np.asarray(label_lengths)[b])
    out = [
        f"sample {b}: T={t_b} S={s_b} "
        f"ll_fwd={float(ll_fwd[b]):.4f} ll_bwd={float(ll_bwd[b]):.4f}",
        "alphas (s rows top-down, t columns):",
        _fmt_table(np.asarray(alphas)[b, :t_b, :s_b + 1]),
        "betas:",
        _fmt_table(np.asarray(betas)[b, :t_b, :s_b + 1]),
    ]
    text = "\n".join(out)
    if file is not False:
        print(text, file=file)
    return text


def check_lattice(ll_fwd, ll_bwd, tol: float = 0.1) -> np.ndarray:
    """Return boolean mask of samples whose fwd/bwd likelihoods disagree."""
    return np.abs(np.asarray(ll_fwd) - np.asarray(ll_bwd)) > tol
