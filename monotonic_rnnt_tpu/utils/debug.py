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

from .config import config_override, get_config


_CALLBACKS_OK = None


def _callbacks_supported() -> bool:
    """Probe once whether the runtime executes host callbacks.

    jax.debug.print rides host send/recv callbacks, which some tunneled TPU
    runtimes do not implement; the debug flags then degrade to a one-time
    warning instead of crashing the training step.
    """
    global _CALLBACKS_OK
    if _CALLBACKS_OK is None:
        import jax

        try:
            # ensure_compile_time_eval escapes any active trace: the probe
            # must genuinely execute now, not be staged into the caller's
            # jaxpr (a staged probe "succeeds" without testing anything).
            with jax.ensure_compile_time_eval():
                out = jax.jit(lambda x: jax.debug.callback(
                    lambda *_: None, x) or x + 1)(0)
                jax.block_until_ready(out)
            _CALLBACKS_OK = True
        except Exception:
            _CALLBACKS_OK = False
            import warnings

            warnings.warn(
                "monotonic_rnnt_tpu: this runtime does not support host "
                "callbacks; debug_fwdbwd/debug_grads/check_fwd_bwd output "
                "is disabled")
    return _CALLBACKS_OK


def emit_loss_debug(ll_fwd, ll_bwd=None, grads=None) -> None:
    """Runtime debug hooks consumed by both loss backends (jit-safe).

    Driven by the config flags (the reference's DEBUG_FWDBWD / DEBUG_GRADS
    macros and its fwd/bwd consistency check, cpu_rnnt.h:256-259):
      debug_fwdbwd  — print per-sample forward/backward log-likelihoods;
      check_fwd_bwd — warn (only) when |ll_fwd - ll_bwd| > fwd_bwd_tol;
      debug_grads   — print gradient summary statistics.

    The flags are read at *trace* time: set them before the first call of a
    jitted loss (an already-compiled function won't notice a toggle until its
    cache is cleared, e.g. jax.clear_caches()).
    """
    cfg = get_config()
    wants_debug = ((ll_bwd is not None
                    and (cfg.debug_fwdbwd or cfg.check_fwd_bwd))
                   or (grads is not None and cfg.debug_grads))
    if not wants_debug:
        return

    import jax
    import jax.numpy as jnp

    if not _callbacks_supported():
        return
    if ll_bwd is not None and cfg.debug_fwdbwd:
        jax.debug.print("mrnnt fwdbwd: ll_fwd={f} ll_bwd={b}",
                        f=ll_fwd, b=ll_bwd)
    if ll_bwd is not None and cfg.check_fwd_bwd:
        diff = jnp.abs(ll_fwd - ll_bwd)
        bad = diff > cfg.fwd_bwd_tol

        def _warn(op):
            n, m = op
            jax.debug.print(
                "monotonic_rnnt: fwd/bwd mismatch on {n} samples "
                "(max |diff| = {m})", n=n, m=m)

        jax.lax.cond(jnp.any(bad), _warn, lambda op: None,
                     (jnp.sum(bad), jnp.max(diff)))
    if grads is not None and cfg.debug_grads:
        g = grads.astype(jnp.float32)
        jax.debug.print(
            "mrnnt grads: min={mn} max={mx} l2={l2}",
            mn=jnp.min(g), mx=jnp.max(g),
            l2=jnp.sqrt(jnp.sum(g * g)))


def report_space(pipeline: str, logits_shape, dtype, *, reads: int,
                 writes: int, vmem_bytes=None, tiles=None, file=None) -> None:
    """DEBUG_SPACE equivalent: one line per traced loss call.

    The reference prints its workspace allocation in MB behind DEBUG_SPACE
    (reference: cpu_workspace_manager.h:110-112,
    gpu_workspace_manager.h:249-251). Here the analogous decision is which
    Pallas pipeline a shape takes (DP-fused / split / banded / XLA
    reference), the predicted on-chip VMEM footprint of its kernels
    (kernels.fused_dp_vmem_bytes), and the big-tensor HBM traffic the
    orchestration is committed to (reads + writes of the [B, T, S1, V]
    tensor — the quantity every perf claim in DESIGN.md is budgeted in).
    All of it is shape-static, so the line prints host-side at TRACE time:
    exact, free on device, and independent of host-callback support (which
    the axon runtime lacks). Like the other debug_* flags, an
    already-compiled call won't re-print until its cache is cleared.
    """
    if not get_config().debug_space:
        return
    big_mb = int(np.prod(logits_shape)) * jnp.dtype(dtype).itemsize / 2**20
    parts = [
        f"mrnnt space: pipeline={pipeline}",
        f"shape={tuple(int(d) for d in logits_shape)}",
        f"dtype={jnp.dtype(dtype).name}",
        f"big_tensor={big_mb:.1f}MiB",
        f"hbm_traffic={(reads + writes) * big_mb:.1f}MiB"
        f" ({reads}r+{writes}w)",
    ]
    if tiles is not None:
        parts.append(f"tiles={tuple(tiles)}")
    if vmem_bytes is not None:
        parts.append(f"kernel_vmem={vmem_bytes / 2**20:.1f}MiB")
    print(" ".join(parts), file=file)


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
