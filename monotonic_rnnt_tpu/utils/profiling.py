"""Profiling and benchmarking utilities.

Replaces the reference's DEBUG_TIME chrono blocks (cpu_rnnt.h:43-88,
gpu_rnnt.h:41-50) with jax.profiler integration plus a timing method that
stays honest on asynchronous/tunneled TPU runtimes: K data-dependent
iterations inside one jit, so no iteration can be cached, reordered, or
overlapped away.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@contextmanager
def phase_timer(name: str, enabled: bool = True, file=None):
    """Wall-clock a phase (the DEBUG_TIME equivalent)."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if enabled:
        print(f"[mrnnt] {name}: {(time.perf_counter() - t0) * 1e3:.2f} ms",
              file=file)


@contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir (view with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dependent_loop_bench(
    step_fn: Callable,
    perturb_fn: Callable,
    feedback_fn: Callable,
    args: Tuple,
    iters: int = 30,
    trials: int = 3,
) -> Tuple[float, float]:
    """Time `step_fn` honestly on an async device.

    Runs `iters` iterations inside one jit; each iteration perturbs the first
    argument with the previous iteration's scalar feedback so the chain is
    data-dependent end to end:

        x_{i+1} = perturb_fn(x_i, feedback_fn(step_fn(x_i, *rest)))

    Returns (mean_seconds_per_iter over trials, variance). Matches the
    reference harness's 10-iteration mean+variance report
    (tests/test_time.cpp:31-59) but immune to dispatch caching.
    """

    def body(i, carry):
        x, acc = carry
        x = perturb_fn(x, acc)
        out = step_fn(x, *args[1:])
        return (x, feedback_fn(out))

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))[1]

    x0 = args[0]
    _ = float(run(x0))  # compile + warm
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = float(run(x0))
        times.append((time.perf_counter() - t0) / iters)
    return float(np.mean(times)), float(np.var(times))


def corrected_args_loop_bench(
    make_run: Callable,
    args: Tuple,
    iters: int,
    trials: int = 3,
) -> float:
    """Two-point dispatch-corrected seconds/iteration, operands as jit args.

    Variant of corrected_loop_bench for benchmarks whose operands (e.g.
    model params) are MB-sized: dependent_loop_bench closes over args[1:]
    as jit constants, which serialize through the tunnel (see CLAUDE.md);
    here `make_run(iters)` must return a jitted callable taking *args*
    explicitly, with a data-dependent chain of `iters` iterations inside.
    Requires iters >= 2 (the correction solves a two-point line).
    """
    if iters < 2:
        raise ValueError(f"iters must be >= 2 for the two-point "
                         f"correction, got {iters}")
    lo = max(1, iters // 4)

    def force(out):
        # jax.block_until_ready does NOT actually block through the axon
        # tunnel; transferring a couple of elements to the host does.
        leaf = jax.tree.leaves(out)[0]
        if leaf.ndim == 0:
            return np.asarray(leaf)
        return np.asarray(leaf[(0,) * (leaf.ndim - 1) + (slice(0, 2),)])

    def measure(fn, n):
        force(fn(*args))                          # compile + warm
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            force(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) / n

    t_hi = measure(make_run(iters), iters)
    t_lo = measure(make_run(lo), lo)
    return float((t_hi * iters - t_lo * lo) / (iters - lo))


def default_perturb(x, acc):
    """Cheap in-place data dependence: nudge one lane by an epsilon of acc."""
    return x.at[(0,) * (x.ndim - 1) + (slice(0, 1),)].add(
        (acc * 1e-20).astype(x.dtype))


def corrected_loop_bench(
    step_fn: Callable,
    perturb_fn: Callable,
    feedback_fn: Callable,
    args: Tuple,
    iters: int = 100,
    trials: int = 3,
) -> Tuple[float, float]:
    """dependent_loop_bench with the fixed per-dispatch cost removed.

    Tunneled runtimes (axon) add a large constant per *dispatch* (~30 ms
    measured) that dependent_loop_bench folds into every trial. Timing the
    same chain at iters and iters/4 and solving t(n) = overhead + n * per_iter
    separates the two. Returns (per_iter_seconds, dispatch_overhead_seconds);
    per_iter is the honest asymptotic throughput number.
    """
    lo = max(1, iters // 4)
    t_hi, _ = dependent_loop_bench(step_fn, perturb_fn, feedback_fn, args,
                                   iters=iters, trials=trials)
    t_lo, _ = dependent_loop_bench(step_fn, perturb_fn, feedback_fn, args,
                                   iters=lo, trials=trials)
    # t_hi/t_lo are per-iter means: total_n = overhead + n * per_iter.
    per_iter = (t_hi * iters - t_lo * lo) / (iters - lo)
    overhead = max(0.0, (t_lo - per_iter) * lo)
    return float(per_iter), float(overhead)
