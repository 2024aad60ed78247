"""Streaming-copy kernels for HBM bandwidth calibration.

The roofline headline in bench.py divides the loss pipeline's time by the
time a pure 1-read + 1-write stream of the same footprint takes. That
denominator is only as honest as the stream kernel: a weak copy loop makes
the pipeline look closer to "speed of light" than it is. This module
provides the best-effort ceilings:

  * stream_copy(x, mode="vmem")  — grid-pipelined block copy through VMEM;
    Mosaic double-buffers the in/out DMAs across grid steps, so HBM reads of
    block i+1 overlap writes of block i. Block size is tunable
    (benchmarks/stream_bench.py sweeps it).
  * stream_copy(x, mode="dma")   — direct HBM->HBM DMA (no VMEM staging),
    issued as `nbuf` overlapping slab copies so multiple DMA engines run
    concurrently.

Both are exact copies, so a dependent chain x -> copy(x) -> copy(...) can be
timed inside one jit without caching artifacts. Inputs must be 2-D [R, C]
with C a multiple of 128 and R a multiple of the block rows (the calibration
harness owns the shape, so no padding path is needed here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def _dma_copy_kernel(x_ref, o_ref, *sems, nbuf, rows):
    slab = rows // nbuf
    copies = []
    for k in range(nbuf):
        sl = pl.dslice(k * slab, slab)
        copies.append(pltpu.make_async_copy(x_ref.at[sl], o_ref.at[sl],
                                            sems[k]))
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def stream_copy(x: jnp.ndarray, mode: str = "vmem", block_rows: int = 512,
                nbuf: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Copy a [R, C] array at best-effort HBM bandwidth (see module doc)."""
    rows, cols = x.shape
    if mode == "dma":
        if rows % nbuf:
            raise ValueError(f"rows {rows} not divisible by nbuf {nbuf}")
        return pl.pallas_call(
            functools.partial(_dma_copy_kernel, nbuf=nbuf, rows=rows),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA] * nbuf,
            interpret=interpret,
        )(x)
    if rows % block_rows:
        raise ValueError(f"rows {rows} not divisible by block {block_rows}")
    spec = pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _vmem_copy_kernel,
        grid=(rows // block_rows,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)


def stream_copy_blocked(x: jnp.ndarray, tt: int = 1,
                        interpret: bool = False) -> jnp.ndarray:
    """Copy a [B, T, S1, V] tensor with the DP-fused kernels' block shape.

    Grid (T/tt,), block [B, tt, S1, V]: each grid step's slice is B strided
    runs of tt*S1*V elements (stride = one sample's whole lattice) — the
    exact DMA descriptor structure stats_alpha_fused / beta_grad_fused
    stream, with zero compute. Timing this against the flat 2-D
    stream_copy isolates how much of the pipeline's distance from the
    stream ceiling is the blocked layout itself (per-sample-strided
    descriptors) rather than the kernels' compute. A [T, B, S1, V] input
    (tt leading) makes every grid step one contiguous run — the layout
    counter-experiment — via stream_copy_blocked_tbsv.
    """
    b, t, s1, v = x.shape
    if t % tt:
        raise ValueError(f"T {t} not divisible by tt {tt}")
    spec = pl.BlockSpec((b, tt, s1, v), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _vmem_copy_kernel,
        grid=(t // tt,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)


def stream_copy_blocked_tbsv(x: jnp.ndarray, tt: int = 1,
                             interpret: bool = False) -> jnp.ndarray:
    """Copy a [T, B, S1, V] tensor in [tt, B, S1, V] blocks (contiguous).

    Same block bytes per grid step as stream_copy_blocked on the [B, T,
    S1, V] layout, but the t-major layout makes each step's slice ONE
    contiguous HBM run — the control proving (or refuting) that the
    per-sample-strided descriptors are what caps the blocked stream.
    """
    t, b, s1, v = x.shape
    if t % tt:
        raise ValueError(f"T {t} not divisible by tt {tt}")
    spec = pl.BlockSpec((tt, b, s1, v), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _vmem_copy_kernel,
        grid=(t // tt,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x)
