"""Pallas TPU kernels for the monotonic RNN-T loss.

Three kernels implement the fused forward-backward + gradient pipeline. The
design keeps HBM traffic at its algorithmic minimum of two reads + one write
of the [B, T, S1, V] activation tensor (the reference CUDA pipeline does ~3
reads + 1 write: two softmax reduction passes over acts, reduce.h:173-185,
plus the gradient pass, gpu_rnnt_kernel.h:239-288):

  1. `softmax_stats`  — one read of logits; per-cell log-softmax denominator
     plus the blank/label log-probs the DP needs. Replaces the reference's
     two-kernel reduce_max/reduce_exp pipeline (include/reduce.h) with a
     single VMEM-resident reduction.
  2. `alpha_scan` / `beta_scan` — the wavefront DP. The reference parallelizes
     one CUDA thread per s with __syncthreads per t-step
     (gpu_rnnt_kernel.h:121-161); here the whole [BT, S1] row-front is a VPU
     vector op and the t-loop is a fori_loop with the carry in VMEM scratch,
     chunked over T so only O(BT * TT * S1) lives on-chip. Callers pad B and
     T so every block is full (see ops/pallas/fused.py).
  3. `grad_kernel` — one read of logits + one write of grads; recomputes
     p = exp(logit + denom) and combines the three per-cell occupancy
     coefficients (see ops/reference.py) with vectorized blank/label masks
     instead of the reference's per-cell thread-block gather
     (gpu_rnnt_kernel.h:239-288).

All DP math is float32 in log space with exact -inf boundary semantics.

Mosaic tiling notes: blocks whose trailing dims are (TT, S1) require TT % 8
== 0. The V axis stays whole when a TT=8 slab fits the VMEM budget (vocab
reductions then need no cross-block state); in the large-vocab regime it is
tiled and the stats kernel runs an online logsumexp across V-blocks (see
pick_tv_tiles). The tiny per-sample arrays (labels, lengths, virtual rows)
ride along as singleton-blocked [B, 1, S1]-style operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..helpers import NEG_INF, log_sum_exp

# ---------------------------------------------------------------------------
# Tiling heuristics
# ---------------------------------------------------------------------------

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024
# Mosaic's default scoped-vmem limit (16M) counts not just our blocks but the
# compiler's own vector temporaries, which for wide-S1 blocks can triple the
# footprint; raise the per-kernel limit (v5e/v5p have 128M physical VMEM) and
# keep our own block budget conservative instead.
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vma(*arrays):
    """Union of the operands' varying-mesh-axes sets.

    Inside shard_map (check_vma=True, the default) pallas_call out_shapes
    must declare how outputs vary across mesh axes; kernel outputs vary
    exactly as their operands do (everything here is batch-local).
    """
    out = frozenset()
    for a in arrays:
        out |= getattr(jax.typeof(a), "vma", None) or frozenset()
    return out


def _struct(shape, dtype, vma):
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def pick_tv_tiles(t_max: int, s1: int, v: int, n_bufs: int):
    """(TT, VT) for the V-carrying kernels under the VMEM budget.

    Prefers keeping the whole (128-padded) vocab axis in one block (the
    vocab reduction then needs no cross-block accumulator); when even a
    TT=8 slab of full-V rows exceeds the budget (large-vocab regime,
    e.g. V=5000 at S=20 — a reference test.py:164-170 shape), the V axis is
    tiled instead and the stats kernel switches to an online logsumexp
    accumulated across V-blocks. n_bufs counts V-sized VMEM blocks alive per
    program (x2 for Mosaic double-buffering).
    """
    s1r = round_up(s1, 8)
    vt = round_up(v, 128)
    per_row = 2 * n_bufs * s1r * 4          # bytes per (t, v-lane) row, dbuf
    tt = (_VMEM_BUDGET_BYTES // max(1, per_row * vt)) // 8 * 8
    if tt >= 8:
        return int(min(tt, round_up(t_max, 8), 64)), int(vt)
    # Tile V: largest multiple of 128 that fits with TT=8.
    vt = max(128, (_VMEM_BUDGET_BYTES // max(1, per_row * 8)) // 128 * 128)
    return 8, int(min(vt, round_up(v, 128)))


def dp_tiles(batch: int, t_max: int, s1: int):
    """(BT, B_pad, TT, T_pad) for the DP kernels.

    B_pad is a multiple of BT and T_pad a multiple of TT so that every block
    is full; BT is a multiple of 8 (Mosaic sublane constraint) unless the
    whole batch is smaller than 8.
    """
    if batch < 8:
        bt, b_pad = batch, batch
    else:
        bt = 8
        row_bytes = round_up(s1, 128) * 4
        # 4 [BT, TT, S1] buffers (x2 double-buffered) per program. The grid's
        # batch rows execute sequentially on a core, and every row pays the
        # full sequential T-loop — so WIDER batch tiles directly cut the
        # wavefront's serial step count. Budget ~24MB of the 64MB scoped
        # VMEM (see _VMEM_LIMIT), leaving room for compiler temporaries.
        while 8 * (bt * 2) * min(t_max, 128) * row_bytes \
                <= 3 * _VMEM_BUDGET_BYTES and bt < 64:
            bt *= 2
        bt = min(bt, round_up(batch, 8))   # never pad batch beyond one tile
        b_pad = round_up(batch, bt)
    tt = min(round_up(t_max, 8), 128)
    t_pad = round_up(t_max, tt)
    return bt, b_pad, tt, t_pad


def _resolve_scan_tiles(tiles, tiles_fn, batch, t_max, lanes):
    """Tile sizes for a DP scan over already-padded [batch, t_max, lanes].

    Orchestrators size the padding with dp_tiles/dp_tiles_banded on the
    UNPADDED shapes and must pass the same (BT, TT) here: recomputing from
    the padded shapes can legitimately pick different tiles (the VMEM-budget
    thresholds depend on the exact t), which would make the grid floor-divide
    and silently skip tail rows. Standalone callers may omit `tiles` only
    when the heuristic divides their shapes exactly.
    """
    if tiles is None:
        bt, _, tt, _ = tiles_fn(batch, t_max, lanes)
    else:
        bt, tt = tiles
    if batch % bt or t_max % tt:
        raise ValueError(
            f"scan input [{batch}, {t_max}, {lanes}] not divisible by tiles "
            f"(BT={bt}, TT={tt}); pad with the dp_tiles call that sized the "
            "padding and pass tiles=(BT, TT) explicitly")
    return bt, tt


def dp_tiles_banded(batch: int, t_max: int, w: int):
    """DP tiling for the packed band layout (narrow rows, long T).

    Same contract as dp_tiles, but the time tile grows toward the whole
    sequence while the 5 [BT, TT, W] buffers (x2 double-buffered) fit the
    VMEM budget: band rows are narrow (W ~ tens vs S hundreds), and the
    banded regime exists for LONG utterances, where per-grid-step pipeline
    overhead on a serial scan would otherwise dominate.
    """
    bt, b_pad, _, _ = dp_tiles(batch, t_max, w)
    row_bytes = round_up(w, 128) * 4
    budget_rows = 3 * _VMEM_BUDGET_BYTES // (10 * bt * row_bytes)
    tt = min(round_up(t_max, 8), max(128, budget_rows // 8 * 8))
    t_pad = round_up(t_max, tt)
    return bt, b_pad, tt, t_pad


def _label_operand(labels_ext, tt, s1):
    """(operand, BlockSpec) for the label ids of a V-carrying kernel.

    2-D [B, S1] labels (constant in t — the full-lattice layout) ride as a
    singleton-t [B, 1, S1] block so no T-sized operand is materialized;
    3-D [B, T, S1] labels (packed band layout, id varies with t) stream
    per-t blocks. Kernel bodies broadcast either block shape identically.
    """
    if labels_ext.ndim == 2:
        return labels_ext[:, None, :], pl.BlockSpec(
            (1, 1, s1), lambda b, j, jv: (b, 0, 0), memory_space=pltpu.VMEM)
    return labels_ext, pl.BlockSpec(
        (1, tt, s1), lambda b, j, jv: (b, j, 0), memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Kernel 1: fused log-softmax statistics
# ---------------------------------------------------------------------------


def _online_lse_step(x_ref, lab_ref, m_sc, se_sc, g_sc, *, blank_id,
                     v_total, vt):
    """One V-block step of the fused softmax statistics.

    Accumulates the online logsumexp (running max + rescaled sum-exp) and the
    blank/label raw-logit gathers into scratch across the innermost
    ('arbitrary') grid dimension; shared by the full-lattice and banded stats
    kernels, which differ only in what they emit on the final block. Returns
    (jv, nv, lab) for the caller's emission branch.
    """
    jv = pl.program_id(2)
    nv = pl.num_programs(2)
    x = x_ref[0].astype(jnp.float32)          # [TT, S1, VT]

    # Mask lanes past the true vocab size (the last V-block may overhang).
    v_global = jv * vt + jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    x = jnp.where(v_global < v_total, x, NEG_INF)

    m_blk = jnp.max(x, axis=-1)               # [TT, S1]
    lab = lab_ref[0]                           # [1 or TT, S1] label ids
    blank_hit = jnp.where(v_global == blank_id, x, 0.0)
    label_hit = jnp.where(v_global == lab[:, :, None], x, 0.0)
    g_blk = jnp.stack([jnp.sum(blank_hit, axis=-1),
                       jnp.sum(label_hit, axis=-1)])  # [2, TT, S1]

    @pl.when(jv == 0)
    def _():
        m_sc[...] = m_blk
        se_sc[...] = jnp.sum(jnp.exp(x - m_blk[..., None]), axis=-1)
        g_sc[...] = g_blk

    @pl.when(jv > 0)
    def _():
        m_old = m_sc[...]
        m_new = jnp.maximum(m_old, m_blk)
        se_sc[...] = (se_sc[...] * jnp.exp(m_old - m_new) +
                      jnp.sum(jnp.exp(x - m_new[..., None]), axis=-1))
        m_sc[...] = m_new
        g_sc[...] = g_sc[...] + g_blk

    return jv, nv, lab


def _stats_kernel(x_ref, lab_ref, denom_ref, lpb_ref, lpl_ref, m_sc, se_sc,
                  g_sc, *, blank_id, v_total, vt):
    """Fused softmax statistics (see _online_lse_step for the accumulation)."""
    jv, nv, _ = _online_lse_step(x_ref, lab_ref, m_sc, se_sc, g_sc,
                                 blank_id=blank_id, v_total=v_total, vt=vt)

    @pl.when(jv == nv - 1)
    def _():
        denom = -(m_sc[...] + jnp.log(se_sc[...]))
        denom_ref[0] = denom
        lpb_ref[0] = g_sc[0] + denom
        lpl_ref[0] = g_sc[1] + denom


def softmax_stats(logits: jnp.ndarray, labels_ext: jnp.ndarray, blank_id: int,
                  interpret: bool = False, tiles=None):
    """Fused denominator + blank/label log-prob extraction.

    Args:
      logits: [B, T, S1, V].
      labels_ext: [B, S1] int32 label ids per s-slot (-1 where s >= S_b; the
        caller masks lp_label to -inf on those slots). May also be [B, T, S1]
        when the label id per slot varies with t (packed band layout, where
        slot w maps to lattice row offset[t] + w — see ops/bands.py).
    Returns (denom, lp_blank, lp_label_raw), each [B, T, S1] f32.
    """
    batch, t_max, s1, v = logits.shape
    tt, vt = tiles or pick_tv_tiles(t_max, s1, v, n_bufs=1)
    if tiles is None and vt >= round_up(v, 128) and vt >= 512:
        # Measured on v5e at the headline shape (S1=51, V=1000): this
        # read-dominated kernel streams fastest with the smallest legal time
        # tile — 711 GB/s at TT=8 vs 674 at the budget pick of 16 (more,
        # smaller blocks pipeline the DMA better). Applies only to the
        # single-V-block large-slab regime the measurement covered.
        tt = 8
    labels_ext, lab_spec = _label_operand(labels_ext, tt, s1)
    grid = (batch, pl.cdiv(t_max, tt), pl.cdiv(v, vt))

    small = _struct((batch, t_max, s1), jnp.float32,
                    _vma(logits, labels_ext))
    small_spec = pl.BlockSpec((1, tt, s1), lambda b, j, jv: (b, j, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stats_kernel, blank_id=blank_id, v_total=v, vt=vt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, s1, vt), lambda b, j, jv: (b, j, 0, jv),
                         memory_space=pltpu.VMEM),
            lab_spec,
        ],
        out_specs=(small_spec, small_spec, small_spec),
        out_shape=(small, small, small),
        scratch_shapes=[pltpu.VMEM((tt, s1), jnp.float32),
                        pltpu.VMEM((tt, s1), jnp.float32),
                        pltpu.VMEM((2, tt, s1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(logits, labels_ext)


def _stats_banded_kernel(x_ref, lab_ref, ralo_ref, rahi_ref, rblo_ref,
                         rbhi_ref, *out_and_scratch, blank_id, v_total, vt,
                         with_beta):
    """Banded stats with the reachability masks folded into the outputs.

    Emits the DP kernels' exact operand streams — (denom, lpb+amask,
    lpl+shifted-amask[, lpb+bmask, lpl+bmask]) — so the orchestrator's XLA
    glue never materializes [B, T, W] masks. The alpha emit mask (the
    destination mask read at the source slot, see _alpha_band_kernel) is the
    alpha window shifted by one: bounds minus 1, no roll needed. Window
    bounds arrive per-(b, t) in packed slot coordinates
    (bands.band_relative_bounds).
    """
    if with_beta:
        denom_ref, lpba_ref, lpla_ref, lpbb_ref, lplb_ref = out_and_scratch[:5]
        m_sc, se_sc, g_sc = out_and_scratch[5:]
    else:
        denom_ref, lpba_ref, lpla_ref = out_and_scratch[:3]
        m_sc, se_sc, g_sc = out_and_scratch[3:]
    jv, nv, lab = _online_lse_step(x_ref, lab_ref, m_sc, se_sc, g_sc,
                                   blank_id=blank_id, v_total=v_total, vt=vt)

    @pl.when(jv == nv - 1)
    def _():
        denom = -(m_sc[...] + jnp.log(se_sc[...]))
        denom_ref[0] = denom
        lpb = g_sc[0] + denom
        lpl = jnp.where(lab >= 0, g_sc[1] + denom, NEG_INF)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, lpb.shape, 1)

        def madd(lo_ref, hi_ref, shift=0):
            lo = lo_ref[0][:, :1] - shift      # [TT, 1]
            hi = hi_ref[0][:, :1] - shift
            return jnp.where((w_iota >= lo) & (w_iota <= hi), 0.0, NEG_INF)

        lpba_ref[0] = lpb + madd(ralo_ref, rahi_ref)
        lpla_ref[0] = lpl + madd(ralo_ref, rahi_ref, shift=1)
        if with_beta:
            bm = madd(rblo_ref, rbhi_ref)
            lpbb_ref[0] = lpb + bm
            lplb_ref[0] = lpl + bm


def softmax_stats_banded(logits_band, lab_band, rel_bounds, blank_id: int,
                         with_beta: bool = True, interpret: bool = False,
                         tiles=None):
    """Banded stats + folded reachability masks in one read of the band.

    Args:
      logits_band: [B, T, W, V]; lab_band: [B, T, W] int32 (-1 sentinel).
      rel_bounds: (ra_lo, ra_hi, rb_lo, rb_hi) [B, T] int32 windows in slot
        coordinates (bands.band_relative_bounds).
    Returns (denom, lpb_amask, lpl_amask_shifted[, lpb_bmask, lpl_bmask]) —
    exactly the operand streams of the banded DP kernels.
    """
    batch, t_max, w, v = logits_band.shape
    tt, vt = tiles or pick_tv_tiles(t_max, w, v, n_bufs=1)
    grid = (batch, pl.cdiv(t_max, tt), pl.cdiv(v, vt))
    n_out = 5 if with_beta else 3

    small = _struct((batch, t_max, w), jnp.float32,
                    _vma(logits_band, lab_band, *rel_bounds))
    small_spec = pl.BlockSpec((1, tt, w), lambda b, j, jv: (b, j, 0),
                              memory_space=pltpu.VMEM)
    bound_spec = pl.BlockSpec((1, tt, 1), lambda b, j, jv: (b, j, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stats_banded_kernel, blank_id=blank_id, v_total=v,
                          vt=vt, with_beta=with_beta),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tt, w, vt), lambda b, j, jv: (b, j, 0, jv),
                         memory_space=pltpu.VMEM),
            small_spec,
            bound_spec, bound_spec, bound_spec, bound_spec,
        ],
        out_specs=(small_spec,) * n_out,
        out_shape=(small,) * n_out,
        scratch_shapes=[pltpu.VMEM((tt, w), jnp.float32),
                        pltpu.VMEM((tt, w), jnp.float32),
                        pltpu.VMEM((2, tt, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(logits_band, lab_band, *(b[:, :, None] for b in rel_bounds))


# ---------------------------------------------------------------------------
# Kernels 1b/3b: DP-fused big-tensor passes (zero exposed scan time)
# ---------------------------------------------------------------------------
#
# The serial alpha/beta walks cost ~0.6 ms of pure dependency latency at the
# headline shape even when lane-packed (kernel 2's fwdbwd_scan) — time the
# memory-bound stats/grad passes cannot hide when the DP runs as its own
# kernel. These variants run the DP *inside* the big-tensor passes: the
# whole batch rides one [B, tt, S1, vt] block per grid step, the softmax
# statistics accumulate online across V-blocks, and on each t-block's last
# V-block the kernel advances the recurrence tt rows. The DP compute then
# overlaps the next block's DMA, so the pipeline's wall time is exactly its
# HBM traffic: stats+alpha = 1 read, beta+grad = 1 read + 1 write. This is
# the role split of the reference's reduce + DP + grad kernel chain
# (reduce.h:173-185, gpu_rnnt_kernel.h:121-237, :239-288) collapsed into
# two passes.
#
# Reachability arrives as inclusive per-(b, t) windows (bands._window_bounds
# conjoined with t < T_b by the orchestrator) — the same single source the
# XLA oracle's masks are built from.


def fused_dp_vmem_bytes(batch: int, t_max: int, s1: int, vt: int,
                        tt: int = 1, itemsize: int = 4) -> int:
    """True VMEM footprint (bytes) of the worse DP-fused kernel at (TT, VT).

    Models Mosaic's tile padding exactly: the minor (lane) axis of every
    declared block pads to 128 and the second-minor to 8 (f32) / 16
    (bf16) — so the VMEM-resident [B, T, S1] arrays pad S1 to 128 (not
    8), and the [B, T, 1] bound streams of stats_alpha_fused pad their
    unit lane axis all the way to 128 (each as large as a resident
    array). Both kernels' full block lists are modeled; the max is
    returned. `itemsize` is the big tensor's (logits/grads) element size;
    tt > 1 (the multi-t-row bf16 blocks) also grows the per-row scratch
    to [B, tt, S1] with tt padding to a sublane of 8.
    """
    sub = 8 if itemsize >= 4 else 16
    s1_sub = round_up(s1, sub)         # S1 is second-minor in big blocks
    s1_lane = round_up(s1, 128)        # S1 is the lane axis everywhere else
    t_sub = round_up(round_up(t_max, tt), 8)
    big = batch * tt * s1_sub * vt * itemsize  # one [B, TT, S1, VT] buffer
    res = batch * t_sub * s1_lane * 4  # one resident [B, T, S1] array
    row = batch * 8 * s1_lane * 4      # one [B, 1, S1] block
    scal = batch * 8 * 128 * 4         # one [B, 1, 1] block
    # one [B, TT, S1] per-row scratch buffer (TT pads to a sublane of 8)
    scr = batch * round_up(tt, 8) * s1_lane * 4
    bound = batch * t_sub * 128 * 4    # one [B, T, 1] bound stream
    # beta_grad_fused: double-buffered big in + big out, 4 resident inputs
    # + betas output, 3 [B,1,1] operands, 2 [B,1,S1] operands, 4 scratch
    # (3 per-row coefficient buffers + the carry row).
    beta = 4 * big + 5 * res + 3 * scal + 2 * row + 3 * scr + row
    # stats_alpha_fused: double-buffered big in, 4 resident outputs, 2
    # bound streams, 1 label row, scratch m/se + the [2, B, TT, S1] g +
    # the carry row.
    stats = 2 * big + 4 * res + 2 * bound + row + 4 * scr + row
    return max(beta, stats)


# True-footprint cap for the DP-fused pair: 48MB of the 64MB scoped-VMEM
# limit (_VMEM_LIMIT), leaving >=16MB for Mosaic's vector temporaries. The
# headline shape (32,200,51,1000 @ VT=1024) sits at ~46.5MB real and
# compiles+runs at the HBM roofline on v5e; shapes past the cap shrink VT
# or fall back to the split pipeline. (An earlier check capped a
# mis-modeled "declared" figure at 40MB that under-counted lane padding by
# 6-12MB; the real high-water mark of the shapes it admitted is what this
# cap pins.)
_FUSED_DP_VMEM_CAP = 48 * 1024 * 1024
# The bf16 two-row regime declares more block VMEM (the [B, 2, S1, VT]
# bf16 block is ~15% bigger than f32's one-row block after sublane-16
# padding) but its in-kernel vector temporaries are per-ROW f32 slices —
# the same size as the f32 pipeline's. Budget it against a raised scoped
# limit (_FUSED_TT_VMEM_LIMIT, still < the 128MB physical VMEM on
# v5e/v5p), keeping >=24MB of temporary headroom; validated compiled on
# the real chip by scripts/tpu_acceptance.py's boundary checks.
_FUSED_DP_VMEM_CAP_TT2 = 56 * 1024 * 1024
_FUSED_TT_VMEM_LIMIT = 88 * 1024 * 1024


def _fused_vmem_limit(tt: int) -> int:
    return (_FUSED_TT_VMEM_LIMIT if tt > 1
            else _VMEM_LIMIT.vmem_limit_bytes)


def fused_dp_tiles(batch: int, t_max: int, s1: int, v: int,
                   dtype=jnp.float32):
    """(TT, VT) for the DP-fused kernels, or None when the shape won't fit.

    The whole batch rides one [B, TT, S1, VT] block per grid step (the DP
    advances all samples per step). For f32 the t-block is ONE row so each
    sample's slice is a large contiguous chunk (vt ~ V): time-tiled
    narrow-V blocks read 512-byte strided slivers and halve the effective
    HBM rate. For bf16 a TWO-row t-block has the same byte footprint as
    f32's one-row block and halves the per-grid-step fixed cost (grid
    bookkeeping + the serial DP row) that bf16's faster streams cannot
    hide — but only when the whole vocab still rides one block (TT=2 with
    a tiled V would reintroduce the strided-sliver reads), so TT=2 is
    picked exactly when the full-V block fits its cap. The small
    [B, T, S1] arrays ride whole, VMEM-resident (the (8, 128) block-shape
    rule forbids 1-row blocks of them anyway), so the shape must satisfy
    BOTH kernels' budgets (fused_dp_vmem_bytes); otherwise orchestrators
    fall back to the split pipeline, which tiles the batch. Failing the
    cap is visible only on the real chip (interpret mode has no VMEM), so
    the cap errs conservative and scripts/tpu_acceptance.py compiles
    near-boundary shapes every round.
    """
    itemsize = jnp.dtype(dtype).itemsize
    v128 = round_up(v, 128)
    if itemsize == 2 and t_max >= 2:
        if fused_dp_vmem_bytes(batch, t_max, s1, v128, tt=2,
                               itemsize=2) <= _FUSED_DP_VMEM_CAP_TT2:
            return 2, int(v128)
    # The one-row budget keeps the f32 terms as an upper bound regardless
    # of dtype (bf16 blocks are smaller), preserving the f32-validated
    # admission decisions exactly.
    row_bytes = batch * round_up(s1, 8) * 4
    vt = min(v128,
             max(128, _VMEM_BUDGET_BYTES // max(1, row_bytes) // 128 * 128))
    while vt >= 128 and fused_dp_vmem_bytes(batch, t_max, s1,
                                            vt) > _FUSED_DP_VMEM_CAP:
        vt -= 128
    if vt < 128:
        return None
    return 1, int(vt)


def _stats_alpha_kernel(x_ref, lab_ref, alo_ref, ahi_ref, denom_ref, lpb_ref,
                        lpl_ref, alphas_ref, m_sc, se_sc, g_sc, carry, *,
                        blank_id, v_total, vt, tt, t_total):
    """Fused softmax statistics + in-kernel alpha DP (one read of logits).

    Grid (T/TT, nV): each step streams the [B, TT, S1, VT] block (TT=1 for
    f32 — large contiguous chunks per sample; TT=2 for bf16, whose half-
    width rows keep the same block bytes while halving the per-step fixed
    cost), accumulates the online softmax stats across V-blocks per row,
    and on the last V-block writes the block's stats into the VMEM-
    resident [B, T, S1] outputs and advances the alpha recurrence TT
    steps. The DP compute overlaps the next block's DMA. All per-row work
    is a STATIC unroll over the TT rows — the vector temporaries stay
    per-row sized ([B, S1, VT] f32) regardless of TT.

    t_total: true T (the wrapper pads the small arrays to a TT multiple;
    overhang rows of the big block are DMA-undefined and masked here).
    """
    j = pl.program_id(0)
    jv = pl.program_id(1)
    nv = pl.num_programs(1)
    batch, s1 = x_ref.shape[0], x_ref.shape[2]
    lab = lab_ref[:, 0]                             # [B, S1]

    for r in range(tt):
        x = x_ref[:, r].astype(jnp.float32)         # [B, S1, VT]
        v_global = jv * vt + jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        valid = v_global < v_total
        if tt > 1:
            # Overhang rows (t >= T on the last t-block) read undefined
            # DMA padding; force them to -inf so no garbage reaches the
            # scratch accumulators.
            valid &= (j * tt + r) < t_total
        x = jnp.where(valid, x, NEG_INF)
        m_blk = jnp.max(x, axis=-1)                 # [B, S1]
        blank_hit = jnp.where(v_global == blank_id, x, 0.0)
        label_hit = jnp.where(v_global == lab[:, :, None], x, 0.0)
        g_blk = jnp.stack([jnp.sum(blank_hit, axis=-1),
                           jnp.sum(label_hit, axis=-1)], axis=1)  # [B, 2, S1]

        @pl.when(jv == 0)
        def _(x=x, m_blk=m_blk, g_blk=g_blk, r=r):
            m_sc[:, r] = m_blk
            se_sc[:, r] = jnp.sum(jnp.exp(x - m_blk[..., None]), axis=-1)
            g_sc[:, :, r] = g_blk

        @pl.when(jv > 0)
        def _(x=x, m_blk=m_blk, g_blk=g_blk, r=r):
            m_old = m_sc[:, r]
            m_new = jnp.maximum(m_old, m_blk)
            se_sc[:, r] = (se_sc[:, r] * jnp.exp(m_old - m_new) +
                           jnp.sum(jnp.exp(x - m_new[..., None]), axis=-1))
            m_sc[:, r] = m_new
            g_sc[:, :, r] = g_sc[:, :, r] + g_blk

    @pl.when((jv == 0) & (j == 0))
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (batch, s1), 1)
        carry[...] = jnp.where(lane == 0, 0.0, NEG_INF)

    @pl.when(jv == nv - 1)
    def _():
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (batch, s1), 1)
        prev = carry[...]
        for r in range(tt):
            t = j * tt + r
            denom = -(m_sc[:, r] + jnp.log(se_sc[:, r]))
            lpb = g_sc[:, 0, r] + denom
            lpl = jnp.where(lab >= 0, g_sc[:, 1, r] + denom, NEG_INF)
            denom_ref[:, t, :] = denom
            lpb_ref[:, t, :] = lpb
            lpl_ref[:, t, :] = lpl

            win = (s_iota >= alo_ref[:, t, :]) & (s_iota <= ahi_ref[:, t, :])
            no_emit = prev + lpb
            emit = _shift_up_s(prev + lpl)
            prev = jnp.where(win, log_sum_exp(no_emit, emit), NEG_INF)
            alphas_ref[:, t, :] = prev
        carry[...] = prev


def stats_alpha_fused(logits, labels_ext, a_lo, a_hi, blank_id: int,
                      interpret: bool = False, tiles=None):
    """One-read fused stats + alpha scan over the full lattice.

    a_lo / a_hi: [B, T] int32 inclusive alpha windows, already conjoined
    with t < T_b (set hi < lo on invalid rows). labels_ext: [B, S1].
    Returns (denom, lp_blank, lp_label_masked, alphas), each [B, T, S1] f32
    — lp_label arrives pre-masked to -inf where the label slot is invalid
    (unlike softmax_stats, whose caller masks).

    tiles: (TT, VT) from fused_dp_tiles. When TT > 1 the small T-indexed
    arrays are padded HERE to a TT multiple (empty windows on pad rows)
    and the outputs sliced back — the big logits tensor is never padded
    (the kernel masks the overhang rows of its edge block).
    """
    batch, t_max, s1, v = logits.shape
    tt, vt = tiles or fused_dp_tiles(batch, t_max, s1, v, logits.dtype)
    t_pad = round_up(t_max, tt)
    if t_pad != t_max:
        pad = ((0, 0), (0, t_pad - t_max))
        a_lo = jnp.pad(a_lo, pad)
        a_hi = jnp.pad(a_hi, pad, constant_values=-1)   # empty window
    grid = (t_pad // tt, pl.cdiv(v, vt))

    vma = _vma(logits, labels_ext, a_lo, a_hi)
    small = _struct((batch, t_pad, s1), jnp.float32, vma)
    resident = pl.BlockSpec((batch, t_pad, s1), lambda j, jv: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    bound_spec = pl.BlockSpec((batch, t_pad, 1), lambda j, jv: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stats_alpha_kernel, blank_id=blank_id, v_total=v,
                          vt=vt, tt=tt, t_total=t_max),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch, tt, s1, vt), lambda j, jv: (0, j, 0, jv),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, 1, s1), lambda j, jv: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            bound_spec, bound_spec,
        ],
        out_specs=(resident,) * 4,
        out_shape=(small,) * 4,
        scratch_shapes=[pltpu.VMEM((batch, tt, s1), jnp.float32),
                        pltpu.VMEM((batch, tt, s1), jnp.float32),
                        pltpu.VMEM((batch, 2, tt, s1), jnp.float32),
                        pltpu.VMEM((batch, s1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_fused_vmem_limit(tt)),
        interpret=interpret,
    )(logits, labels_ext[:, None, :], a_lo[:, :, None], a_hi[:, :, None])
    if t_pad != t_max:
        out = tuple(o[:, :t_max] for o in out)
    return out


def _beta_grad_kernel(x_ref, denom_ref, lpbb_ref, lplb_ref, aprev_ref,
                      ilen_ref, llb_ref, scale_ref, bvirt_ref, lab_ref,
                      grad_ref, betas_ref, carry, occ_sc, cb_sc, cl_sc, *,
                      blank_id, vt, tt, t_total):
    """In-kernel beta DP + occupancy coefficients + fused gradient.

    Grid (T/TT, nV) with t DESCENDING (reverse index maps) so the beta
    carry flows forward. On each block's first V-block the kernel advances
    beta TT steps (rows walked high-to-low inside the block) and
    materializes the rows' occupancy coefficients into [B, TT, S1]
    scratch; every V-block then assembles the gradient row by row: one
    read of logits + one write of grads, with the whole DP and coefficient
    math hidden behind the blocks' DMA. The small [B, T, S1] operand
    streams are VMEM-resident (fetched once, constant index maps), padded
    to the TT multiple by the wrapper (-inf stats on the pad rows keep the
    carry at its initial -inf until the first real row).
    """
    j = pl.program_id(0)
    jv = pl.program_id(1)
    batch, s1 = x_ref.shape[0], x_ref.shape[2]
    tb = pl.num_programs(0) - 1 - j                         # t-block index

    @pl.when(jv == 0)
    def _():
        @pl.when(j == 0)
        def _():
            carry[...] = jnp.full((batch, s1), NEG_INF, jnp.float32)

        nxt_carry = carry[...]
        llb = llb_ref[:, 0, :]                              # [B, 1]
        sc = scale_ref[:, 0, :]                             # [B, 1]
        for r in reversed(range(tt)):
            t = tb * tt + r
            use_virtual = (t + 1) >= ilen_ref[:, 0, :]      # [B, 1]
            nxt = jnp.where(use_virtual, bvirt_ref[:, 0, :], nxt_carry)
            no_emit = nxt + lpbb_ref[:, t, :]
            emit = _shift_down_s(nxt) + lplb_ref[:, t, :]
            new = log_sum_exp(no_emit, emit)
            betas_ref[:, t, :] = new
            # Occupancy coefficients, same op order as the XLA oracle
            # (exp(aprev + b - ll)) for bit-exact gradients; aprev arrives
            # pre-masked to -inf on invalid cells, so exp == 0 there. The
            # per-sample scale folds the cost cotangent into the
            # coefficients (deferred-gradient path) — 1.0 on the
            # forward-produced path.
            ap = aprev_ref[:, t, :]
            occ_sc[:, r] = sc * jnp.exp(ap + new - llb)
            cb_sc[:, r] = sc * jnp.exp(ap + nxt - llb)
            cl_sc[:, r] = sc * jnp.exp(ap + _shift_down_s(nxt) - llb)
            nxt_carry = new
        carry[...] = nxt_carry

    for r in range(tt):
        x = x_ref[:, r].astype(jnp.float32)                 # [B, S1, VT]
        if tt > 1:
            # Overhang rows read undefined DMA padding; force them to
            # -inf so p == 0 there (their writes are edge-masked anyway).
            x = jnp.where((tb * tt + r) < t_total, x, NEG_INF)
        p = jnp.exp(x + denom_ref[:, tb * tt + r, :][..., None])
        v_global = jv * vt + jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
        blank_mask = v_global == blank_id
        label_mask = v_global == lab_ref[:, 0][:, :, None]
        coef = (occ_sc[:, r][..., None]
                - jnp.where(blank_mask, cb_sc[:, r][..., None], 0.0)
                - jnp.where(label_mask, cl_sc[:, r][..., None], 0.0))
        grad_ref[:, r] = jnp.where(coef == 0.0, 0.0,
                                   p * coef).astype(grad_ref.dtype)


def beta_grad_fused(logits, denom, lpb_bmask, lpl_bmask, aprev_masked,
                    input_lengths, ll_bounded, beta_virtual, labels_ext,
                    blank_id: int, out_dtype=jnp.float32,
                    interpret: bool = False, tiles=None, grad_scale=None):
    """One-read-one-write fused beta scan + occupancy + gradient pass.

    lpb_bmask / lpl_bmask: stats with the beta window mask pre-folded.
    aprev_masked: [B, T, S1] f32 = alpha(t-1, s) where the cell is valid
    (t < T_b and ll finite), exactly -inf elsewhere — the occupancy
    coefficients become exp(aprev + beta - ll) with no masking left.
    input_lengths [B, 1, 1] int32; ll_bounded [B, 1, 1] f32 (ll, 0 where
    infeasible); beta_virtual [B, S1] f32; labels_ext [B, S1].
    grad_scale: optional [B, 1, 1] f32 per-sample gradient scale (the cost
    cotangent on the deferred-gradient path); None = 1.
    Returns (grads [B, T, S1, V] out_dtype, betas [B, T, S1] f32).
    """
    batch, t_max, s1, v = logits.shape
    tt, vt = tiles or fused_dp_tiles(batch, t_max, s1, v, logits.dtype)
    t_pad = round_up(t_max, tt)
    if t_pad != t_max:
        # Pad the small resident streams to the TT multiple (see the
        # kernel docstring); -inf stats keep the carry inert on pad rows,
        # -inf aprev zeroes their occupancy coefficients.
        pad = ((0, 0), (0, t_pad - t_max), (0, 0))
        denom = jnp.pad(denom, pad)
        lpb_bmask = jnp.pad(lpb_bmask, pad, constant_values=NEG_INF)
        lpl_bmask = jnp.pad(lpl_bmask, pad, constant_values=NEG_INF)
        aprev_masked = jnp.pad(aprev_masked, pad, constant_values=NEG_INF)
    grid = (t_pad // tt, pl.cdiv(v, vt))

    if grad_scale is None:
        grad_scale = jnp.ones((batch, 1, 1), jnp.float32)
    vma = _vma(logits, denom, lpb_bmask, lpl_bmask, aprev_masked,
               input_lengths, ll_bounded, grad_scale)
    big_spec = pl.BlockSpec(
        (batch, tt, s1, vt),
        lambda j, jv: (0, pl.num_programs(0) - 1 - j, 0, jv),
        memory_space=pltpu.VMEM)
    resident = pl.BlockSpec((batch, t_pad, s1), lambda j, jv: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    one_spec = lambda lanes: pl.BlockSpec((batch, 1, lanes),
                                          lambda j, jv: (0, 0, 0),
                                          memory_space=pltpu.VMEM)
    grads, betas = pl.pallas_call(
        functools.partial(_beta_grad_kernel, blank_id=blank_id, vt=vt,
                          tt=tt, t_total=t_max),
        grid=grid,
        in_specs=[big_spec, resident, resident, resident, resident,
                  one_spec(1), one_spec(1), one_spec(1), one_spec(s1),
                  one_spec(s1)],
        out_specs=(big_spec, resident),
        out_shape=(_struct((batch, t_max, s1, v), out_dtype, vma),
                   _struct((batch, t_pad, s1), jnp.float32, vma)),
        scratch_shapes=[pltpu.VMEM((batch, s1), jnp.float32),
                        pltpu.VMEM((batch, tt, s1), jnp.float32),
                        pltpu.VMEM((batch, tt, s1), jnp.float32),
                        pltpu.VMEM((batch, tt, s1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_fused_vmem_limit(tt)),
        interpret=interpret,
    )(logits, denom, lpb_bmask, lpl_bmask, aprev_masked, input_lengths,
      ll_bounded, grad_scale, beta_virtual[:, None, :],
      labels_ext[:, None, :])
    return grads, betas[:, :t_max]


def _stats_partial_kernel(x_ref, m_ref, se_ref, m_sc, se_sc, *, v_total,
                          vt):
    """Local (m, sum-exp) softmax statistics — the vocab-sharded TP variant.

    Emits pre-reduction stats so the caller can combine shards exactly:
      m_global = pmax(m);  se_global = psum(se * exp(m - m_global));
      denom = -(m_global + log se_global).
    One read of the local shard (the XLA formulation needs two: a max pass
    and a sum pass).
    """
    jv = pl.program_id(2)
    nv = pl.num_programs(2)
    x = x_ref[0].astype(jnp.float32)          # [TT, S1, VT]

    v_global = jv * vt + jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    x = jnp.where(v_global < v_total, x, NEG_INF)
    m_blk = jnp.max(x, axis=-1)

    @pl.when(jv == 0)
    def _():
        m_sc[...] = m_blk
        se_sc[...] = jnp.sum(jnp.exp(x - m_blk[..., None]), axis=-1)

    @pl.when(jv > 0)
    def _():
        m_old = m_sc[...]
        m_new = jnp.maximum(m_old, m_blk)
        se_sc[...] = (se_sc[...] * jnp.exp(m_old - m_new) +
                      jnp.sum(jnp.exp(x - m_new[..., None]), axis=-1))
        m_sc[...] = m_new

    @pl.when(jv == nv - 1)
    def _():
        m_ref[0] = m_sc[...]
        se_ref[0] = se_sc[...]


def softmax_stats_partial(logits: jnp.ndarray, interpret: bool = False,
                          tiles=None):
    """Per-cell (max, sum-exp) over the local vocab slice. [B,T,S1] f32 x2."""
    batch, t_max, s1, v = logits.shape
    tt, vt = tiles or pick_tv_tiles(t_max, s1, v, n_bufs=1)
    grid = (batch, pl.cdiv(t_max, tt), pl.cdiv(v, vt))
    small = _struct((batch, t_max, s1), jnp.float32, _vma(logits))
    small_spec = pl.BlockSpec((1, tt, s1), lambda b, j, jv: (b, j, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_stats_partial_kernel, v_total=v, vt=vt),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tt, s1, vt), lambda b, j, jv: (b, j, 0, jv),
                               memory_space=pltpu.VMEM)],
        out_specs=(small_spec, small_spec),
        out_shape=(small, small),
        scratch_shapes=[pltpu.VMEM((tt, s1), jnp.float32),
                        pltpu.VMEM((tt, s1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(logits)


# ---------------------------------------------------------------------------
# Kernel 2: alpha / beta wavefront scans
# ---------------------------------------------------------------------------


def _shift_up_s(row, fill=NEG_INF):
    """out[:, s] = row[:, s-1]; out[:, 0] = fill (lane roll + mask)."""
    rolled = pltpu.roll(row, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane == 0, fill, rolled)


def _shift_down_s(row, fill=NEG_INF):
    """out[:, s] = row[:, s+1]; out[:, -1] = fill."""
    s1 = row.shape[-1]
    rolled = pltpu.roll(row, s1 - 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    return jnp.where(lane == s1 - 1, fill, rolled)


def _alpha_kernel(lpb_ref, lpl_ref, amask_ref, alphas_ref, carry):
    j = pl.program_id(1)
    bt, tt, s1 = alphas_ref.shape

    @pl.when(j == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, s1), 1)
        carry[...] = jnp.where(lane == 0, 0.0, NEG_INF)

    def body(i, _):
        prev = carry[...]
        lpb = lpb_ref[:, i, :]
        lpl = lpl_ref[:, i, :]
        no_emit = prev + lpb
        emit = _shift_up_s(prev + lpl)
        new = log_sum_exp(no_emit, emit) + amask_ref[:, i, :]
        carry[...] = new
        alphas_ref[:, i, :] = new
        return 0

    jax.lax.fori_loop(0, tt, body, 0)


def _beta_kernel(lpb_ref, lpl_ref, bmask_ref, ilen_ref, bvirt_ref, betas_ref,
                 carry, *, tt):
    j = pl.program_id(1)
    bt, _, s1 = betas_ref.shape

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.full((bt, s1), NEG_INF, jnp.float32)

    # This grid step covers global rows [t0, t0 + tt); iterate t descending.
    t0 = (pl.num_programs(1) - 1 - j) * tt

    def body(i, _):
        ti = tt - 1 - i                        # local row, descending
        t = t0 + ti                            # global t
        use_virtual = t + 1 >= ilen_ref[:, :, 0]   # [BT, 1]
        nxt = jnp.where(use_virtual, bvirt_ref[:, 0, :], carry[...])
        lpb = lpb_ref[:, ti, :]
        lpl = lpl_ref[:, ti, :]
        no_emit = nxt + lpb
        emit = _shift_down_s(nxt) + lpl
        new = log_sum_exp(no_emit, emit) + bmask_ref[:, ti, :]
        carry[...] = new
        betas_ref[:, ti, :] = new
        return 0

    jax.lax.fori_loop(0, tt, body, 0)


def _dp_spec(bt, tt, s1, reverse_t):
    if reverse_t:
        idx = lambda b, j: (b, pl.num_programs(1) - 1 - j, 0)
    else:
        idx = lambda b, j: (b, j, 0)
    return pl.BlockSpec((bt, tt, s1), idx, memory_space=pltpu.VMEM)


def alpha_scan(lp_blank, lp_label, alpha_maskadd, interpret: bool = False,
               tiles=None):
    """Forward DP over the lattice; returns alphas [B, T, S1] (-inf off-band).

    B must be a multiple of the batch tile and T of the time tile (use
    dp_tiles + padding and pass tiles=(BT, TT); fused.py does this).
    """
    batch, t_max, s1 = lp_blank.shape
    bt, tt = _resolve_scan_tiles(tiles, dp_tiles, batch, t_max, s1)
    grid = (batch // bt, t_max // tt)
    spec = _dp_spec(bt, tt, s1, reverse_t=False)
    return pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=_struct((batch, t_max, s1), jnp.float32,
                          _vma(lp_blank, lp_label, alpha_maskadd)),
        scratch_shapes=[pltpu.VMEM((bt, s1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(lp_blank, lp_label, alpha_maskadd)


def beta_scan(lp_blank, lp_label, beta_maskadd, input_lengths, beta_virtual,
              interpret: bool = False, tiles=None):
    """Backward DP; returns betas [B, T, S1] (code convention beta(t, s)).

    input_lengths: [B, 1, 1] int32; beta_virtual: [B, S1] f32 rows equal to
    [s == S_b] in log space.
    """
    batch, t_max, s1 = lp_blank.shape
    bt, tt = _resolve_scan_tiles(tiles, dp_tiles, batch, t_max, s1)
    grid = (batch // bt, t_max // tt)
    spec = _dp_spec(bt, tt, s1, reverse_t=True)
    ilen_spec = pl.BlockSpec((bt, 1, 1), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    bvirt_spec = pl.BlockSpec((bt, 1, s1), lambda b, j: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_beta_kernel, tt=tt),
        grid=grid,
        in_specs=[spec, spec, spec, ilen_spec, bvirt_spec],
        out_specs=spec,
        out_shape=_struct((batch, t_max, s1), jnp.float32,
                          _vma(lp_blank, lp_label, beta_maskadd,
                               input_lengths)),
        scratch_shapes=[pltpu.VMEM((bt, s1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(lp_blank, lp_label, beta_maskadd, input_lengths, beta_virtual[:, None, :])


def _fwdbwd_kernel(str1_ref, str2_ref, ilen_ref, bvirt_ref, out_ref, carry,
                   *, tt, s1, unroll):
    """Bidirectional full-lattice DP on lane-packed chains.

    Port of _fwdbwd_band_kernel's carry packing to the unrestricted lattice
    (replacing the reference's two serial CUDA DP kernels,
    gpu_rnnt_kernel.h:121-237, with ONE walk): alpha occupies lanes [0, S1)
    and beta — t-reversed — lanes [S1, 2*S1) of one carry row, so every
    serial step advances both chains with one roll pair, one select, one
    LSE. The masks are pre-folded into the transition streams
    (LSE(a, b) + m == LSE(a + m, b + m)); the alpha emit term is folded at
    its destination slot, up(prev + lpl) + amask == up(prev) + (up(lpl) +
    amask), so str2's alpha half carries up(lpl) + amask. The beta
    virtual-boundary switch t+1 >= T_b is computed from the reversed row
    index against T_pad - T_b — no boolean stream needed. Unlike the banded
    kernel there is no window shift, so the transition lane offsets are
    static: alpha reads up(x), beta reads down(x).
    """
    j = pl.program_id(1)
    bt, _, w2 = out_ref.shape

    @pl.when(j == 0)
    def _():
        # alpha(-1, .) = [s == 0]; beta carry starts all -inf (the first
        # reversed row always takes the virtual boundary: t+1 >= T_b).
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, w2), 1)
        carry[...] = jnp.where(lane == 0, 0.0, NEG_INF)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w2), 1)
    half_left = lane < s1
    up_fill = (lane == 0) | (lane == s1)                   # roll +1 edges
    dn_fill = (lane == s1 - 1) | (lane == w2 - 1)          # roll -1 edges
    bvirt = bvirt_ref[:, 0, :]
    # Reversed row r is beta's global t = T_pad - 1 - r, so the boundary
    # condition t + 1 >= T_b becomes r <= T_pad - T_b.
    thr = pl.num_programs(1) * tt - ilen_ref[:, 0, :]      # [bt, 1]
    t0 = j * tt

    u = next(f for f in (unroll, 8, 4, 2, 1) if tt % f == 0)

    def step(k, base, row, x):
        str1_c, str2_c = row
        uv = (base + k) <= thr                             # [bt, 1]
        x1 = jnp.where(jnp.logical_and(~half_left, uv), bvirt, x)
        # pltpu.roll, NOT jnp.roll: Mosaic's lowering of jnp.roll crashes
        # the TPU compiler outright on multi-vreg rows (lanes > 128) — a
        # compiled-only failure invisible to interpret mode, found by the
        # on-chip over-cap acceptance check (w2 = 600). pltpu.roll takes a
        # non-negative shift, so roll(-1) is roll(w2 - 1).
        up_x = jnp.where(up_fill, NEG_INF, pltpu.roll(x1, 1, axis=1))
        dn_x = jnp.where(dn_fill, NEG_INF,
                         pltpu.roll(x1, x1.shape[-1] - 1, axis=1))
        ta = x1 + str1_c
        tb = jnp.where(half_left, up_x, dn_x) + str2_c
        return log_sum_exp(ta, tb)

    def body(iu, _):
        # One dslice per ROW: reading a u-row dynamic slice and indexing it
        # statically per k crashes the TPU compiler when rows span multiple
        # vregs (lanes > 128) — a compiled-only failure invisible to the
        # interpret suite, found by the on-chip over-cap acceptance check
        # (w2 = 600 at (8,850,300)). Per-row slices compile at every width.
        base = t0 + iu * u
        x = carry[...]
        for k in range(u):
            rsl = pl.dslice(iu * u + k, 1)
            row = (str1_ref[:, rsl, :][:, 0, :], str2_ref[:, rsl, :][:, 0, :])
            x = step(k, base, row, x)
            out_ref[:, rsl, :] = x[:, None, :]
        carry[...] = x
        return 0

    jax.lax.fori_loop(0, tt // u, body, 0)


def fwdbwd_scan(lp_blank, lp_label, alpha_maskadd, beta_maskadd,
                input_lengths, beta_virtual, interpret: bool = False,
                tiles=None, unroll: int = 4):
    """Fused full-lattice alpha+beta scans; returns (alphas, betas) [B, T, S1].

    Produces exactly alpha_scan's and beta_scan's outputs in ONE serial
    T-walk (see _fwdbwd_kernel). Operand contracts match those kernels:
    additive masks, input_lengths [B, 1, 1] int32, beta_virtual [B, S1] f32.
    B and T must be padded to full tiles sized with dp_tiles on 2*S1 lanes
    (ops/pallas/fused.py does this); pass the same tiles=(BT, TT).
    """
    batch, t_max, s1 = lp_blank.shape
    bt, tt = _resolve_scan_tiles(
        tiles, lambda b, t, lanes: dp_tiles(b, t, 2 * lanes), batch, t_max,
        s1)
    grid = (batch // bt, t_max // tt)

    flip = lambda x: jnp.flip(x, axis=1)
    cat = lambda a, b: jnp.concatenate([a, flip(b)], axis=-1)
    lpl_up = jnp.pad(lp_label[:, :, :-1], ((0, 0), (0, 0), (1, 0)),
                     constant_values=NEG_INF)
    str1 = cat(lp_blank + alpha_maskadd, lp_blank + beta_maskadd)
    str2 = cat(lpl_up + alpha_maskadd, lp_label + beta_maskadd)
    bvirt_packed = jnp.concatenate(
        [jnp.full_like(beta_virtual, NEG_INF), beta_virtual],
        axis=-1)[:, None, :]

    w2 = 2 * s1
    spec = _dp_spec(bt, tt, w2, reverse_t=False)
    ilen_spec = pl.BlockSpec((bt, 1, 1), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    bvirt_spec = pl.BlockSpec((bt, 1, w2), lambda b, j: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    out = _struct((batch, t_max, w2), jnp.float32,
                  _vma(lp_blank, lp_label, alpha_maskadd, beta_maskadd,
                       input_lengths))
    packed = pl.pallas_call(
        functools.partial(_fwdbwd_kernel, tt=tt, s1=s1, unroll=unroll),
        grid=grid,
        in_specs=[spec, spec, ilen_spec, bvirt_spec],
        out_specs=spec,
        out_shape=out,
        scratch_shapes=[pltpu.VMEM((bt, w2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(str1, str2, input_lengths, bvirt_packed)
    return packed[..., :s1], flip(packed[..., s1:])


# ---------------------------------------------------------------------------
# Kernel 2b: banded wavefront scans (packed [B, T, W] layout, ops/bands.py)
# ---------------------------------------------------------------------------
#
# Same recurrences as alpha/beta above, re-indexed to the packed band window:
# slot (t, w) is lattice cell (t, offset[t] + w), and neighbours at t+-1 are
# realigned by the per-(b, t) window shift d in {0, 1} — a pair of lane rolls
# plus a row select. Reachability masks arrive pre-folded into the transition
# scores (LSE(a, b) + m == LSE(a + m, b + m)), saving one operand stream.
# This is how the reference's band-clamped DP loops (gpu_rnnt_kernel.h:58-72)
# become branch-free vector code.


def _alpha_band_kernel(lpb_ref, lpl_ref, d_ref, alphas_ref, carry):
    j = pl.program_id(1)
    bt, tt, w = alphas_ref.shape

    @pl.when(j == 0)
    def _():
        # alpha(-1, .) = [s == 0]; the virtual row lives at offset 0 = slot 0.
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, w), 1)
        carry[...] = jnp.where(lane == 0, 0.0, NEG_INF)

    def body(i, _):
        prev = carry[...]
        shifted = d_ref[:, i, :] == 1              # [BT, 1]
        # Realign alpha(t-1) into the coordinates of t (rows sit at w + d[t]),
        # then the standard recurrence: emit enters s from s-1 consuming
        # lp_label(t, s-1); the caller pre-shifts the emit mask accordingly.
        aligned = jnp.where(shifted, _shift_down_s(prev), prev)
        no_emit = aligned + lpb_ref[:, i, :]
        emit = _shift_up_s(aligned + lpl_ref[:, i, :])
        new = log_sum_exp(no_emit, emit)
        carry[...] = new
        alphas_ref[:, i, :] = new
        return 0

    jax.lax.fori_loop(0, tt, body, 0)


def _fwdbwd_band_kernel(str1_ref, str2_ref, pred_ref, uv_ref, bvp_ref,
                        out_ref, carry, *, tt, w, unroll):
    """Bidirectional banded DP on lane-packed chains.

    The alpha and beta chains are independent serial recurrences whose wall
    time is pure dependency latency (the traffic is O(B*T*W) f32 — ~1 MB at
    the banded bench shape). Packing alpha into lanes [0, W) and beta into
    [W, 2W) of one carry row makes every per-step vector op serve both
    chains at once: one roll pair, one select cascade, one LSE. The beta
    operand rows arrive pre-reversed in t (see fwdbwd_scan_banded), so both
    chains walk the SAME ascending row index; every data-dependent choice
    (window shift d / d_next, the t+1 >= T_b virtual-boundary switch) is a
    precomputed operand stream, leaving zero scalar work in the chain.

    Per step, with x the packed carry (after the virtual fix x1):
      alpha half: LSE( sel(d, down(x1), x1) + lp_blank,
                       sel(d, mask0(x1), up(x1)) + up(lp_label) )
      beta half:  LSE( sel(dn, up(x1), x1) + lp_blank,
                       sel(dn, x1, down(x1)) + lp_label )
    which share the rolls and fold into two selects on [bt, 2W] rows. The
    identity up(aligned + lp_label) = up(aligned) + up(lp_label) moves the
    alpha emit shift onto the precomputed stream (str2), and
    up(down(x)) = mask-lane-0(x) removes the double roll.
    """
    j = pl.program_id(1)
    bt, _, w2 = out_ref.shape

    @pl.when(j == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, w2), 1)
        carry[...] = jnp.where(lane == 0, 0.0, NEG_INF)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w2), 1)
    half_left = lane < w
    up_fill = (lane == 0) | (lane == w)                    # roll +1 edges
    dn_fill = (lane == w - 1) | (lane == w2 - 1)           # roll -1 edges
    lane0 = lane == 0

    u = next(f for f in (unroll, 8, 4, 2, 1) if tt % f == 0)

    def step(row, x):
        str1_c, str2_c, pred_c, uv_c, bvp_c = row
        x1 = jnp.where(uv_c, bvp_c, x)
        # pltpu.roll for the same reason as _fwdbwd_kernel: jnp.roll
        # crashes the TPU compiler on multi-vreg rows (2W > 128 happens at
        # wide alignment bands).
        up_x = jnp.where(up_fill, NEG_INF, pltpu.roll(x1, 1, axis=1))
        dn_x = jnp.where(dn_fill, NEG_INF,
                         pltpu.roll(x1, x1.shape[-1] - 1, axis=1))
        p = pred_c
        v1 = jnp.where(half_left, dn_x, up_x)
        ta = jnp.where(p, v1, x1) + str1_c
        a2 = jnp.where(half_left & lane0, NEG_INF, x1)
        b2 = jnp.where(half_left, up_x, dn_x)
        tb = jnp.where(p, a2, b2) + str2_c
        return log_sum_exp(ta, tb)

    def body(iu, _):
        # One dslice per ROW (not one u-row slice indexed statically): the
        # u-row dynamic-slice read feeding static per-k indexing crashes
        # the TPU compiler when rows span multiple vregs (same failure
        # mode as _fwdbwd_kernel's; found by the on-chip over-cap check).
        x = carry[...]
        for k in range(u):
            rsl = pl.dslice(iu * u + k, 1)
            row = tuple(r[:, rsl, :][:, 0, :] for r in
                        (str1_ref, str2_ref, pred_ref, uv_ref, bvp_ref))
            x = step(row, x)
            out_ref[:, rsl, :] = x[:, None, :]
        carry[...] = x
        return 0

    jax.lax.fori_loop(0, tt // u, body, 0)


def fwdbwd_scan_banded(lpb_amask, lpl_amask, d, lpb_bmask, lpl_bmask, d_next,
                       input_lengths, beta_virtual, interpret: bool = False,
                       tiles=None, unroll: int = 4):
    """Fused banded alpha+beta scans; returns (alphas, betas) [B, T, W].

    Operand contracts match alpha_scan_banded and its mirrored beta
    formulation (masks
    pre-folded; the alpha emit mask pre-shifted onto the source slot). The
    kernel runs both chains lane-packed in one [bt, 2W] carry (see
    _fwdbwd_band_kernel); this wrapper builds the packed operand streams —
    beta streams reversed in t so both chains share an ascending row walk,
    the alpha emit values pre-shifted, and the d / d_next / virtual-boundary
    decisions expanded to boolean lanes.
    """
    batch, t_max, w = lpb_amask.shape
    bt, tt = _resolve_scan_tiles(tiles, dp_tiles_banded, batch, t_max, w)
    grid = (batch // bt, t_max // tt)

    flip = lambda x: jnp.flip(x, axis=1)
    cat = lambda a, b: jnp.concatenate([a, flip(b)], axis=-1)
    lpla_up = jnp.pad(lpl_amask[:, :, :-1], ((0, 0), (0, 0), (1, 0)),
                      constant_values=NEG_INF)
    str1 = cat(lpb_amask, lpb_bmask)
    str2 = cat(lpla_up, lpl_bmask)
    bc = lambda p: jnp.broadcast_to(p, (batch, t_max, w))
    pred = cat(bc(d == 1), bc(d_next == 1))
    t_idx = jnp.arange(t_max, dtype=jnp.int32)[None, :, None]
    uv = cat(jnp.zeros((batch, t_max, w), bool),
             bc(t_idx + 1 >= input_lengths))
    bvp = cat(jnp.full((batch, t_max, w), NEG_INF, jnp.float32),
              beta_virtual)

    w2 = 2 * w
    spec = _dp_spec(bt, tt, w2, reverse_t=False)
    out = _struct((batch, t_max, w2), jnp.float32,
                  _vma(lpb_amask, lpl_amask, d, lpb_bmask, lpl_bmask,
                       d_next, input_lengths))
    packed = pl.pallas_call(
        functools.partial(_fwdbwd_band_kernel, tt=tt, w=w, unroll=unroll),
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=out,
        scratch_shapes=[pltpu.VMEM((bt, w2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(str1, str2, pred, uv, bvp)
    return packed[..., :w], flip(packed[..., w:])


def alpha_scan_banded(lpb_masked, lpl_masked, d, interpret: bool = False,
                      tiles=None):
    """Banded forward DP; transition scores carry the folded alpha mask.

    lpb_masked / lpl_masked: [B, T, W] f32; d: [B, T, 1] int32 window shifts.
    B and T must already be padded to full tiles (ops/pallas/banded.py).
    """
    batch, t_max, w = lpb_masked.shape
    bt, tt = _resolve_scan_tiles(tiles, dp_tiles_banded, batch, t_max, w)
    grid = (batch // bt, t_max // tt)
    spec = _dp_spec(bt, tt, w, reverse_t=False)
    d_spec = pl.BlockSpec((bt, tt, 1), lambda b, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _alpha_band_kernel,
        grid=grid,
        in_specs=[spec, spec, d_spec],
        out_specs=spec,
        out_shape=_struct((batch, t_max, w), jnp.float32,
                          _vma(lpb_masked, lpl_masked, d)),
        scratch_shapes=[pltpu.VMEM((bt, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(lpb_masked, lpl_masked, d)


# ---------------------------------------------------------------------------
# Kernel 3: fused gradient
# ---------------------------------------------------------------------------


def _grad_kernel(x_ref, denom_ref, occ_ref, cb_ref, cl_ref, lab_ref, grad_ref,
                 *, blank_id, vt):
    jv = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)          # [TT, S1, VT]
    p = jnp.exp(x + denom_ref[0][..., None])

    v_global = jv * vt + jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    blank_mask = v_global == blank_id
    label_mask = v_global == lab_ref[0][:, :, None]

    coef = (occ_ref[0][..., None]
            - jnp.where(blank_mask, cb_ref[0][..., None], 0.0)
            - jnp.where(label_mask, cl_ref[0][..., None], 0.0))
    # Out-of-lattice cells have coef == 0; guard against inf * 0 from padded
    # activations producing NaN.
    grad_ref[0] = jnp.where(coef == 0.0, 0.0, p * coef).astype(grad_ref.dtype)


def grad_pass(logits, denom, occ, cb, cl, labels_ext, blank_id: int,
              out_dtype=jnp.float32, interpret: bool = False, tiles=None):
    """Fused dL/dz: one read of logits, one write of grads.

    Elementwise in V given the per-cell coefficients, so the V axis tiles
    freely (large-vocab regime); overhanging lanes in the last V-block write
    garbage that the out_shape clips. labels_ext may be [B, S1] or [B, T, S1]
    (band layout; see softmax_stats).
    """
    batch, t_max, s1, v = logits.shape
    tt, vt = tiles or pick_tv_tiles(t_max, s1, v, n_bufs=2)
    if tiles is None and vt >= round_up(v, 128) and vt >= 512 and t_max >= 16:
        # Measured on v5e at the headline shape: this read+write kernel
        # plateaus at TT=16 (583 GB/s vs 571 at the budget pick of 8). The
        # doubled block (2 bufs x 2 double-buffered x [16, S1r, VT] f32,
        # ~15 MB at S1=51, V=1024) sits well under the 64 MB scoped-VMEM
        # limit; single-V-block large-slab regime only. Raise-only: narrow
        # layouts (e.g. the banded [B, T, W, V] path) already pick larger
        # tiles and keep them.
        tt = max(tt, 16)
    labels_ext, lab_spec = _label_operand(labels_ext, tt, s1)
    grid = (batch, pl.cdiv(t_max, tt), pl.cdiv(v, vt))
    big_spec = pl.BlockSpec((1, tt, s1, vt), lambda b, j, jv: (b, j, 0, jv),
                            memory_space=pltpu.VMEM)
    small_spec = pl.BlockSpec((1, tt, s1), lambda b, j, jv: (b, j, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_grad_kernel, blank_id=blank_id, vt=vt),
        grid=grid,
        in_specs=[big_spec, small_spec, small_spec, small_spec, small_spec,
                  lab_spec],
        out_specs=big_spec,
        out_shape=_struct((batch, t_max, s1, v), out_dtype,
                          _vma(logits, denom, occ)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT.vmem_limit_bytes),
        interpret=interpret,
    )(logits, denom, occ, cb, cl, labels_ext)
