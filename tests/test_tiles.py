"""Tiling-heuristic invariants over the reference size-sweep shapes.

pick_tv_tiles / dp_tiles / dp_tiles_banded are pure functions whose outputs
feed BlockSpecs; a bad pick surfaces only as a Mosaic OOM or shape error on
real hardware. These tests pin their contracts across every shape the
reference sweeps (tensorflow_binding/test.py:164-170) plus this framework's
own headline/banded shapes.
"""

import pytest

from monotonic_rnnt_tpu.ops.pallas.kernels import (_FUSED_DP_VMEM_CAP,
                                                   _FUSED_DP_VMEM_CAP_TT2,
                                                   _VMEM_BUDGET_BYTES,
                                                   dp_tiles, dp_tiles_banded,
                                                   fused_dp_tiles,
                                                   fused_dp_vmem_bytes,
                                                   pick_tv_tiles, round_up)

# (B, T, S, V): reference TF sweep + headline bench + banded long + infnan.
SHAPES = [
    (1, 150, 20, 50),
    (1, 150, 20, 5000),
    (16, 150, 20, 50),
    (16, 150, 20, 5000),
    (2, 391, 300, 79),
    (32, 200, 50, 1000),
    (2, 1600, 200, 1024),
    (4, 50, 10, 15),
    (1, 1, 0, 2),          # degenerate minimum
]


@pytest.mark.parametrize("batch,t,s,v", SHAPES)
@pytest.mark.parametrize("n_bufs", [1, 2])
def test_tv_tiles_invariants(batch, t, s, v, n_bufs):
    s1 = s + 1
    tt, vt = pick_tv_tiles(t, s1, v, n_bufs)
    # Mosaic constraints: sublane multiple on TT, lane multiple on VT.
    assert tt >= 8 and tt % 8 == 0
    assert vt >= 128 and vt % 128 == 0
    assert vt <= round_up(v, 128)
    # The (1, TT, S1, VT) f32 blocks (double-buffered, n_bufs live) must fit
    # the budget — except the documented VT=128 floor for extreme S1.
    block_bytes = 2 * n_bufs * tt * round_up(s1, 8) * vt * 4
    assert block_bytes <= _VMEM_BUDGET_BYTES or vt == 128, (tt, vt)


@pytest.mark.parametrize("batch,t,s,v", SHAPES)
def test_dp_tiles_invariants(batch, t, s, v):
    s1 = s + 1
    bt, b_pad, tt, t_pad = dp_tiles(batch, t, s1)
    assert bt >= 1 and (bt % 8 == 0 or bt == batch < 8)
    assert b_pad % bt == 0 and b_pad >= batch
    assert tt % 8 == 0 and t_pad % tt == 0 and t_pad >= t
    # never pad batch beyond one extra tile
    assert b_pad < batch + bt + 8
    # 4 double-buffered [BT, TT, S1] f32 buffers within budget (x3 headroom
    # documented in dp_tiles)
    assert 2 * 4 * bt * tt * round_up(s1, 128) * 4 <= 3 * _VMEM_BUDGET_BYTES


@pytest.mark.parametrize("batch,t,s,v", SHAPES + [
    (8, 500, 199, 10000),   # boundary class: big resident + big V
    (4, 800, 199, 2048),    # on-chip acceptance boundary shape
    (8, 850, 299, 8),       # must be rejected (split-pipeline fallback)
])
def test_fused_dp_tiles_vmem_budget(batch, t, s, v):
    # The TRUE Mosaic-padded footprint of the worse DP-fused kernel (lane
    # axes pad to 128, sublane to 8 — so [B,T,S1] residents pad S1 to 128
    # and the [B,T,1] bound streams pad to 128 lanes) must stay under the
    # cap, leaving the rest of the 64MB scoped-VMEM limit as Mosaic
    # temporary headroom. Over-cap compiles fail only on the real chip —
    # scripts/tpu_acceptance.py compiles the boundary shape each round.
    s1 = s + 1
    tiles = fused_dp_tiles(batch, t, s1, v)
    if tiles is None:
        return
    tt, vt = tiles
    assert tt == 1 and vt >= 128 and vt % 128 == 0
    assert vt <= round_up(v, 128)
    real = fused_dp_vmem_bytes(batch, t, s1, vt)
    assert real <= _FUSED_DP_VMEM_CAP, (tt, vt, real)


@pytest.mark.parametrize("batch,t,s,v", SHAPES + [
    (8, 500, 199, 10000),
    (4, 800, 199, 2048),
])
def test_fused_dp_tiles_bf16_two_row(batch, t, s, v):
    # bf16 picks TT=2 exactly when the full-V two-row block fits its cap
    # (the whole point: same block bytes as f32's one-row block, half the
    # per-grid-step fixed cost); otherwise it must fall back to the f32
    # one-row decision unchanged.
    import jax.numpy as jnp
    s1 = s + 1
    tiles16 = fused_dp_tiles(batch, t, s1, v, jnp.bfloat16)
    tiles32 = fused_dp_tiles(batch, t, s1, v)
    if tiles16 is None:
        assert tiles32 is None
        return
    tt, vt = tiles16
    assert vt % 128 == 0 and vt <= round_up(v, 128)
    if tt == 2:
        assert vt == round_up(v, 128)  # TT=2 only with the whole vocab
        assert t >= 2
        real = fused_dp_vmem_bytes(batch, t, s1, vt, tt=2, itemsize=2)
        assert real <= _FUSED_DP_VMEM_CAP_TT2, (vt, real)
    else:
        assert tiles16 == tiles32      # fallback preserves f32 decisions
    # the headline bench shape must land in the two-row regime
    if (batch, t, s, v) == (32, 200, 50, 1000):
        assert tt == 2


@pytest.mark.parametrize("batch,t,w", [
    (2, 1600, 16), (2, 1600, 48), (8, 4000, 8), (32, 200, 24), (1, 1, 2),
])
def test_dp_tiles_banded_invariants(batch, t, w):
    bt, b_pad, tt, t_pad = dp_tiles_banded(batch, t, w)
    assert bt >= 1 and (bt % 8 == 0 or bt == batch < 8)
    assert b_pad % bt == 0 and b_pad >= batch
    assert tt % 8 == 0 and t_pad % tt == 0 and t_pad >= t
    # 5 double-buffered [BT, TT, W] f32 buffers within budget
    assert 2 * 5 * bt * tt * round_up(w, 128) * 4 <= 3 * _VMEM_BUDGET_BYTES
    # the whole point: long-T banded scans should not fragment into many
    # grid steps when VMEM allows one block
    if batch <= 8 and w <= 16 and t <= 2048:
        assert t_pad == tt
