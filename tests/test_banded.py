"""Band-pruned (packed-layout) loss: parity with the full-lattice oracle.

The packed [B, T, W, V] path is the TPU counterpart of the reference's
band-pruned storage/kernels (cpu_workspace_manager.h:286-297,
gpu_rnnt_kernel.h:58-72): same costs and gradients as the full lattice with
the same bands, at W/(S+1) of the traffic.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monotonic_rnnt_tpu.ops.banded import (monotonic_rnnt_loss_banded,
                                           rnnt_loss_banded_reference)
from monotonic_rnnt_tpu.ops.bands import (band_layout_is_exact,
                                          bands_from_alignment,
                                          clip_bands_to_width,
                                          compute_band_layout, default_bands,
                                          pack_band, required_band_width,
                                          unpack_band)
from monotonic_rnnt_tpu.ops.pallas.banded import rnnt_loss_banded_pallas
from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference

import golden

banded_ref = jax.jit(rnnt_loss_banded_reference,
                     static_argnames=("blank_id", "with_grads"))
banded_pal = jax.jit(rnnt_loss_banded_pallas,
                     static_argnames=("blank_id", "with_grads", "interpret"))
full_ref = jax.jit(rnnt_loss_reference,
                   static_argnames=("blank_id", "with_grads"))


def _random_alignment(rng, batch, t, ilen, slen, v):
    """Random monotonic alignment: S_b labels at distinct frames < T_b."""
    align = np.zeros((batch, t), np.int32)
    for b in range(batch):
        pos = np.sort(rng.choice(ilen[b], size=slen[b], replace=False))
        align[b, pos] = rng.randint(1, v, size=slen[b])
    return align


def _banded_case(seed, batch, t, s, v, shift):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(batch, t, s + 1, v).astype(np.float32) * 2)
    labels = jnp.asarray(rng.randint(1, v, size=(batch, s)).astype(np.int32))
    ilen = rng.randint(max(s, 1), t + 1, size=(batch,)).astype(np.int32)
    slen = rng.randint(0, np.minimum(s, ilen) + 1, size=(batch,)).astype(
        np.int32)
    align = _random_alignment(rng, batch, t, ilen, slen, v)
    ilen, slen = jnp.asarray(ilen), jnp.asarray(slen)
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, shift, 0)
    return logits, labels, ilen, slen, bands


@pytest.mark.parametrize("seed,batch,t,s,v,shift", [
    (0, 3, 24, 8, 21, 2),
    (1, 2, 40, 12, 33, 0),    # exact-path restriction
    (2, 5, 17, 5, 130, 3),    # V > one lane tile
])
def test_banded_reference_matches_full_oracle(seed, batch, t, s, v, shift):
    logits, labels, ilen, slen, bands = _banded_case(seed, batch, t, s, v,
                                                     shift)
    s1 = s + 1
    w = int(required_band_width(ilen, slen, bands, t, s1))
    assert np.asarray(band_layout_is_exact(ilen, slen, bands, t, s1, w)).all()
    layout = compute_band_layout(ilen, slen, bands, t, s1, w)
    logits_band = pack_band(logits, layout)

    c_full, g_full = full_ref(logits, labels, ilen, slen, bands=bands)
    c_band, g_band = banded_ref(logits_band, labels, ilen, slen, bands)
    np.testing.assert_allclose(np.asarray(c_band), np.asarray(c_full),
                               rtol=1e-5, atol=1e-5)
    g_scat = unpack_band(g_band, layout, s1)
    np.testing.assert_allclose(np.asarray(g_scat), np.asarray(g_full),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed,batch,t,s,v,shift", [
    (0, 3, 24, 8, 21, 2),
    (3, 9, 25, 7, 33, 1),     # odd batch (padding path)
    (2, 5, 17, 5, 130, 3),    # multi-V-block stats/grad
])
def test_banded_pallas_matches_banded_reference(seed, batch, t, s, v, shift):
    logits, labels, ilen, slen, bands = _banded_case(seed, batch, t, s, v,
                                                     shift)
    s1 = s + 1
    w = int(required_band_width(ilen, slen, bands, t, s1))
    layout = compute_band_layout(ilen, slen, bands, t, s1, w)
    logits_band = pack_band(logits, layout)

    c_ref, g_ref = banded_ref(logits_band, labels, ilen, slen, bands)
    c_pal, g_pal = banded_pal(logits_band, labels, ilen, slen, bands,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_banded_golden_alignment_losses():
    """Reference test_cpu.cpp:405-433/532-545 constants on the packed path."""
    logits, labels, ilen, slen = golden.readme_batch()
    args = (jnp.asarray(labels), jnp.asarray(ilen), jnp.asarray(slen))
    for align, losses in ((golden.ALIGN_A, golden.ALIGN_A_LOSSES),
                          (golden.ALIGN_B, golden.ALIGN_B_LOSSES)):
        for shift, expected in losses.items():
            bands = bands_from_alignment(jnp.asarray(align[None]), args[1],
                                         args[2], shift, 0)
            w = int(required_band_width(args[1], args[2], bands, 4, 3))
            layout = compute_band_layout(args[1], args[2], bands, 4, 3, w)
            lb = pack_band(jnp.asarray(logits), layout)
            c_ref, _ = banded_ref(lb, *args, bands)
            c_pal, _ = banded_pal(lb, *args, bands, interpret=True)
            np.testing.assert_allclose(np.asarray(c_ref), [expected],
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(c_pal), [expected],
                                       rtol=1e-4, atol=1e-4)


def test_banded_width_clipping_semantics():
    """A too-narrow W computes the loss of clip_bands_to_width(bands)."""
    logits, labels, ilen, slen, bands = _banded_case(7, 2, 30, 10, 15, 4)
    s1 = 11
    w_req = int(required_band_width(ilen, slen, bands, 30, s1))
    w = max(2, w_req - 2)
    assert not np.asarray(
        band_layout_is_exact(ilen, slen, bands, 30, s1, w)).all()
    layout = compute_band_layout(ilen, slen, bands, 30, s1, w)
    logits_band = pack_band(logits, layout)
    c_band, g_band = banded_ref(logits_band, labels, ilen, slen, bands)
    clipped = clip_bands_to_width(bands, layout)
    c_full, g_full = full_ref(logits, labels, ilen, slen, bands=clipped)
    np.testing.assert_allclose(np.asarray(c_band), np.asarray(c_full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(unpack_band(g_band, layout, s1)),
                               np.asarray(g_full), rtol=1e-4, atol=1e-5)


def test_pack_unpack_roundtrip():
    logits, labels, ilen, slen, bands = _banded_case(11, 3, 20, 6, 9, 1)
    s1 = 7
    w = int(required_band_width(ilen, slen, bands, 20, s1))
    layout = compute_band_layout(ilen, slen, bands, 20, s1, w)
    xb = pack_band(logits, layout)
    assert xb.shape == (3, 20, w, 9)
    back = pack_band(unpack_band(xb, layout, s1, fill=-1.0), layout)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xb))
    # 3D variant
    x3 = logits[..., 0]
    b3 = pack_band(x3, layout)
    np.testing.assert_array_equal(
        np.asarray(pack_band(unpack_band(b3, layout, s1), layout)),
        np.asarray(b3))


def test_banded_public_api_autodiff():
    """jax.grad through the public banded entry matches the full-lattice VJP."""
    from monotonic_rnnt_tpu import monotonic_rnnt_loss

    logits, labels, ilen, slen, bands = _banded_case(5, 2, 16, 5, 12, 2)
    s1 = 6
    w = int(required_band_width(ilen, slen, bands, 16, s1))
    layout = compute_band_layout(ilen, slen, bands, 16, s1, w)

    def banded_sum(lb):
        c = monotonic_rnnt_loss_banded(lb, labels, ilen, slen, bands=bands,
                                       backend="reference")
        return jnp.sum(c * jnp.asarray([2.0, -0.5]))

    def full_sum(lg):
        c = monotonic_rnnt_loss(lg, labels, ilen, slen, bands=bands,
                                backend="reference")
        return jnp.sum(c * jnp.asarray([2.0, -0.5]))

    g_band = jax.grad(banded_sum)(pack_band(logits, layout))
    g_full = jax.grad(full_sum)(logits)
    np.testing.assert_allclose(np.asarray(unpack_band(g_band, layout, s1)),
                               np.asarray(g_full), rtol=1e-4, atol=1e-5)


def test_banded_cost_only_and_validation():
    logits, labels, ilen, slen, bands = _banded_case(6, 2, 16, 5, 12, 1)
    s1 = 6
    w = int(required_band_width(ilen, slen, bands, 16, s1))
    layout = compute_band_layout(ilen, slen, bands, 16, s1, w)
    lb = pack_band(logits, layout)
    c1, g = banded_ref(lb, labels, ilen, slen, bands, with_grads=False)
    assert g is None
    c2, _ = banded_ref(lb, labels, ilen, slen, bands)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)

    from monotonic_rnnt_tpu.utils.status import RnntError
    with pytest.raises(RnntError):
        monotonic_rnnt_loss_banded(
            jnp.zeros((2, 16, s1 + 1, 12)), labels, ilen, slen, bands=bands)


@pytest.mark.slow
def test_band_layout_properties_random():
    """Structural contract fuzz: offsets/d/width invariants over random bands."""
    from monotonic_rnnt_tpu.ops.bands import band_layout_is_exact

    master = np.random.RandomState(123)
    for _ in range(25):
        batch = int(master.randint(1, 5))
        t = int(master.randint(2, 40))
        s = int(master.randint(1, min(t, 12) + 1))
        v = 7
        shift = int(master.randint(0, 4))
        rng = np.random.RandomState(master.randint(2**31))
        ilen = rng.randint(max(s, 1), t + 1, (batch,)).astype(np.int32)
        slen = np.minimum(rng.randint(0, s + 1, (batch,)), ilen).astype(
            np.int32)
        align = _random_alignment(rng, batch, t, ilen, slen, v)
        ilen_j, slen_j = jnp.asarray(ilen), jnp.asarray(slen)
        bands = bands_from_alignment(jnp.asarray(align), ilen_j, slen_j,
                                     shift, 0)
        s1 = s + 1
        w_req = int(required_band_width(ilen_j, slen_j, bands, t, s1))
        assert 1 <= w_req <= s1
        for w in {w_req, min(s1, w_req + 3)}:
            layout = compute_band_layout(ilen_j, slen_j, bands, t, s1, w)
            off = np.asarray(layout.offset)
            d = np.asarray(layout.d)
            dn = np.asarray(layout.d_next)
            assert np.all((d >= 0) & (d <= 1)), d
            assert np.all(off[:, 0] == d[:, 0])
            assert np.all(np.diff(off, axis=1) == d[:, 1:])
            assert np.all(dn[:, :-1] == d[:, 1:]) and np.all(dn[:, -1] == 0)
            assert np.all(off + w <= s1)
            assert np.asarray(band_layout_is_exact(
                ilen_j, slen_j, bands, t, s1, w)).all(), (t, s, shift, w)
        if w_req > 1:
            # One slot narrower must clip somewhere (required is the minimum).
            assert not np.asarray(band_layout_is_exact(
                ilen_j, slen_j, bands, t, s1, w_req - 1)).all()


@pytest.mark.slow
def test_banded_pallas_wide_window_tail_batch():
    """Regression: W > 512 once flipped the recomputed batch tile between the
    padded and unpadded shapes, so the scan grid floor-divided and the tail
    batch rows were never written (NaN costs). Tiles are now threaded
    explicitly from the orchestrator."""
    rng = np.random.RandomState(0)
    B, T, S, V = 17, 34, 512, 4
    s1 = S + 1
    labels = jnp.asarray(rng.randint(1, V, (B, S)).astype(np.int32))
    ilen = jnp.full((B,), T, jnp.int32)
    slen = jnp.full((B,), 20, jnp.int32)
    bands = default_bands(ilen, slen, T)
    layout = compute_band_layout(ilen, slen, bands, T, s1, s1)
    assert layout.width == s1 > 512
    logits_band = jnp.asarray(rng.randn(B, T, s1, V).astype(np.float32))

    c_pal, g_pal = banded_pal(logits_band, labels, ilen, slen, bands,
                              interpret=True)
    c_ref, g_ref = banded_ref(logits_band, labels, ilen, slen, bands)
    assert np.isfinite(np.asarray(c_pal)).all(), np.asarray(c_pal)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_banded_stats_vocab_tiled_matches_oracle():
    """Force the multi-V-block online-LSE path of softmax_stats_banded
    (VT=128 over V=300: 3 blocks, overhanging last block) and compare the
    mask-folded streams against the XLA formulation."""
    from monotonic_rnnt_tpu.ops.banded import band_labels, band_stats
    from monotonic_rnnt_tpu.ops.bands import (band_lattice_masks,
                                              band_relative_bounds)
    from monotonic_rnnt_tpu.ops.helpers import mask_to_additive, shift_left_s
    from monotonic_rnnt_tpu.ops.pallas.kernels import softmax_stats_banded

    logits, labels, ilen, slen, bands = _banded_case(13, 2, 18, 6, 300, 2)
    t, s1 = 18, 7
    w = int(required_band_width(ilen, slen, bands, t, s1))
    layout = compute_band_layout(ilen, slen, bands, t, s1, w)
    lb = pack_band(logits, layout)
    lab_band = band_labels(labels, slen, layout, s1)
    rel = band_relative_bounds(ilen, slen, bands, layout, t, s1)

    got = softmax_stats_banded(lb, lab_band, rel, 0, with_beta=True,
                               interpret=True, tiles=(8, 128))
    stats = band_stats(lb, lab_band, 0)
    masks = band_lattice_masks(ilen, slen, bands, layout, t, s1)
    amask = mask_to_additive(masks.alpha)
    bmask = mask_to_additive(masks.beta)
    want = (stats.denom, stats.lp_blank + amask,
            stats.lp_label + shift_left_s(amask),
            stats.lp_blank + bmask, stats.lp_label + bmask)
    for g, e, name in zip(got, want,
                          ("denom", "lpba", "lpla", "lpbb", "lplb")):
        ge, ee = np.asarray(g), np.asarray(e)
        fin = np.isfinite(ee)
        assert (np.isfinite(ge) == fin).all(), name
        np.testing.assert_allclose(ge[fin], ee[fin], rtol=1e-5, atol=1e-5,
                                   err_msg=name)


def test_band_labels_matmul_matches_gather():
    """band_labels is a one-hot matmul (TPU gathers serialize); pin it to
    the take_along_axis semantics it replaced, including the -1 sentinel in
    out-of-range window slots and large label ids (>256, which a bf16 MXU
    pass would round — the matmul must run at exact precision)."""
    from monotonic_rnnt_tpu.ops.banded import band_labels
    from monotonic_rnnt_tpu.ops.helpers import extend_labels

    rng = np.random.RandomState(21)
    for _ in range(8):
        t = rng.randint(6, 50)
        s = rng.randint(1, min(12, t))
        batch, v = rng.randint(1, 4), 1024
        logits, labels, ilen, slen, bands = _banded_case(
            rng.randint(10_000), batch, t, s, v, rng.randint(0, 4))
        s1 = s + 1
        w = int(required_band_width(ilen, slen, bands, t, s1))
        layout = compute_band_layout(ilen, slen, bands, t, s1, w)
        got = band_labels(labels, slen, layout, s1)
        lab_ext = extend_labels(labels, slen, s1)
        idx = layout.offset[:, :, None] + jnp.arange(
            w, dtype=jnp.int32)[None, None, :]
        want = jnp.take_along_axis(lab_ext[:, None, :], idx, axis=2)
        assert (np.asarray(got) == np.asarray(want)).all()


def test_fwdbwd_scan_banded_multi_t_block():
    """The lane-packed fused scan pre-reverses the beta streams in t, so a
    grid with several time blocks must still chain both carries correctly
    (alpha ascending, beta descending through ascending flipped blocks).
    Compare a 4-block run against the single-block run of the same inputs."""
    from monotonic_rnnt_tpu.ops.helpers import NEG_INF
    from monotonic_rnnt_tpu.ops.pallas.kernels import fwdbwd_scan_banded

    rng = np.random.RandomState(33)
    batch, t, w = 2, 32, 8
    mk = lambda: jnp.asarray(rng.randn(batch, t, w).astype(np.float32))
    lpba, lpla, lpbb, lplb = mk(), mk(), mk(), mk()
    d = jnp.asarray(rng.randint(0, 2, (batch, t, 1)).astype(np.int32))
    dn = jnp.asarray(rng.randint(0, 2, (batch, t, 1)).astype(np.int32))
    ilen = jnp.asarray([[ [32] ], [[ 27 ]]], jnp.int32)
    bvirt = jnp.where(
        jnp.asarray(rng.rand(batch, t, w) < 0.2), 0.0, NEG_INF
    ).astype(jnp.float32)

    args = (lpba, lpla, d, lpbb, lplb, dn, ilen, bvirt)
    a1, b1 = fwdbwd_scan_banded(*args, interpret=True, tiles=(batch, t))
    a4, b4 = fwdbwd_scan_banded(*args, interpret=True, tiles=(batch, t // 4))
    np.testing.assert_allclose(np.asarray(a4), np.asarray(a1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(b4), np.asarray(b1),
                               rtol=1e-6, atol=1e-6)


def test_banded_deferred_gradient_route_matches_reference():
    # Differentiating the banded public API with backend='pallas' takes the
    # deferred route (fwd = stats + bidirectional walk; bwd = cotangent-
    # scaled occupancy + grad pass). Weighted gradients must match the
    # reference backend.
    import jax
    from monotonic_rnnt_tpu.ops.banded import monotonic_rnnt_loss_banded
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width)
    from monotonic_rnnt_tpu.utils.debug import interpret_mode

    rng = np.random.RandomState(23)
    B, T, S, V = 2, 18, 5, 33
    logits = jnp.asarray(rng.randn(B, T, S + 1, V).astype(np.float32) * 2)
    labels = jnp.asarray(rng.randint(1, V, (B, S)).astype(np.int32))
    ilen = jnp.asarray(np.array([T, 11], np.int32))
    slen = jnp.asarray(np.array([S, 3], np.int32))
    align = np.zeros((B, T), np.int32)
    for b in range(B):
        pos = np.sort(rng.choice(int(ilen[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels)[b, :int(slen[b])]
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, 2, 0)
    w = int(required_band_width(ilen, slen, bands, T, S + 1))
    layout = compute_band_layout(ilen, slen, bands, T, S + 1, w)
    lb = pack_band(logits, layout)
    wgt = jnp.asarray([1.5, -0.25], jnp.float32)

    def total(x, backend):
        return jnp.sum(wgt * monotonic_rnnt_loss_banded(
            x, labels, ilen, slen, bands=bands, backend=backend))

    with interpret_mode():
        v_pal, g_pal = jax.jit(jax.value_and_grad(
            lambda x: total(x, "pallas")))(lb)
    v_ref, g_ref = jax.jit(jax.value_and_grad(
        lambda x: total(x, "reference")))(lb)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
