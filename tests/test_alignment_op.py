"""Viterbi forced-alignment op tests (ops/alignment.py).

Validated against a brute-force path enumeration on the golden README
lattice (small enough to enumerate all C(T, S) monotonic paths exactly).
"""

from itertools import combinations

import numpy as np
import jax
import jax.numpy as jnp

from monotonic_rnnt_tpu import monotonic_rnnt_loss
from monotonic_rnnt_tpu.ops.alignment import viterbi_alignment
from monotonic_rnnt_tpu.ops.bands import bands_from_alignment

import golden


def brute_force_best(probs, labels):
    """Enumerate all monotonic paths; return (best_alignment, best_logp).

    probs: [T, S+1, V] posteriors; labels: [S]. A path = set of S frames at
    which the labels are emitted, in order.
    """
    t_max, s1, _ = probs.shape
    s_len = len(labels)
    best_lp, best_align = -np.inf, None
    for emit_frames in combinations(range(t_max), s_len):
        lp, s, align = 0.0, 0, []
        for t in range(t_max):
            if s < s_len and t == emit_frames[s]:
                lp += np.log(probs[t, s, labels[s]])
                align.append(int(labels[s]))
                s += 1
            else:
                lp += np.log(probs[t, s, 0])
                align.append(0)
        if lp > best_lp:
            best_lp, best_align = lp, align
    return np.asarray(best_align, np.int32), best_lp


def test_viterbi_matches_brute_force_readme():
    logits, labels, ilen, slen = golden.readme_batch()
    res = jax.jit(viterbi_alignment)(jnp.asarray(logits), jnp.asarray(labels),
                                     jnp.asarray(ilen), jnp.asarray(slen))
    exp_align, exp_lp = brute_force_best(golden.README_PROBS,
                                         golden.README_LABELS)
    np.testing.assert_array_equal(np.asarray(res.alignment[0]), exp_align)
    np.testing.assert_allclose(float(res.score[0]), -exp_lp, atol=1e-5)


def test_viterbi_random_matches_brute_force():
    rng = np.random.RandomState(5)
    T, S, V = 6, 3, 4
    logits = rng.randn(1, T, S + 1, V).astype(np.float32)
    labels = rng.randint(1, V, size=(1, S)).astype(np.int32)
    probs = np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True)
    exp_align, exp_lp = brute_force_best(probs, labels[0])
    res = jax.jit(viterbi_alignment)(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(np.array([T], np.int32)),
        jnp.asarray(np.array([S], np.int32)))
    np.testing.assert_allclose(float(res.score[0]), -exp_lp, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res.alignment[0]), exp_align)


def test_viterbi_variable_lengths_and_padding():
    logits, labels, ilen, slen, _, _ = golden.multibatch(t_pad=6, s_pad=4)
    res = jax.jit(viterbi_alignment)(jnp.asarray(logits), jnp.asarray(labels),
                                     jnp.asarray(ilen), jnp.asarray(slen))
    align = np.asarray(res.alignment)
    for b in range(2):
        # Emitted labels on active frames reconstruct the target sequence.
        active = align[b, :ilen[b]]
        np.testing.assert_array_equal(active[active != 0],
                                      labels[b, :slen[b]])
        # Padding frames are blank.
        assert (align[b, ilen[b]:] == 0).all()
    # Score >= loss (one path carries at most all the mass).
    costs = monotonic_rnnt_loss(jnp.asarray(logits), jnp.asarray(labels),
                                jnp.asarray(ilen), jnp.asarray(slen),
                                backend="reference")
    assert (np.asarray(res.score) >= np.asarray(costs) - 1e-5).all()


def test_viterbi_score_equals_restricted_loss_at_shift0():
    # -log p(best path) must equal the alignment-restricted loss with the
    # Viterbi alignment at max_distance 0 (the path's own probability).
    logits, labels, ilen, slen = golden.readme_batch()
    res = viterbi_alignment(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(ilen), jnp.asarray(slen))
    restricted = monotonic_rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ilen),
        jnp.asarray(slen), alignment=res.alignment,
        max_distance_from_alignment=0, backend="reference")
    np.testing.assert_allclose(np.asarray(res.score),
                               np.asarray(restricted), atol=1e-5)


def test_viterbi_banded_realign():
    # Restricting the search to a band around a given alignment yields a path
    # inside the band.
    logits, labels, ilen, slen = golden.readme_batch()
    bands = bands_from_alignment(jnp.asarray(golden.ALIGN_B[None]),
                                 jnp.asarray(ilen), jnp.asarray(slen), 0, 0)
    res = viterbi_alignment(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(ilen), jnp.asarray(slen), bands=bands)
    # shift 0 around ALIGN_B leaves exactly that path.
    np.testing.assert_array_equal(np.asarray(res.alignment[0]),
                                  golden.ALIGN_B)
    np.testing.assert_allclose(float(res.score[0]), -np.log(0.0672),
                               atol=1e-3)


def test_occupancy_posteriors_sum_to_one():
    from monotonic_rnnt_tpu import occupancy_posteriors

    logits, labels, ilen, slen, _, _ = golden.multibatch(t_pad=6, s_pad=4)
    occ = jax.jit(occupancy_posteriors)(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ilen),
        jnp.asarray(slen))
    occ = np.asarray(occ)
    for b in range(2):
        np.testing.assert_allclose(occ[b, :ilen[b]].sum(-1), 1.0, rtol=1e-5)
        assert (np.abs(occ[b, ilen[b]:]) < 1e-7).all()
    assert (occ >= -1e-7).all()


def test_occupancy_concentrates_on_viterbi_path():
    # On a sharply peaked lattice the occupancy should put most mass on the
    # Viterbi path's cells.
    rng = np.random.RandomState(8)
    T, S, V = 6, 3, 4
    logits = (rng.randn(1, T, S + 1, V) * 6).astype(np.float32)
    labels = rng.randint(1, V, size=(1, S)).astype(np.int32)
    ilen, slen = np.array([T], np.int32), np.array([S], np.int32)
    from monotonic_rnnt_tpu import occupancy_posteriors, viterbi_alignment
    occ = np.asarray(occupancy_posteriors(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(ilen),
        jnp.asarray(slen)))
    res = viterbi_alignment(jnp.asarray(logits), jnp.asarray(labels),
                            jnp.asarray(ilen), jnp.asarray(slen))
    # Walk the Viterbi path and accumulate its occupancy.
    s = 0
    mass = 0.0
    for t in range(T):
        mass += occ[0, t, s]
        if res.alignment[0, t] != 0:
            s += 1
    assert mass / T > 0.5, mass / T


def test_banded_viterbi_matches_full():
    """Packed-layout Viterbi == full-lattice Viterbi with the same bands."""
    from monotonic_rnnt_tpu.ops.alignment import (viterbi_alignment,
                                                  viterbi_alignment_banded)
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width)

    rng = np.random.RandomState(8)
    B, T, S, V = 3, 22, 7, 13
    logits = jnp.asarray(rng.randn(B, T, S + 1, V).astype(np.float32) * 2)
    labels = jnp.asarray(rng.randint(1, V, (B, S)).astype(np.int32))
    ilen = jnp.asarray(rng.randint(S + 1, T + 1, (B,)).astype(np.int32))
    slen = jnp.asarray(rng.randint(1, S + 1, (B,)).astype(np.int32))
    align = np.zeros((B, T), np.int32)
    for b in range(B):
        pos = np.sort(rng.choice(int(ilen[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels[b, :int(slen[b])])
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, 2, 0)
    w = int(required_band_width(ilen, slen, bands, T, S + 1))
    layout = compute_band_layout(ilen, slen, bands, T, S + 1, w)
    lb = pack_band(logits, layout)

    full = jax.jit(lambda *a: viterbi_alignment(*a, bands=bands))(
        logits, labels, ilen, slen)
    band = jax.jit(lambda *a: viterbi_alignment_banded(*a, bands=bands))(
        lb, labels, ilen, slen)
    np.testing.assert_allclose(np.asarray(band.score), np.asarray(full.score),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(band.alignment),
                                  np.asarray(full.alignment))


def test_banded_occupancy_matches_full():
    from monotonic_rnnt_tpu.ops.alignment import (occupancy_posteriors,
                                                  occupancy_posteriors_banded)
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width,
                                              unpack_band)

    rng = np.random.RandomState(9)
    B, T, S, V = 2, 18, 5, 9
    logits = jnp.asarray(rng.randn(B, T, S + 1, V).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, V, (B, S)).astype(np.int32))
    ilen = jnp.asarray([18, 12], jnp.int32)
    slen = jnp.asarray([5, 3], jnp.int32)
    align = np.zeros((B, T), np.int32)
    for b in range(B):
        pos = np.sort(rng.choice(int(ilen[b]), size=int(slen[b]),
                                 replace=False))
        align[b, pos] = np.asarray(labels[b, :int(slen[b])])
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, 2, 0)
    w = int(required_band_width(ilen, slen, bands, T, S + 1))
    layout = compute_band_layout(ilen, slen, bands, T, S + 1, w)
    lb = pack_band(logits, layout)

    full = occupancy_posteriors(logits, labels, ilen, slen, bands=bands)
    band = occupancy_posteriors_banded(lb, labels, ilen, slen, bands=bands)
    np.testing.assert_allclose(
        np.asarray(unpack_band(band, layout, S + 1)), np.asarray(full),
        rtol=1e-5, atol=1e-6)
