"""Edit-distance/WER metrics and SpecAugment: correctness vs plain-Python
references and contract properties."""

import numpy as np

import jax
import jax.numpy as jnp

from monotonic_rnnt_tpu.data.augment import spec_augment
from monotonic_rnnt_tpu.utils.metrics import edit_distance, error_rate


def _py_levenshtein(a, b):
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (ca != cb))
    return d[len(b)]


def test_edit_distance_matches_python_reference():
    rng = np.random.RandomState(0)
    B, N, M = 12, 9, 7
    hyp = rng.randint(0, 5, (B, N)).astype(np.int32)
    ref = rng.randint(0, 5, (B, M)).astype(np.int32)
    hlen = rng.randint(0, N + 1, (B,)).astype(np.int32)
    rlen = rng.randint(0, M + 1, (B,)).astype(np.int32)
    # Poison the padding: it must never match.
    for b in range(B):
        hyp[b, hlen[b]:] = 3
        ref[b, rlen[b]:] = 3

    got = jax.jit(edit_distance)(jnp.asarray(hyp), jnp.asarray(hlen),
                                 jnp.asarray(ref), jnp.asarray(rlen))
    want = [_py_levenshtein(list(ref[b, :rlen[b]]), list(hyp[b, :hlen[b]]))
            for b in range(B)]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_error_rate_corpus_level():
    hyp = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    ref = jnp.asarray([[1, 2, 9], [4, 5, 6]], jnp.int32)
    stats = error_rate(hyp, jnp.asarray([3, 2]), ref, jnp.asarray([3, 3]))
    np.testing.assert_array_equal(np.asarray(stats.errors), [1, 1])
    np.testing.assert_allclose(float(stats.rate), 2 / 6)


def test_edit_distance_identity_and_empty():
    seq = jnp.asarray([[7, 8, 9, 1]], jnp.int32)
    four = jnp.asarray([4])
    zero = jnp.asarray([0])
    assert int(edit_distance(seq, four, seq, four)[0]) == 0
    assert int(edit_distance(seq, four, seq, zero)[0]) == 4   # all inserts
    assert int(edit_distance(seq, zero, seq, four)[0]) == 4   # all deletes


def test_spec_augment_properties():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.rand(4, 50, 20).astype(np.float32) + 1.0)
    flen = jnp.asarray([50, 30, 10, 50], jnp.int32)
    key = jax.random.PRNGKey(0)
    out = jax.jit(lambda k, f: spec_augment(
        k, f, flen, max_time_width=10, max_freq_width=5))(key, feats)
    out = np.asarray(out)
    feats_np = np.asarray(feats)
    # Masked cells are exactly zero; everything else is untouched.
    changed = out != feats_np
    assert np.all(out[changed] == 0.0)
    # Time masks stay inside each sample's valid frames (freq masks span
    # all t by design, so disable them for the tail check).
    out_t = np.asarray(spec_augment(key, feats, flen, max_time_width=10,
                                    num_freq_masks=0))
    for b in range(4):
        np.testing.assert_array_equal(out_t[b, int(flen[b]):],
                                      feats_np[b, int(flen[b]):])
    # Deterministic per key; different keys give different masks.
    out2 = np.asarray(spec_augment(key, feats, flen, max_time_width=10,
                                   max_freq_width=5))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(spec_augment(jax.random.PRNGKey(7), feats, flen,
                                   max_time_width=10, max_freq_width=5))
    assert (out != out3).any()
    # All-zero mask counts = identity.
    ident = np.asarray(spec_augment(key, feats, flen, num_time_masks=0,
                                    num_freq_masks=0))
    np.testing.assert_array_equal(ident, feats_np)
