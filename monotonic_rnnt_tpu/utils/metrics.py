"""Recognition-quality metrics: batched edit distance, WER/CER.

Levenshtein distance as a jittable DP: a lax.scan over the reference axis
carrying one row of the distance matrix. The row's insertion chain
(D[i][j-1] + 1) would serialize the row; instead the row updates with the
exact prefix-min identity

    D[i][j] = j + cummin_k<=j ( cand[k] - k ),   cand[k] = best non-insertion
                                                 value at column k,

so each of the M scan steps is one vectorized [B, N+1] cummin on the VPU.
Evaluation-side capability the reference library (a pure loss) does not
have; scores greedy/beam/streaming decodes against target label sequences.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ErrorStats(NamedTuple):
    errors: jnp.ndarray     # [B] edit distance per sequence
    lengths: jnp.ndarray    # [B] reference lengths
    rate: jnp.ndarray       # scalar: sum(errors) / max(1, sum(lengths))


def edit_distance(hyp, hyp_lengths, ref, ref_lengths) -> jnp.ndarray:
    """Batched Levenshtein distance between padded id sequences.

    hyp [B, N], ref [B, M] int arrays with per-sample valid lengths;
    padding never matches (masked). Returns [B] int32 distances.
    """
    hyp = jnp.asarray(hyp, jnp.int32)
    ref = jnp.asarray(ref, jnp.int32)
    hlen = jnp.asarray(hyp_lengths, jnp.int32)
    rlen = jnp.asarray(ref_lengths, jnp.int32)
    batch, n = hyp.shape
    m = ref.shape[1]

    col = jnp.arange(n + 1, dtype=jnp.int32)[None, :]       # [1, N+1]
    init = jnp.broadcast_to(col, (batch, n + 1))            # D[0][j] = j
    hyp_valid = (col[:, 1:] <= hlen[:, None])               # [B, N]

    def step(row, i):
        ref_i = jax.lax.dynamic_slice_in_dim(ref, i - 1, 1, axis=1)
        sub_hit = (hyp == ref_i) & hyp_valid                # [B, N]
        sub = row[:, :-1] + jnp.where(sub_hit, 0, 1)        # diagonal
        dele = row[:, 1:] + 1                               # skip ref[i-1]
        cand = jnp.concatenate(
            [row[:, :1] + 1, jnp.minimum(sub, dele)], axis=1)
        new_row = jax.lax.cummin(cand - col, axis=1) + col  # + insertions
        # Rows past a sample's reference length keep the previous row, so
        # the final row is row[rlen] for every sample.
        return jnp.where((i <= rlen)[:, None], new_row, row), None

    row, _ = jax.lax.scan(step, init,
                          jnp.arange(1, m + 1, dtype=jnp.int32))
    return jnp.take_along_axis(row, jnp.minimum(hlen, n)[:, None],
                               axis=1)[:, 0]


def error_rate(hyp, hyp_lengths, ref, ref_lengths) -> ErrorStats:
    """Corpus error rate (WER when ids are words, CER for characters)."""
    errs = edit_distance(hyp, hyp_lengths, ref, ref_lengths)
    rlen = jnp.asarray(ref_lengths, jnp.int32)
    rate = jnp.sum(errs) / jnp.maximum(1, jnp.sum(rlen)).astype(jnp.float32)
    return ErrorStats(errors=errs, lengths=rlen, rate=rate)
