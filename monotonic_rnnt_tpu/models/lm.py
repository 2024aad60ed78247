"""External language models for shallow fusion in beam search.

The decoder-side LM protocol mirrors the predictor's stepwise interface so
per-hypothesis states ride the same beam machinery (gather by parent,
advance on emission):

    state = lm.init_state(n)                 # n parallel hypotheses
    state, logp = lm.step(state, tokens)     # consume tokens [n] (0 = BOS),
                                             # return log P(next | history) [n, V]

Fusion (models/transducer.py beam_search_decode): label candidates score
``logp_am + lm_weight * logp_lm``; blank is never LM-scored (the LM models
the label sequence, not the frame alignment — standard shallow fusion for
transducers). Any stateful model fits the protocol — wrap a flax LM's
params into a small adapter object; BigramLm below is the minimal reference
implementation (and the test vehicle).

The reference has no decoder at all (SURVEY.md §0: training-loss library);
this is framework-surplus serving capability.
"""

from __future__ import annotations

import jax.numpy as jnp


class BigramLm:
    """Table-lookup bigram LM: log P(next | prev) from a [V, V] matrix.

    Row i is the next-token log-distribution after token i; row 0 doubles
    as the BOS distribution (token 0 = BOS, matching the predictor's
    convention).
    """

    def __init__(self, log_probs: jnp.ndarray):
        if log_probs.ndim != 2 or log_probs.shape[0] != log_probs.shape[1]:
            raise ValueError(f"expected square [V, V] matrix, got "
                             f"{log_probs.shape}")
        self.log_probs = jnp.asarray(log_probs, jnp.float32)

    def init_state(self, n: int) -> jnp.ndarray:
        return jnp.zeros((n,), jnp.int32)

    def step(self, state, tokens):
        tokens = tokens.astype(jnp.int32)
        return tokens, self.log_probs[tokens]
