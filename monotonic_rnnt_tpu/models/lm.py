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

import dataclasses

import flax.linen as nn
import jax
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


@dataclasses.dataclass(frozen=True)
class LstmLmConfig:
    vocab_size: int = 1024
    dim: int = 256
    embed_dim: int = 128
    dtype: jnp.dtype = jnp.bfloat16


class LstmLm(nn.Module):
    """Embedding + LSTM + vocab projection: a trainable neural LM.

    `__call__` gives teacher-forced next-token log-probs for training
    (position i predicts tokens[:, i] from tokens[:, :i], BOS-shifted like
    the transducer predictor); `init_state`/`step` give the stepwise form.
    Bind trained params with FlaxLmAdapter for beam-search fusion.
    """

    cfg: LstmLmConfig

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, dtype=cfg.dtype)
        self.cell = nn.OptimizedLSTMCell(cfg.dim, dtype=cfg.dtype)
        self.out = nn.Dense(cfg.vocab_size, dtype=cfg.dtype)

    def __call__(self, tokens):
        """tokens [B, S] -> next-token log-probs [B, S, V] (BOS-shifted)."""
        from ..utils.vma import vary_like

        batch = tokens.shape[0]
        hist = jnp.concatenate(
            [jnp.zeros((batch, 1), tokens.dtype), tokens[:, :-1]], axis=1)
        emb = self.embed(hist)
        scan = nn.scan(lambda cell, carry, x: cell(carry, x),
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        carry = self.cell.initialize_carry(jax.random.PRNGKey(0),
                                           emb[:, 0].shape)
        _, y = scan(self.cell, vary_like(carry, emb), emb)
        return jax.nn.log_softmax(self.out(y).astype(jnp.float32), axis=-1)

    def init_state(self, batch: int):
        return self.cell.initialize_carry(
            jax.random.PRNGKey(0), (batch, self.cfg.embed_dim))

    def step(self, state, tokens):
        emb = self.embed(tokens.astype(jnp.int32))
        state, y = self.cell(state, emb)
        return state, jax.nn.log_softmax(
            self.out(y).astype(jnp.float32), axis=-1)


class FlaxLmAdapter:
    """Bind a flax stepwise LM (init_state/step methods) + its variables
    into the fusion protocol — the bridge from any trained flax LM to
    beam_search_decode(lm=...)."""

    def __init__(self, module: nn.Module, variables):
        self.module = module
        self.variables = variables

    def init_state(self, n: int):
        return self.module.apply(self.variables, n, method="init_state")

    def step(self, state, tokens):
        return self.module.apply(self.variables, state, tokens,
                                 method="step")
