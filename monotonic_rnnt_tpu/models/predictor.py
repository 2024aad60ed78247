"""Label-context prediction networks for the transducer.

Produces one context vector per label position s in [0, S] — position 0 is
the empty history (matching the lattice's s=0 row, where only blank or the
first label can be emitted). Two families:

  * LstmPredictor  — embedding + unidirectional LSTM over the label sequence
    (the classic RNN-T predictor); the training path compiles to a lax.scan.
  * ConvPredictor  — stateless limited-context predictor (embedding + causal
    conv), the cheap alternative used by several production transducers.

Both expose, besides the batched training `__call__`, a **stepwise decoding
interface** so frame-synchronous decoders advance in O(1) work per emitted
label instead of re-running the whole network over the hypothesis each frame:

    state = predictor.init_state(batch)     # context for empty history
    state, ctx = predictor.step(state, tokens)   # advance with emitted token

For the LSTM the state is the LSTM carry; for the conv predictor it is a
ring of the last `context` token ids. The decoder owns the "advance only on
emission" logic (a tree-select over the state).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PredictorConfig:
    vocab_size: int = 1024           # includes blank
    dim: int = 256
    embed_dim: int = 128
    context: int = 2                 # ConvPredictor history length
    dtype: jnp.dtype = jnp.bfloat16


def _shift_with_bos(labels: jnp.ndarray) -> jnp.ndarray:
    """[B, S] labels -> [B, S+1] history inputs (position 0 = BOS=0)."""
    batch = labels.shape[0]
    bos = jnp.zeros((batch, 1), labels.dtype)
    return jnp.concatenate([bos, labels], axis=1)


class LstmPredictor(nn.Module):
    cfg: PredictorConfig

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, dtype=cfg.dtype)
        self.cell = nn.OptimizedLSTMCell(cfg.dim, dtype=cfg.dtype)
        self.out = nn.Dense(cfg.dim, dtype=cfg.dtype)

    def __call__(self, labels, deterministic: bool = True):
        hist = _shift_with_bos(labels)                      # [B, S+1]
        emb = self.embed(hist)

        scan = nn.scan(lambda cell, carry, x: cell(carry, x),
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=1, out_axes=1)
        carry = self.cell.initialize_carry(jax.random.PRNGKey(0),
                                           emb[:, 0].shape)
        # Inside shard_map the scan carry must vary over the same mesh axes
        # as its per-step outputs (which inherit emb's); the zero init is
        # axis-invariant until promoted. No-op outside shard_map.
        from ..utils.vma import vary_like
        carry = vary_like(carry, emb)
        _, y = scan(self.cell, carry, emb)
        return self.out(y).astype(jnp.float32)

    def init_state(self, batch: int) -> Any:
        return self.cell.initialize_carry(
            jax.random.PRNGKey(0), (batch, self.cfg.embed_dim))

    def step(self, state: Any, tokens: jnp.ndarray) -> Tuple[Any, jnp.ndarray]:
        """Advance with one token per sample. tokens [B] int32 (0 = BOS).

        Returns (new_state, ctx [B, dim] f32) — ctx is the context vector
        *after* consuming `tokens` (position len(history) in __call__ terms).
        """
        emb = self.embed(tokens)
        state, y = self.cell(state, emb)
        return state, self.out(y).astype(jnp.float32)


class ConvPredictor(nn.Module):
    cfg: PredictorConfig

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(cfg.vocab_size, cfg.embed_dim, dtype=cfg.dtype)
        self.conv = nn.Conv(cfg.dim, (cfg.context,), padding="VALID",
                            dtype=cfg.dtype)
        self.out = nn.Dense(cfg.dim, dtype=cfg.dtype)

    def __call__(self, labels, deterministic: bool = True):
        cfg = self.cfg
        hist = _shift_with_bos(labels)
        emb = self.embed(hist)
        # Causal conv: pad left so position s sees only labels < s.
        x = jnp.pad(emb, ((0, 0), (cfg.context - 1, 0), (0, 0)))
        y = nn.relu(self.conv(x))
        return self.out(y).astype(jnp.float32)

    def init_state(self, batch: int) -> jnp.ndarray:
        # Ring of the last `context` tokens with a validity mask: unfilled
        # slots enter the conv as zero VECTORS, matching the training path's
        # zero left-padding (embed(0) is the BOS embedding, distinct from
        # padding). The pre-BOS state is fully unfilled; the decoder's first
        # step pushes BOS (token 0), reproducing __call__'s position 0.
        cfg = self.cfg
        tokens = jnp.zeros((batch, cfg.context), jnp.int32)
        filled = jnp.zeros((batch, cfg.context), jnp.bool_)
        return (tokens, filled)

    def step(self, state, tokens: jnp.ndarray):
        """Push one token per sample; returns ctx after consuming it."""
        ring, filled = state
        ring = jnp.concatenate([ring[:, 1:], tokens[:, None]], axis=1)
        filled = jnp.concatenate(
            [filled[:, 1:], jnp.ones_like(filled[:, :1])], axis=1)
        emb = self.embed(ring)
        emb = emb * filled[..., None].astype(emb.dtype)
        y = nn.relu(self.conv(emb))[:, 0]
        return (ring, filled), self.out(y).astype(jnp.float32)
