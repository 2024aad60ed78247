"""Label-context prediction networks for the transducer.

Produces one context vector per label position s in [0, S] — position 0 is
the empty history (matching the lattice's s=0 row, where only blank or the
first label can be emitted). Two families:

  * LstmPredictor  — embedding + unidirectional LSTM over the label sequence
    (the classic RNN-T predictor), implemented with nn.scan so the recurrence
    compiles to a lax.scan.
  * ConvPredictor  — stateless limited-context predictor (embedding + causal
    conv), the cheap alternative used by several production transducers.
"""

from __future__ import annotations

import dataclasses

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

    @nn.compact
    def __call__(self, labels, deterministic: bool = True):
        cfg = self.cfg
        hist = _shift_with_bos(labels)                      # [B, S+1]
        emb = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                       dtype=cfg.dtype)(hist)
        lstm = nn.RNN(nn.OptimizedLSTMCell(cfg.dim, dtype=cfg.dtype))
        y = lstm(emb)
        return nn.Dense(cfg.dim, dtype=cfg.dtype)(y).astype(jnp.float32)


class ConvPredictor(nn.Module):
    cfg: PredictorConfig

    @nn.compact
    def __call__(self, labels, deterministic: bool = True):
        cfg = self.cfg
        hist = _shift_with_bos(labels)
        emb = nn.Embed(cfg.vocab_size, cfg.embed_dim, dtype=cfg.dtype)(hist)
        # Causal conv: pad left so position s sees only labels < s.
        pad = cfg.context - 1
        x = jnp.pad(emb, ((0, 0), (pad, 0), (0, 0)))
        y = nn.Conv(cfg.dim, (cfg.context,), padding="VALID",
                    dtype=cfg.dtype)(x)
        y = nn.relu(y)
        return nn.Dense(cfg.dim, dtype=cfg.dtype)(y).astype(jnp.float32)
