"""Conformer-transducer: encoder + predictor + joint -> monotonic RNN-T loss.

The joint network produces the per-(t, s) logits the loss consumes
([B, T, S+1, V] padded layout) — the tensor the reference receives pre-packed
from RETURNN/RASR (reference: tensorflow_binding/monotonic_rnnt_op.cu:28-33).
Also provides a frame-synchronous greedy decoder: monotonic RNN-T makes
exactly one decision per frame (emit label or blank), so decoding is a single
lax.scan over time — no inner emission loop like standard RNN-T.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.loss import monotonic_rnnt_loss
from .conformer import ConformerConfig, ConformerEncoder
from .predictor import ConvPredictor, LstmPredictor, PredictorConfig


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    encoder: ConformerConfig = ConformerConfig()
    predictor: PredictorConfig = PredictorConfig()
    joint_dim: int = 256
    vocab_size: int = 1024           # includes blank at index blank_id
    blank_id: int = 0
    predictor_kind: str = "lstm"     # 'lstm' | 'conv'
    dtype: jnp.dtype = jnp.bfloat16


class Joint(nn.Module):
    """Additive joint: tanh(W_e enc[t] + W_p pred[s]) -> vocab logits."""

    cfg: TransducerConfig

    @nn.compact
    def __call__(self, enc, pred):
        cfg = self.cfg
        e = nn.Dense(cfg.joint_dim, dtype=cfg.dtype, name="enc_proj")(
            enc.astype(cfg.dtype))
        p = nn.Dense(cfg.joint_dim, dtype=cfg.dtype, name="pred_proj")(
            pred.astype(cfg.dtype))
        h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])  # [B,T,S1,J]
        return nn.Dense(cfg.vocab_size, dtype=cfg.dtype,
                        name="vocab_proj")(h).astype(jnp.float32)


class MonotonicTransducer(nn.Module):
    cfg: TransducerConfig

    def setup(self):
        self.encoder = ConformerEncoder(self.cfg.encoder)
        if self.cfg.predictor_kind == "lstm":
            self.predictor = LstmPredictor(self.cfg.predictor)
        else:
            self.predictor = ConvPredictor(self.cfg.predictor)
        self.joint = Joint(self.cfg)

    def __call__(self, feats, feat_lengths, labels, label_lengths,
                 deterministic: bool = True):
        """Returns per-sample monotonic RNN-T costs [B]."""
        logits, enc_lengths = self.logits(feats, feat_lengths, labels,
                                          deterministic)
        # Loss requires T_b >= S_b; clamp label lengths defensively for
        # degenerate synthetic cases (real pipelines filter such samples).
        slen = jnp.minimum(label_lengths, enc_lengths)
        return monotonic_rnnt_loss(logits, labels, enc_lengths, slen,
                                   blank_id=self.cfg.blank_id)

    def logits(self, feats, feat_lengths, labels, deterministic: bool = True):
        enc, enc_lengths = self.encoder(feats, feat_lengths, deterministic)
        pred = self.predictor(labels, deterministic)
        return self.joint(enc, pred), enc_lengths

    def encode(self, feats, feat_lengths, deterministic: bool = True):
        return self.encoder(feats, feat_lengths, deterministic)

    def greedy_decode(self, feats, feat_lengths, max_labels: int,
                      deterministic: bool = True):
        """Frame-synchronous greedy decoding.

        Returns (hyp_labels [B, max_labels], hyp_lengths [B]). Uses the
        ConvPredictor-style limited context for O(T) decoding; with the LSTM
        predictor the decoder recomputes the prediction network each step on
        the running hypothesis (simple, correct; optimize later).
        """
        enc, enc_lengths = self.encoder(feats, feat_lengths, deterministic)
        batch, t_out, _ = enc.shape
        blank = self.cfg.blank_id

        def step(carry, t):
            hyp, n_hyp = carry                      # [B, max_labels], [B]
            pred = self.predictor(hyp, deterministic)  # [B, max_labels+1, D]
            ctx = jnp.take_along_axis(
                pred, jnp.minimum(n_hyp, max_labels)[:, None, None], axis=1)
            enc_t = jax.lax.dynamic_slice_in_dim(enc, t, 1, axis=1)
            logit = self.joint(enc_t, ctx)[:, 0, 0, :]               # [B, V]
            tok = jnp.argmax(logit, axis=-1).astype(jnp.int32)
            emit = (tok != blank) & (t < enc_lengths) & (n_hyp < max_labels)
            hyp = jnp.where(
                emit[:, None] & (jnp.arange(max_labels)[None, :]
                                 == n_hyp[:, None]),
                tok[:, None], hyp)
            n_hyp = n_hyp + emit.astype(jnp.int32)
            return (hyp, n_hyp), None

        init = (jnp.zeros((batch, max_labels), jnp.int32),
                jnp.zeros((batch,), jnp.int32))
        (hyp, n_hyp), _ = jax.lax.scan(step, init, jnp.arange(t_out))
        return hyp, n_hyp
