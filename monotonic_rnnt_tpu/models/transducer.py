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

    def setup(self):
        cfg = self.cfg
        self.enc_proj = nn.Dense(cfg.joint_dim, dtype=cfg.dtype,
                                 name="enc_proj")
        self.pred_proj = nn.Dense(cfg.joint_dim, dtype=cfg.dtype,
                                  name="pred_proj")
        self.vocab_proj = nn.Dense(cfg.vocab_size, dtype=cfg.dtype,
                                   name="vocab_proj")

    def __call__(self, enc, pred):
        cfg = self.cfg
        e = self.enc_proj(enc.astype(cfg.dtype))
        p = self.pred_proj(pred.astype(cfg.dtype))
        h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])  # [B,T,S1,J]
        return self.vocab_proj(h).astype(jnp.float32)

    def banded(self, enc, pred_band):
        """Band-cell joint: pred rows pre-gathered per cell.

        enc [B, Tc, De], pred_band [B, Tc, W, Dp] -> [B, Tc, W, V]; the enc
        projection is computed once per (b, t) and broadcast over the band
        (the ops/chunked_banded.py joint_fn contract).
        """
        cfg = self.cfg
        e = self.enc_proj(enc.astype(cfg.dtype))
        p = self.pred_proj(pred_band.astype(cfg.dtype))
        h = jnp.tanh(e[:, :, None, :] + p)                 # [B,Tc,W,J]
        return self.vocab_proj(h).astype(jnp.float32)


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
        # No silent clamping: if subsampling leaves fewer frames than labels
        # (T'_b < S_b) the lattice is infeasible and the loss is +inf — a
        # data-pipeline bug should surface, not train on truncated targets.
        return monotonic_rnnt_loss(logits, labels, enc_lengths,
                                   label_lengths,
                                   blank_id=self.cfg.blank_id)

    def logits(self, feats, feat_lengths, labels, deterministic: bool = True):
        enc, enc_lengths = self.encoder(feats, feat_lengths, deterministic)
        pred = self.predictor(labels, deterministic)
        return self.joint(enc, pred), enc_lengths

    def encode(self, feats, feat_lengths, deterministic: bool = True):
        return self.encoder(feats, feat_lengths, deterministic)

    @staticmethod
    def _select_state(emit, new_state, old_state):
        """Per-sample select over a predictor-state pytree ([B*, ...] leaves)."""
        def sel(a, b):
            cond = emit.reshape(emit.shape + (1,) * (a.ndim - emit.ndim))
            return jnp.where(cond, a, b)

        return jax.tree.map(sel, new_state, old_state)

    def greedy_decode(self, feats, feat_lengths, max_labels: int,
                      deterministic: bool = True):
        """Frame-synchronous greedy decoding.

        Returns (hyp_labels [B, max_labels], hyp_lengths [B]). The predictor
        advances statefully — O(1) work per frame (LSTM carry / conv token
        ring), not a re-run over the hypothesis — so decoding is O(T)
        regardless of max_labels.
        """
        enc, enc_lengths = self.encoder(feats, feat_lengths, deterministic)
        batch, t_out, _ = enc.shape
        blank = self.cfg.blank_id

        pstate = self.predictor.init_state(batch)
        pstate, ctx = self.predictor.step(
            pstate, jnp.zeros((batch,), jnp.int32))     # consume BOS

        def step(carry, t):
            hyp, n_hyp, pstate, ctx = carry
            enc_t = jax.lax.dynamic_slice_in_dim(enc, t, 1, axis=1)
            logit = self.joint(enc_t, ctx[:, None, :])[:, 0, 0, :]   # [B, V]
            tok = jnp.argmax(logit, axis=-1).astype(jnp.int32)
            emit = (tok != blank) & (t < enc_lengths) & (n_hyp < max_labels)
            hyp = jnp.where(
                emit[:, None] & (jnp.arange(max_labels)[None, :]
                                 == n_hyp[:, None]),
                tok[:, None], hyp)
            n_hyp = n_hyp + emit.astype(jnp.int32)
            new_pstate, new_ctx = self.predictor.step(pstate, tok)
            pstate_next = self._select_state(emit, new_pstate, pstate)
            ctx_next = jnp.where(emit[:, None], new_ctx, ctx)
            return (hyp, n_hyp, pstate_next, ctx_next), None

        init = (jnp.zeros((batch, max_labels), jnp.int32),
                jnp.zeros((batch,), jnp.int32), pstate, ctx)
        (hyp, n_hyp, _, _), _ = jax.lax.scan(step, init, jnp.arange(t_out))
        return hyp, n_hyp

    # ------------------------------------------------------------------
    # Chunked streaming inference (causal encoder + stateful greedy decode)
    # ------------------------------------------------------------------

    def streaming_init(self, batch: int, feat_dim: int, lookback: int,
                       max_labels: int):
        """Fresh streaming state for a batch of audio streams.

        lookback: input-frame history kept for exact recompute — size it
        with conformer.streaming_lookback(cfg.encoder); must be a multiple
        of the subsample factor. The state is a pytree (jit/scan friendly).
        """
        pstate = self.predictor.init_state(batch)
        pstate, ctx = self.predictor.step(
            pstate, jnp.zeros((batch,), jnp.int32))     # consume BOS
        return dict(
            self._stream_state_base(batch, feat_dim, lookback),
            pstate=pstate, ctx=ctx,
            hyp=jnp.zeros((batch, max_labels), jnp.int32),
            n_hyp=jnp.zeros((batch,), jnp.int32),
        )

    def _stream_state_base(self, batch: int, feat_dim: int, lookback: int):
        """Shared frame-window state (buffer / n_seen / valid) + validation."""
        sub = self.cfg.encoder.subsample_factor
        if lookback % sub:
            raise ValueError(f"lookback {lookback} not a multiple of the "
                             f"subsample factor {sub}")
        return {
            "buffer": jnp.zeros((batch, lookback, feat_dim), jnp.float32),
            "n_seen": jnp.zeros((), jnp.int32),          # frames pushed
            "valid": jnp.zeros((batch,), jnp.int32),     # true frames
        }

    def _stream_window(self, state, feat_chunk, chunk_valid):
        """Chunked exact-recompute shared by greedy and beam streaming.

        Window = [history | chunk], content left-aligned: early in the
        stream only `avail` history frames exist, and start-of-stream must
        look like start-of-utterance (left zero-pad + masks), not like
        attended-to garbage frames. Returns (emit_enc [B, C', D], abs_out0,
        out_total [B], updates) where `updates` holds the new buffer /
        n_seen / valid entries.
        """
        from .conformer import subsampled_length

        enc_cfg = self.cfg.encoder
        sub = enc_cfg.subsample_factor
        batch, chunk_t, _ = feat_chunk.shape
        if chunk_t % sub:
            raise ValueError(f"chunk frames {chunk_t} not a multiple of the "
                             f"subsample factor {sub}")
        if chunk_valid is None:
            chunk_valid = jnp.full((batch,), chunk_t, jnp.int32)
        lookback = state["buffer"].shape[1]
        c_out = chunk_t // sub

        avail = jnp.minimum(state["n_seen"], lookback)   # multiple of sub
        window = jnp.concatenate(
            [state["buffer"], feat_chunk.astype(jnp.float32)], axis=1)
        window = jnp.roll(window, -(lookback - avail), axis=1)
        s0 = state["n_seen"] - avail                     # abs frame of w[0]
        valid_new = state["valid"] + chunk_valid.astype(jnp.int32)
        win_lengths = jnp.clip(valid_new - s0, 0, avail + chunk_t)

        enc_win, _ = self.encoder(window, win_lengths, True,
                                  pos_offset=s0 // sub)
        emit_enc = jax.lax.dynamic_slice_in_dim(
            enc_win, avail // sub, c_out, axis=1)        # [B, C', D]

        abs_out0 = state["n_seen"] // sub
        out_total = subsampled_length(enc_cfg, valid_new)   # [B]
        updates = {
            "buffer": jnp.concatenate(
                [state["buffer"], feat_chunk.astype(jnp.float32)],
                axis=1)[:, -lookback:],
            "n_seen": state["n_seen"] + chunk_t,
            "valid": valid_new,
        }
        return emit_enc, abs_out0, out_total, updates

    def streaming_step(self, state, feat_chunk, chunk_valid=None):
        """Push one chunk of frames; returns (state, emitted [B, C'] ids).

        feat_chunk [B, C, F] with C a multiple of the subsample factor;
        chunk_valid [B] true frames in this chunk (default: all C — pad a
        stream that ended with zero-valid chunks). Exactness: with the
        causal encoder, bounded attn_left_context, and lookback >=
        streaming_lookback(cfg), the emitted hypothesis equals
        greedy_decode on the full utterance. Emitted ids are blank_id where
        nothing was emitted in that output frame.
        """
        blank = self.cfg.blank_id
        emit_enc, abs_out0, out_total, updates = self._stream_window(
            state, feat_chunk, chunk_valid)
        c_out = emit_enc.shape[1]
        max_labels = state["hyp"].shape[1]

        def step(carry, k):
            hyp, n_hyp, pstate, ctx = carry
            enc_t = jax.lax.dynamic_slice_in_dim(emit_enc, k, 1, axis=1)
            logit = self.joint(enc_t, ctx[:, None, :])[:, 0, 0, :]
            tok = jnp.argmax(logit, axis=-1).astype(jnp.int32)
            emit = ((tok != blank) & (abs_out0 + k < out_total)
                    & (n_hyp < max_labels))
            hyp = jnp.where(
                emit[:, None] & (jnp.arange(max_labels)[None, :]
                                 == n_hyp[:, None]),
                tok[:, None], hyp)
            n_hyp = n_hyp + emit.astype(jnp.int32)
            new_pstate, new_ctx = self.predictor.step(pstate, tok)
            pstate = self._select_state(emit, new_pstate, pstate)
            ctx = jnp.where(emit[:, None], new_ctx, ctx)
            return (hyp, n_hyp, pstate, ctx), jnp.where(emit, tok, blank)

        init = (state["hyp"], state["n_hyp"], state["pstate"], state["ctx"])
        (hyp, n_hyp, pstate, ctx), emitted = jax.lax.scan(
            step, init, jnp.arange(c_out))

        new_state = dict(updates, pstate=pstate, ctx=ctx, hyp=hyp,
                         n_hyp=n_hyp)
        return new_state, emitted.T                      # [B, C']

    def streaming_beam_init(self, batch: int, feat_dim: int, lookback: int,
                            max_labels: int, beam_size: int, lm=None):
        """Fresh streaming *beam* state (see streaming_init for sizing).

        With lm set (models/lm.py protocol), the state carries
        per-hypothesis LM states for shallow fusion; pass the same lm to
        every streaming_beam_step.
        """
        return dict(
            self._stream_state_base(batch, feat_dim, lookback),
            beam=self._beam_init_carry(batch, beam_size, max_labels, lm),
        )

    def streaming_beam_step(self, state, feat_chunk, chunk_valid=None,
                            lm=None, lm_weight: float = 0.0,
                            merge_paths: bool = False):
        """Push one chunk through streaming *beam search* (+ LM fusion).

        Returns (state, (tokens [B, K, cap], lengths [B, K],
        scores [B, K])) — the live beam after this chunk, unsorted (sort by
        score for display; with merge_paths the dead duplicate slots score
        -inf). The carried beam advances with the exact same frame step as
        beam_search_decode, so the final beam equals the full-utterance
        beam search exactly (same caveat as streaming_step: causal encoder,
        bounded attention, sufficient lookback).
        """
        emit_enc, abs_out0, out_total, updates = self._stream_window(
            state, feat_chunk, chunk_valid)
        c_out = emit_enc.shape[1]
        beam = state["beam"][1].shape[1]                 # n_hyp [B, K]
        cap = state["beam"][0].shape[2]

        def step(carry, k):
            enc_t = jax.lax.dynamic_slice_in_dim(emit_enc, k, 1,
                                                 axis=1)[:, 0]
            return self._beam_frame_step(
                carry, enc_t, abs_out0 + k < out_total, beam=beam, cap=cap,
                merge_paths=merge_paths, lm=lm, lm_weight=lm_weight), None

        new_beam, _ = jax.lax.scan(step, state["beam"], jnp.arange(c_out))
        new_state = dict(updates, beam=new_beam)
        return new_state, (new_beam[0], new_beam[1], new_beam[2])

    def beam_search_decode(self, feats, feat_lengths, max_labels: int,
                           beam_size: int, deterministic: bool = True,
                           merge_paths: bool = False, lm=None,
                           lm_weight: float = 0.0):
        """Frame-synchronous beam search.

        Monotonic RNN-T emits exactly one decision per frame, so the beam
        advances in lockstep over t: each live hypothesis expands into V
        candidates (blank keeps the hypothesis, a label appends), and the
        top beam_size by path score survive.

        merge_paths=False keeps duplicate label sequences (reached via
        different emission timings) as distinct hypotheses; the score is a
        single best path's log-probability — the beam analogue of
        viterbi_alignment. merge_paths=True LSE-merges duplicates each frame
        — sound within the beam, because at frame t a hypothesis's model
        state is fully determined by its label sequence — so the score
        approaches the sequence's marginal log-probability (-loss) as the
        beam widens. Duplicates are detected by a 64-bit rolling sequence
        fingerprint (O(K^2) per frame instead of comparing full token
        buffers); a collision falsely merging two distinct sequences has
        probability ~beam^2 / 2^64 per frame — negligible, but the merge
        is probabilistic, not bitwise-exact.

        lm/lm_weight: shallow fusion with an external language model
        following the models/lm.py protocol (init_state/step). Label
        candidates score logp_am + lm_weight * logp_lm; blank is never
        LM-scored. Per-hypothesis LM states ride the beam exactly like
        predictor states (gathered by parent, advanced on emission), so
        merge_paths stays sound: identical label sequences are in
        identical LM state. The reported scores include the LM terms.

        Returns (tokens [B, beam, max_labels], lengths [B, beam],
        scores [B, beam] log-probs), beams sorted best-first; beam_size=1
        with merge_paths=False reproduces greedy_decode.
        """
        enc, enc_lengths = self.encoder(feats, feat_lengths, deterministic)
        batch, t_out, _ = enc.shape

        init = self._beam_init_carry(batch, beam_size, max_labels, lm)

        def step(carry, t):
            enc_t = jax.lax.dynamic_slice_in_dim(enc, t, 1,
                                                 axis=1)[:, 0]    # [B, D]
            return self._beam_frame_step(
                carry, enc_t, t < enc_lengths, beam=beam_size,
                cap=max_labels, merge_paths=merge_paths, lm=lm,
                lm_weight=lm_weight), None

        out_carry, _ = jax.lax.scan(step, init, jnp.arange(t_out))
        tokens, n_hyp, score = out_carry[:3]
        if merge_paths:
            # Merging leaves dead slots interleaved; return best-first.
            order = jnp.argsort(-score, axis=1)
            tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
            n_hyp = jnp.take_along_axis(n_hyp, order, axis=1)
            score = jnp.take_along_axis(score, order, axis=1)
        return tokens, n_hyp, score

    # Per-lane multipliers of the beam's rolling sequence hash (two
    # independent 32-bit multiplicative hashes = one 64-bit fingerprint).
    _HASH_MULTS = (2654435761, 2246822507)

    def _beam_init_carry(self, batch: int, beam: int, cap: int, lm):
        """Fresh beam carry: (tokens, n_hyp, score, hseq, pstate, ctx[, lm...])."""
        from ..ops.helpers import NEG_INF

        assert self.cfg.vocab_size >= beam, \
            "beam_size must not exceed the vocabulary"
        pstate = self.predictor.init_state(batch * beam)
        pstate, ctx = self.predictor.step(
            pstate, jnp.zeros((batch * beam,), jnp.int32))   # consume BOS
        init = (jnp.zeros((batch, beam, cap), jnp.int32),
                jnp.zeros((batch, beam), jnp.int32),
                jnp.where(jnp.arange(beam)[None, :] == 0, 0.0,
                          NEG_INF).astype(jnp.float32)
                * jnp.ones((batch, 1), jnp.float32),
                jnp.zeros((batch, beam, 2), jnp.uint32),
                pstate, ctx)
        if lm is not None:
            init = init + lm.step(
                lm.init_state(batch * beam),
                jnp.zeros((batch * beam,), jnp.int32))       # consume BOS
        return init

    def _beam_frame_step(self, carry, enc_t, active_b, *, beam, cap,
                         merge_paths, lm, lm_weight):
        """Advance the beam by one encoder frame.

        carry: as built by _beam_init_carry; enc_t [B, D] this frame's
        encodings; active_b [B] bool — inactive samples are frozen (blank
        forced at score 0, so the hypothesis set is unchanged). Shared by
        beam_search_decode (scan over the utterance) and
        streaming_beam_step (scan over a chunk's emitted frames).
        """
        from ..ops.helpers import NEG_INF

        vocab = self.cfg.vocab_size
        blank = self.cfg.blank_id
        v_idx = jnp.arange(vocab, dtype=jnp.int32)
        frozen_logp = jnp.where(v_idx == blank, 0.0,
                                NEG_INF).astype(jnp.float32)
        if len(carry) != (8 if lm is not None else 6):
            raise ValueError(
                f"beam carry has {len(carry)} elements but lm is "
                f"{'set' if lm is not None else 'None'} — pass the same "
                f"`lm` to the init and to every step")
        if lm is None:
            tokens, n_hyp, score, hseq, pstate, ctx = carry
        else:
            (tokens, n_hyp, score, hseq, pstate, ctx, lm_state,
             lm_logp) = carry
        batch = tokens.shape[0]
        enc_dim = enc_t.shape[-1]

        def gather_parents(x, parent):
            """Reorder [B*K, ...] leaves by the beam's parent indices."""
            xk = x.reshape(batch, beam, *x.shape[1:])
            idx = parent.reshape(batch, beam,
                                 *([1] * (x.ndim - 1)))
            out = jnp.take_along_axis(xk, idx, axis=1)
            return out.reshape(batch * beam, *x.shape[1:])

        enc_bk = jnp.broadcast_to(
            enc_t[:, None, None], (batch, beam, 1, enc_dim)).reshape(
                batch * beam, 1, enc_dim)
        logits = self.joint(enc_bk, ctx[:, None, :])[:, 0, 0, :]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(batch, beam, vocab)
        if lm is not None and lm_weight != 0.0:
            # Shallow fusion on label candidates only: blank keeps the
            # hypothesis, so the label-sequence LM has nothing to say.
            # Skipped entirely at weight 0 — lm_logp may contain -inf
            # (forbidden continuations), and 0 * -inf is NaN, which would
            # silently corrupt the beam instead of being an exact identity.
            fuse = jnp.where(v_idx[None, None, :] == blank, 0.0,
                             lm_weight
                             * lm_logp.reshape(batch, beam, vocab))
            logp = logp + fuse
        logp = jnp.where(active_b[:, None, None], logp,
                         frozen_logp[None, None, :])

        cand = score[:, :, None] + logp              # [B,K,V]
        full = (n_hyp >= cap)[:, :, None] & (v_idx != blank)[None, None]
        cand = jnp.where(full, NEG_INF, cand)
        top_scores, top_idx = jax.lax.top_k(
            cand.reshape(batch, beam * vocab), beam)
        parent = top_idx // vocab                    # [B,K]
        tok = (top_idx % vocab).astype(jnp.int32)

        par_tokens = jnp.take_along_axis(tokens, parent[:, :, None],
                                         axis=1)
        par_n = jnp.take_along_axis(n_hyp, parent, axis=1)
        # Dead beams (score -inf, e.g. fewer finite candidates than
        # beam_size) must not fabricate tokens: only finite-scoring
        # non-blank selections emit.
        emit = (tok != blank) & (top_scores > NEG_INF)
        slot = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
        new_tokens = jnp.where(
            emit[:, :, None] & (slot == par_n[:, :, None]),
            tok[:, :, None], par_tokens)
        new_n = par_n + emit.astype(jnp.int32)

        # Rolling sequence hash riding the beam: two independent 32-bit
        # multiplicative hashes per hypothesis, each updated h <- h*M +
        # (tok+1) on emission. Duplicate detection then compares the
        # 64-bit fingerprint instead of the full [K, K, cap] token cube —
        # O(K^2) per frame instead of O(K^2 * cap); collision odds are
        # ~K^2 / 2^64 per frame (one-in-1e15 over a billion frames).
        mults = jnp.asarray(self._HASH_MULTS, jnp.uint32)
        par_h = jnp.take_along_axis(hseq, parent[:, :, None], axis=1)
        new_h = jnp.where(emit[:, :, None],
                          par_h * mults
                          + (tok[:, :, None] + 1).astype(jnp.uint32),
                          par_h)

        if merge_paths:
            # Hypotheses with identical label sequences are in identical
            # model state (same predictor history, same frame): merge
            # exactly by summing probabilities into the lowest-index
            # representative and killing the duplicates. Equal length +
            # equal fingerprint <=> equal sequence (modulo the collision
            # bound above).
            alive = top_scores > NEG_INF
            dup = (new_n[:, :, None] == new_n[:, None, :]) & jnp.all(
                new_h[:, :, None] == new_h[:, None, :], axis=-1)
            dup = dup & alive[:, :, None] & alive[:, None, :]
            group = jnp.where(dup, top_scores[:, None, :], NEG_INF)
            merged = jax.nn.logsumexp(group, axis=-1)
            k_idx = jnp.arange(beam)
            has_earlier = jnp.any(
                dup & (k_idx[None, :, None] > k_idx[None, None, :]),
                axis=-1)
            top_scores = jnp.where(alive & ~has_earlier, merged, NEG_INF)

        # Reorder predictor state by parent, then advance where emitted.
        par_state = jax.tree.map(lambda x: gather_parents(x, parent),
                                 pstate)
        par_ctx = gather_parents(ctx, parent)
        stepped, stepped_ctx = self.predictor.step(
            par_state, tok.reshape(batch * beam))
        emit_flat = emit.reshape(batch * beam)
        next_state = self._select_state(emit_flat, stepped, par_state)
        next_ctx = jnp.where(emit_flat[:, None], stepped_ctx, par_ctx)
        if lm is None:
            return (new_tokens, new_n, top_scores, new_h, next_state,
                    next_ctx)
        # LM states ride the beam exactly like predictor states.
        par_lm = jax.tree.map(lambda x: gather_parents(x, parent),
                              lm_state)
        par_lm_logp = gather_parents(lm_logp, parent)
        stepped_lm, stepped_logp = lm.step(par_lm,
                                           tok.reshape(batch * beam))
        next_lm = self._select_state(emit_flat, stepped_lm, par_lm)
        next_lm_logp = jnp.where(emit_flat[:, None], stepped_logp,
                                 par_lm_logp)
        return (new_tokens, new_n, top_scores, new_h, next_state, next_ctx,
                next_lm, next_lm_logp)
