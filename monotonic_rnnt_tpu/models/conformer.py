"""Conformer encoder (flax.linen), bf16-friendly and MXU-shaped.

The reference ships no models — it is a loss library wired into external
toolkits (RETURNN/RASR transducers). This module provides the Conformer
acoustic encoder the BASELINE north-star asks to wire the loss into
(BASELINE.json: "Conformer-transducer on LibriSpeech ... loss as training
criterion"), built TPU-first: feature dims padded to MXU-friendly multiples,
matmuls in bf16 with f32 accumulation, no data-dependent control flow.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    num_layers: int = 4
    dim: int = 256
    num_heads: int = 4
    ff_expansion: int = 4
    conv_kernel: int = 15
    subsample_factor: int = 4       # two stride-2 convs
    dropout: float = 0.1
    causal: bool = False            # streaming mode: no future context
    attn_left_context: int = -1     # causal attention window (-1 = all past)
    remat: bool = False             # rematerialize blocks in the backward
    dtype: jnp.dtype = jnp.bfloat16  # compute dtype; params stay f32


class FeedForward(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, deterministic: bool):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=cfg.dtype)(x)
        y = nn.Dense(cfg.dim * cfg.ff_expansion, dtype=cfg.dtype)(y)
        y = nn.swish(y)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)
        y = nn.Dense(cfg.dim, dtype=cfg.dtype)(y)
        return nn.Dropout(cfg.dropout)(y, deterministic=deterministic)


class ConvModule(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=cfg.dtype)(x)
        y = nn.Dense(2 * cfg.dim, dtype=cfg.dtype)(y)
        y = nn.glu(y, axis=-1)
        # Mask padding immediately before the depthwise conv: Dense biases
        # re-populate padded frames, and the kernel-15 conv would leak them
        # into valid frames (encoder output must be padding-independent).
        y = y * pad_mask[..., None].astype(y.dtype)
        # Streaming mode: left-only padding so frame t never sees t+1..
        conv_pad = ([(cfg.conv_kernel - 1, 0)] if cfg.causal else "SAME")
        y = nn.Conv(cfg.dim, (cfg.conv_kernel,), feature_group_count=cfg.dim,
                    padding=conv_pad, dtype=cfg.dtype)(y)
        y = nn.LayerNorm(dtype=cfg.dtype)(y)  # stands in for masked batchnorm
        y = nn.swish(y)
        y = nn.Dense(cfg.dim, dtype=cfg.dtype)(y)
        return nn.Dropout(cfg.dropout)(y, deterministic=deterministic)


class MHSA(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        cfg = self.cfg
        y = nn.LayerNorm(dtype=cfg.dtype)(x)
        attn_mask = pad_mask[:, None, None, :]  # [B, 1, 1, T]
        if cfg.causal:
            t = x.shape[1]
            q_idx = jnp.arange(t)[:, None]
            k_idx = jnp.arange(t)[None, :]
            causal_ok = k_idx <= q_idx
            if cfg.attn_left_context >= 0:
                causal_ok &= (q_idx - k_idx) <= cfg.attn_left_context
            attn_mask = attn_mask & causal_ok[None, None]   # [B,1,T,T]
        y = nn.MultiHeadDotProductAttention(
            num_heads=cfg.num_heads, dtype=cfg.dtype,
            dropout_rate=cfg.dropout)(
                y, y, mask=attn_mask, deterministic=deterministic)
        return nn.Dropout(cfg.dropout)(y, deterministic=deterministic)


class ConformerBlock(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        x = x + 0.5 * FeedForward(self.cfg)(x, deterministic)
        x = x + MHSA(self.cfg)(x, pad_mask, deterministic)
        x = x + ConvModule(self.cfg)(x, pad_mask, deterministic)
        x = x + 0.5 * FeedForward(self.cfg)(x, deterministic)
        return nn.LayerNorm(dtype=self.cfg.dtype)(x)


def _subsample_stages(factor: int) -> int:
    if factor < 1 or 2 ** (int(factor).bit_length() - 1) != factor:
        raise ValueError(f"subsample_factor must be a power of 2, got {factor}")
    return int(factor).bit_length() - 1


def _stage_length(n):
    """Frame count after ONE stride-2 subsampler stage — the single source
    of the per-stage formula; subsampled_length and ConvSubsampler's
    per-stage re-masking both consume it."""
    return (n - 1) // 2 + 1


def subsampled_length(cfg: ConformerConfig, n):
    """Input-frame count -> encoder output-frame count ((n-1)//2+1 per stage).

    THE length contract of the strided subsampler — the encoder's pad masks
    and the streaming emit gate must use this exact formula.
    """
    for _ in range(_subsample_stages(cfg.subsample_factor)):
        n = _stage_length(n)
    return n


class ConvSubsampler(nn.Module):
    """log2(subsample_factor) stride-2 2D convs over (time, freq)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats, feat_lengths):
        cfg = self.cfg
        x = feats[..., None]                      # [B, T, F, 1]
        # Streaming mode pads time on the left only (SAME pads both sides).
        tpad = [(2, 0), (1, 1)] if cfg.causal else "SAME"
        lengths = feat_lengths
        for _ in range(_subsample_stages(cfg.subsample_factor)):
            x = nn.Conv(cfg.dim // 4, (3, 3), strides=(2, 2),
                        padding=tpad, dtype=cfg.dtype)(x)
            x = nn.relu(x)
            # Re-mask after every strided stage: conv bias + ReLU re-populate
            # padded frames and the next stage's boundary would read them.
            lengths = _stage_length(lengths)
            stage_mask = (jnp.arange(x.shape[1])[None, :]
                          < lengths[:, None])
            x = x * stage_mask[:, :, None, None].astype(x.dtype)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        return nn.Dense(cfg.dim, dtype=cfg.dtype)(x)


def streaming_lookback(cfg: ConformerConfig) -> int:
    """Input-frame history needed for exact chunked streaming inference.

    One emitted output frame's receptive field: each of the L blocks adds
    attn_left_context (masked attention) + conv_kernel-1 (causal depthwise
    conv) output frames; the strided subsampler multiplies by
    subsample_factor and adds its own kernel context (≤ 2·factor input
    frames). Requires a bounded attention window (attn_left_context ≥ 0) —
    with unbounded causal attention the exact receptive field is the whole
    stream. Returned value is a multiple of subsample_factor (the chunked
    recompute keeps window offsets subsample-aligned).
    """
    if not cfg.causal:
        raise ValueError("streaming requires causal=True")
    if cfg.attn_left_context < 0:
        raise ValueError("exact streaming requires a bounded "
                         "attn_left_context (>= 0)")
    rf_out = cfg.num_layers * (cfg.attn_left_context + cfg.conv_kernel - 1)
    return (rf_out + 2) * cfg.subsample_factor


def sinusoidal_positions(t: int, dim: int, offset=0) -> jnp.ndarray:
    """[t, dim] fixed sinusoidal position encodings (f32), from `offset`.

    `offset` may be a traced scalar — chunked streaming recomputes a sliding
    window whose absolute start position moves with the stream.
    """
    pos = (jnp.arange(t, dtype=jnp.float32) + offset)[:, None]
    half = dim // 2
    inv_freq = jnp.exp(-jnp.log(10000.0)
                       * jnp.arange(half, dtype=jnp.float32) / half)
    angles = pos * inv_freq[None, :]
    pe = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    if pe.shape[-1] < dim:                     # odd dim
        pe = jnp.pad(pe, ((0, 0), (0, dim - pe.shape[-1])))
    return pe


class ConformerEncoder(nn.Module):
    """feats [B, T, F] + frame lengths -> (encodings [B, T', D], lengths')."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats, feat_lengths, deterministic: bool = True,
                 pos_offset=0):
        """pos_offset: absolute output-frame index of feats' first frame
        (in subsampled time) — nonzero only for chunked streaming windows."""
        cfg = self.cfg
        # Zero out padded input frames first: the strided subsampling convs
        # would otherwise leak arbitrary padding values into the last valid
        # frames (the loss layer promises padding-independence).
        in_mask = (jnp.arange(feats.shape[1])[None, :]
                   < feat_lengths[:, None])
        feats = feats * in_mask[..., None].astype(feats.dtype)
        x = ConvSubsampler(cfg)(feats, feat_lengths)
        # Inject position: self-attention is otherwise permutation-invariant
        # (the conv modules alone give only short-range order).
        x = x + sinusoidal_positions(x.shape[1], cfg.dim,
                                     pos_offset).astype(x.dtype)
        out_lengths = subsampled_length(cfg, feat_lengths)
        t_out = x.shape[1]
        pad_mask = (jnp.arange(t_out)[None, :]
                    < out_lengths[:, None]).astype(jnp.bool_)
        x = x * pad_mask[..., None].astype(x.dtype)
        # remat trades ~1 extra forward of each block for not storing its
        # activations across the backward — the jax.checkpoint lever for
        # fitting longer utterances / bigger batches (static_argnums: the
        # deterministic flag is a Python bool, not a tracer).
        block_cls = (nn.remat(ConformerBlock, static_argnums=(3,))
                     if cfg.remat else ConformerBlock)
        for i in range(cfg.num_layers):
            # Explicit names: nn.remat would otherwise prefix the module
            # path ("CheckpointConformerBlock_i"), silently breaking
            # checkpoint compatibility between remat on/off.
            x = block_cls(cfg, name=f"ConformerBlock_{i}")(
                x, pad_mask, deterministic)
        return x.astype(jnp.float32), out_lengths
