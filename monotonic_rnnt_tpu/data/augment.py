"""SpecAugment: time/frequency masking for acoustic features.

The standard transducer-training augmentation (Park et al., 2019 —
retrieved-technique reference, PAPERS.md), as a pure jittable function:
static shapes, masks built from iota comparisons, per-sample randomness
from one PRNG key. Time masks are drawn inside each sample's valid length;
frequency masks span the whole band. Zero-fill matches the encoder's
padding convention (ConvSubsampler masks padded frames to zero vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masks(key, batch: int, num: int, bound, width_cap, size: int):
    """[B, size] bool — union of `num` random [start, start+width) bands.

    bound: [B] per-sample upper limit for mask placement (masks stay
    inside [0, bound)); width ~ U{0..width_cap[b]},
    start ~ U{0..bound-width} inclusive (the last valid index is maskable).
    """
    kw, ks = jax.random.split(key)
    widths = jax.random.randint(kw, (batch, num), 0, 1 << 30) \
        % (width_cap[:, None] + 1)
    span = jnp.maximum(bound[:, None] - widths + 1, 1)
    starts = (jax.random.randint(ks, (batch, num), 0, 1 << 30) % span)
    idx = jnp.arange(size, dtype=jnp.int32)[None, None, :]
    band = (idx >= starts[..., None]) & (idx < (starts + widths)[..., None])
    return jnp.any(band, axis=1)                       # [B, size]


def spec_augment(key, feats, feat_lengths, *, num_time_masks: int = 2,
                 max_time_width: int = 40, max_time_frac: float = 0.2,
                 num_freq_masks: int = 2, max_freq_width: int = 27):
    """Apply SpecAugment to feats [B, T, F]; returns masked features.

    Each sample gets `num_time_masks` zero bands of width
    U{0..min(max_time_width, max_time_frac * valid_frames)} placed inside
    its valid frames — the proportional cap (Park et al.'s p·τ) keeps short
    utterances from being masked away entirely — and `num_freq_masks` bands
    of width U{0..max_freq_width} over the feature axis. Identity when all
    counts are 0. Use a fresh key per step (fold_in the step index).
    """
    batch, t_max, feat_dim = feats.shape
    kt, kf = jax.random.split(jax.random.fold_in(key, 0))
    keep = jnp.ones((batch, t_max, 1), feats.dtype)
    if num_time_masks > 0:
        flen = jnp.asarray(feat_lengths, jnp.int32)
        cap = jnp.minimum(max_time_width,
                          (max_time_frac * flen).astype(jnp.int32))
        tmask = _masks(kt, batch, num_time_masks, flen, cap, t_max)
        keep = keep * (1.0 - tmask[:, :, None].astype(feats.dtype))
    out = feats * keep
    if num_freq_masks > 0:
        fdim = jnp.full((batch,), feat_dim, jnp.int32)
        cap = jnp.minimum(max_freq_width, fdim)
        fmask = _masks(kf, batch, num_freq_masks, fdim, cap, feat_dim)
        out = out * (1.0 - fmask[:, None, :].astype(feats.dtype))
    return out
