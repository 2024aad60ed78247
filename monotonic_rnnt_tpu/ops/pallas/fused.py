"""Fused Pallas monotonic RNN-T loss pipeline (TPU hot path).

Orchestrates the three kernels in ops/pallas/kernels.py. HBM traffic:
  stats: read logits once                   (B*T*S1*V elements)
  DP:    read/write only [B, T, S1] arrays  (negligible, V-free)
  grad:  read logits once, write grads once
Total = 2 reads + 1 write of the big tensor — the algorithmic minimum given
the DP dependency between the softmax statistics and the gradient.

Everything between kernels (band masks, occupancy coefficients, ll gather) is
O(B*T*S1) elementwise work left to XLA fusion.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...utils.config import get_config
from ...utils.debug import emit_loss_debug
from ..bands import Bands, default_bands, lattice_masks
from ..helpers import NEG_INF, extend_labels, mask_to_additive
from ..reference import occupancy_coefficients
from .kernels import alpha_scan, beta_scan, dp_tiles, grad_pass, softmax_stats


def rnnt_loss_pallas(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    input_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    bands: Optional[Bands] = None,
    with_grads: bool = True,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Monotonic RNN-T costs (+ logit grads) via the fused Pallas pipeline.

    Same contract as ops.reference.rnnt_loss_reference.
    """
    cfg = get_config()
    if interpret is None:
        interpret = cfg.interpret
    batch, t_max, s1, v = logits.shape
    ilen = input_lengths.astype(jnp.int32)
    slen = label_lengths.astype(jnp.int32)
    if bands is None:
        bands = default_bands(ilen, slen, t_max)
    masks = lattice_masks(ilen, slen, bands, t_max, s1)
    labels_ext = extend_labels(labels, slen, s1)

    denom, lp_blank, lpl_raw = softmax_stats(logits, labels_ext, blank_id,
                                             interpret=interpret)
    s_idx = jnp.arange(s1, dtype=jnp.int32)[None, None, :]
    valid_s = s_idx < slen[:, None, None]
    lp_label = jnp.where(valid_s, lpl_raw, NEG_INF)

    # The DP kernels require full blocks: pad B to a multiple of the batch
    # tile and T to a multiple of the time tile. Only the small [B, T, S1]
    # arrays are padded — the big logits tensor never is.
    bt, b_pad, tt, t_pad = dp_tiles(batch, t_max, s1)

    def _pad_small(x, fill):
        return jnp.pad(x, ((0, b_pad - batch), (0, t_pad - t_max), (0, 0)),
                       constant_values=fill)

    lpb_p = _pad_small(lp_blank, 0.0)
    lpl_p = _pad_small(lp_label, 0.0)
    amask_p = _pad_small(mask_to_additive(masks.alpha), NEG_INF)

    alphas = alpha_scan(lpb_p, lpl_p, amask_p, interpret=interpret,
                        tiles=(bt, tt))[:batch, :t_max]
    ll_fwd = jnp.take_along_axis(
        jnp.take_along_axis(alphas, jnp.clip(ilen - 1, 0)[:, None, None],
                            axis=1)[:, 0, :],
        slen[:, None], axis=1)[:, 0]
    costs = -ll_fwd
    if not with_grads:
        return costs, None

    beta_virtual = mask_to_additive(
        jnp.arange(s1, dtype=jnp.int32)[None, :] == slen[:, None])
    bmask_p = _pad_small(mask_to_additive(masks.beta), NEG_INF)
    ilen_p = jnp.pad(ilen, (0, b_pad - batch), constant_values=1)
    bvirt_p = jnp.pad(beta_virtual, ((0, b_pad - batch), (0, 0)),
                      constant_values=NEG_INF)
    betas = beta_scan(lpb_p, lpl_p, bmask_p, ilen_p[:, None, None], bvirt_p,
                      interpret=interpret, tiles=(bt, tt))[:batch, :t_max]

    occ, cb, cl = occupancy_coefficients(alphas, betas, ll_fwd, ilen, slen)
    # Write grads in the logits dtype: for bf16 training this halves the
    # gradient write traffic and saves the VJP's downstream cast pass (the
    # DP itself always accumulated in f32 above).
    grads = grad_pass(logits, denom, occ, cb, cl, labels_ext, blank_id,
                      out_dtype=logits.dtype, interpret=interpret)
    emit_loss_debug(ll_fwd, betas[:, 0, 0], grads)
    return costs, grads
