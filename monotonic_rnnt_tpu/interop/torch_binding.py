"""PyTorch binding (API-compatible with the reference's pytorch_binding).

Mirrors the reference's public torch surface (monotonic_rnnt_op.py:121-217):
`monotonic_rnnt_loss(acts, labels, input_lengths, label_lengths,
alignment=None, max_distance_from_alignment=0, blank_label=0)` over the
packed activation layout, and a `MonotonicRNNTLoss` nn.Module. The forward
pass produces the gradients (forward-backward computes both jointly);
backward is the per-sample chain rule

    dacts = grad_costs.repeat_interleave(T_b * (S_b + 1))[:, None] * grads

exactly as in the reference (monotonic_rnnt_op.py:96-118). Compute runs on
the native C++ engine (native/mrnnt.cpp); no CUDA path — for accelerator
execution use the JAX API, which is the framework's TPU surface.

Note: the reference's MonotonicRNNTLoss module references `self.blank` while
its ctor sets `self.blank_label` (a latent AttributeError,
monotonic_rnnt_op.py:176/214); this implementation fixes that.
"""

from __future__ import annotations

import numpy as np

try:
    import torch
except ImportError:  # pragma: no cover - torch is baked into the image
    torch = None

from ..native import rnnt_loss_native


def _require_torch():
    if torch is None:
        raise ImportError("torch is not available in this environment")


class _MonotonicRNNTFunction(torch.autograd.Function if torch else object):

    @staticmethod
    def forward(ctx, acts, labels, input_lengths, label_lengths, alignment,
                max_distance_from_alignment, blank_label):
        if acts.device.type != "cpu":
            raise ValueError(
                "the torch binding runs on CPU; use the JAX API "
                "(monotonic_rnnt_tpu.monotonic_rnnt_loss) for accelerators")
        # Cost-only fast path (skips the beta recursion and the gradient
        # buffer entirely) when autograd will never call backward. grad mode
        # is always off inside Function.forward, so is_grad_enabled() can't
        # be used; ctx.needs_input_grad already folds it in.
        needs_grad = ctx.needs_input_grad[0]
        costs_np, grads_np = rnnt_loss_native(
            acts.detach().numpy(), labels.detach().numpy(),
            input_lengths.detach().numpy(), label_lengths.detach().numpy(),
            blank_id=blank_label,
            alignment=None if alignment is None
            else alignment.detach().numpy(),
            max_distance_from_alignment=max_distance_from_alignment,
            with_grads=needs_grad)
        if needs_grad:
            ctx.save_for_backward(torch.from_numpy(grads_np), input_lengths,
                                  label_lengths)
        return torch.from_numpy(costs_np)

    @staticmethod
    def backward(ctx, grad_costs):
        grads, input_lengths, label_lengths = ctx.saved_tensors
        repeats = (input_lengths * (label_lengths + 1)).to(torch.long)
        scale = grad_costs.to(grads.dtype).repeat_interleave(repeats)
        return scale.unsqueeze(1) * grads, None, None, None, None, None, None


def monotonic_rnnt_loss(acts, labels, input_lengths, label_lengths,
                        alignment=None, max_distance_from_alignment: int = 0,
                        blank_label: int = 0):
    """Reference-compatible packed-layout torch loss.

    acts: [sum_b T_b*(S_b+1), V] float32 CPU tensor; labels [B, S_max] int32;
    lengths int32 [B]. Returns per-sample costs [B] (differentiable).
    """
    _require_torch()
    return _MonotonicRNNTFunction.apply(
        acts, labels, input_lengths, label_lengths, alignment,
        max_distance_from_alignment, blank_label)


class MonotonicRNNTLoss(torch.nn.Module if torch else object):
    """Module wrapper with optional reduction (reference API parity)."""

    def __init__(self, blank_label: int = 0, reduction: str = "mean"):
        _require_torch()
        super().__init__()
        if reduction not in ("none", "mean", "sum"):
            raise ValueError(f"bad reduction {reduction!r}")
        self.blank_label = blank_label
        self.reduction = reduction

    def forward(self, acts, labels, input_lengths, label_lengths,
                alignment=None, max_distance_from_alignment: int = 0):
        costs = monotonic_rnnt_loss(
            acts, labels, input_lengths, label_lengths, alignment,
            max_distance_from_alignment, self.blank_label)
        if self.reduction == "mean":
            return costs.mean()
        if self.reduction == "sum":
            return costs.sum()
        return costs
