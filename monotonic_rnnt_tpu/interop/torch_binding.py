"""PyTorch binding (API-compatible with the reference's pytorch_binding).

Mirrors the reference's public torch surface (monotonic_rnnt_op.py:121-217):
`monotonic_rnnt_loss(acts, labels, input_lengths, label_lengths,
alignment=None, max_distance_from_alignment=0, blank_label=0)` over the
packed activation layout, and a `MonotonicRNNTLoss` nn.Module. The forward
pass produces the gradients (forward-backward computes both jointly);
backward is the per-sample chain rule

    dacts = grad_costs.repeat_interleave(T_b * (S_b + 1))[:, None] * grads

exactly as in the reference (monotonic_rnnt_op.py:96-118). Two engines:

  * packed layout (`monotonic_rnnt_loss`): the native C++ engine on CPU
    tensors — the reference's CPU binding role;
  * padded layout (`monotonic_rnnt_loss_padded`): the JAX engine through a
    dlpack bridge — torch tensors run the framework's accelerator path (the
    fused Pallas pipeline when the default JAX backend is TPU), the role of
    the reference's GPU torch binding (pytorch_binding/monotonic_rnnt.cu:
    81-114). CPU torch tensors cross into JAX zero-copy via dlpack.

Note: the reference's MonotonicRNNTLoss module references `self.blank` while
its ctor sets `self.blank_label` (a latent AttributeError,
monotonic_rnnt_op.py:176/214); this implementation fixes that.
"""

from __future__ import annotations

import functools

import numpy as np

try:
    import torch
except ImportError:  # pragma: no cover - torch is baked into the image
    torch = None

from ..native import rnnt_loss_native


def _require_torch():
    if torch is None:
        raise ImportError("torch is not available in this environment")


def _packed_jax_fwd(acts, labels, input_lengths, label_lengths, alignment,
                    max_distance_from_alignment, blank_label, needs_grad):
    """Packed torch tensors -> JAX padded engine -> packed numpy outputs.

    The accelerator route of the packed layout (the reference's GPU packed
    binding role, pytorch_binding/monotonic_rnnt.cu:81-114): unpack to the
    padded [B, T, S1, V] layout on the host indices, run the framework's
    engine (fused Pallas pipeline when a TPU is attached), repack the
    gradients. Exact packed signature in, exact packed gradients out.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.bands import bands_from_alignment, default_bands
    from ..ops.loss import _resolve_backend
    from ..ops.packing import pack_acts, unpack_acts

    ilen = input_lengths.detach().cpu().numpy().astype(np.int32)
    slen = label_lengths.detach().cpu().numpy().astype(np.int32)
    x = unpack_acts(_torch_to_jax(acts), ilen, slen)
    default_dev = jax.devices()[0]
    if default_dev.platform != "cpu":
        x = jax.device_put(x, default_dev)
    # Bucket-padded metadata: the packed acts fix T_max = max(ilen) and
    # S_max = max(slen), but callers (like the native engine and the
    # reference binding) may pad labels / alignment wider — slice them to
    # the derived widths so both engines accept the same inputs.
    labels_np = labels.detach().cpu().numpy().astype(np.int32)
    la = jnp.asarray(labels_np[:, :x.shape[2] - 1])
    il, sl = jnp.asarray(ilen), jnp.asarray(slen)
    if alignment is not None:
        align_np = alignment.detach().cpu().numpy().astype(np.int32)
        bands = bands_from_alignment(
            jnp.asarray(align_np[:, :x.shape[1]]),
            il, sl, max_distance_from_alignment, blank_label)
    else:
        bands = default_bands(il, sl, x.shape[1])
    fn = _jax_loss_fn(int(blank_label), _resolve_backend(None), needs_grad)
    costs, grads = fn(x, la, il, sl, bands.min_s, bands.max_s)
    costs_np = np.array(jax.device_get(costs), dtype=np.float32)
    if not needs_grad:
        return costs_np, None
    grads_packed = pack_acts(grads.astype(jnp.float32), ilen, slen)
    return costs_np, np.array(jax.device_get(grads_packed), dtype=np.float32)


class _MonotonicRNNTFunction(torch.autograd.Function if torch else object):

    @staticmethod
    def forward(ctx, acts, labels, input_lengths, label_lengths, alignment,
                max_distance_from_alignment, blank_label, engine):
        # Cost-only fast path (skips the beta recursion and the gradient
        # buffer entirely) when autograd will never call backward. grad mode
        # is always off inside Function.forward, so is_grad_enabled() can't
        # be used; ctx.needs_input_grad already folds it in.
        needs_grad = ctx.needs_input_grad[0]
        if engine == "native":
            costs_np, grads_np = rnnt_loss_native(
                acts.detach().numpy(), labels.detach().numpy(),
                input_lengths.detach().numpy(),
                label_lengths.detach().numpy(),
                blank_id=blank_label,
                alignment=None if alignment is None
                else alignment.detach().numpy(),
                max_distance_from_alignment=max_distance_from_alignment,
                with_grads=needs_grad)
        else:
            costs_np, grads_np = _packed_jax_fwd(
                acts, labels, input_lengths, label_lengths, alignment,
                max_distance_from_alignment, blank_label, needs_grad)
        ctx._orig_device = acts.device
        if needs_grad:
            ctx.save_for_backward(torch.from_numpy(grads_np),
                                  input_lengths.cpu(), label_lengths.cpu())
        return torch.from_numpy(costs_np).to(acts.device)

    @staticmethod
    def backward(ctx, grad_costs):
        grads, input_lengths, label_lengths = ctx.saved_tensors
        repeats = (input_lengths * (label_lengths + 1)).to(torch.long)
        scale = grad_costs.detach().cpu().to(
            grads.dtype).repeat_interleave(repeats)
        return ((scale.unsqueeze(1) * grads).to(ctx._orig_device), None,
                None, None, None, None, None, None)


def monotonic_rnnt_loss(acts, labels, input_lengths, label_lengths,
                        alignment=None, max_distance_from_alignment: int = 0,
                        blank_label: int = 0, engine: str = None):
    """Reference-compatible packed-layout torch loss.

    acts: [sum_b T_b*(S_b+1), V] float32 tensor; labels [B, S_max] int32;
    lengths int32 [B]. Returns per-sample costs [B] on acts' device
    (differentiable).

    engine: None = 'auto' (the native C++ engine for CPU tensors, the JAX
    engine — fused Pallas pipeline when a TPU is attached — for accelerator
    tensors, matching the reference's CPU/GPU dispatch), or force 'native' /
    'jax'.
    """
    _require_torch()
    if engine is None:
        engine = "native" if acts.device.type == "cpu" else "jax"
    if engine not in ("native", "jax"):
        raise ValueError(f"engine must be None, 'native' or 'jax'; "
                         f"got {engine!r}")
    if engine == "native" and acts.device.type != "cpu":
        raise ValueError("engine='native' needs CPU tensors; accelerator "
                         "tensors route through engine='jax'")
    return _MonotonicRNNTFunction.apply(
        acts, labels, input_lengths, label_lengths, alignment,
        max_distance_from_alignment, blank_label, engine)


# ---------------------------------------------------------------------------
# Padded-layout entry: torch -> (dlpack) -> JAX engine -> torch
# ---------------------------------------------------------------------------


def _torch_to_jax(t):
    """torch tensor -> jax array; zero-copy via dlpack for CPU tensors."""
    import jax

    t = t.detach().contiguous()
    if t.device.type == "cpu":
        try:
            return jax.dlpack.from_dlpack(t)
        except Exception:  # pragma: no cover - dlpack protocol mismatch
            pass
    return jax.numpy.asarray(t.cpu().numpy())


@functools.lru_cache(maxsize=None)
def _jax_loss_fn(blank_id: int, backend: str, with_grads: bool):
    """Jitted padded-layout loss for the bridge (cached per static config)."""
    import jax

    from ..ops.bands import Bands
    from ..ops.loss import _run

    def run(logits, labels, ilen, slen, band_min, band_max):
        return _run(logits, labels, ilen, slen, Bands(band_min, band_max),
                    blank_id, backend, with_grads)

    return jax.jit(run)


class _MonotonicRNNTPaddedFunction(torch.autograd.Function if torch
                                   else object):

    @staticmethod
    def forward(ctx, logits, labels, input_lengths, label_lengths, alignment,
                max_distance_from_alignment, blank_label, backend):
        import jax
        import jax.numpy as jnp

        from ..ops.bands import bands_from_alignment, default_bands
        from ..ops.loss import _resolve_backend

        x = _torch_to_jax(logits)
        # A dlpack-imported array is committed to the CPU device, which
        # would pin the jit (and the Pallas kernels) onto the CPU backend;
        # move it to the default device (the TPU when one is attached).
        default_dev = jax.devices()[0]
        if default_dev.platform != "cpu":
            x = jax.device_put(x, default_dev)
        la = jnp.asarray(labels.detach().cpu().numpy().astype(np.int32))
        il = jnp.asarray(input_lengths.detach().cpu().numpy()
                         .astype(np.int32))
        sl = jnp.asarray(label_lengths.detach().cpu().numpy()
                         .astype(np.int32))
        if alignment is not None:
            bands = bands_from_alignment(
                jnp.asarray(alignment.detach().cpu().numpy()
                            .astype(np.int32)),
                il, sl, max_distance_from_alignment, blank_label)
        else:
            bands = default_bands(il, sl, x.shape[1])
        needs_grad = ctx.needs_input_grad[0]
        fn = _jax_loss_fn(int(blank_label), _resolve_backend(backend),
                          needs_grad)
        costs, grads = fn(x, la, il, sl, bands.min_s, bands.max_s)
        # np.array copies: device_get may return read-only buffers that
        # torch.from_numpy would alias with a warning.
        costs_t = torch.from_numpy(np.array(jax.device_get(costs)))
        if needs_grad:
            g = torch.from_numpy(
                np.array(jax.device_get(grads), dtype=np.float32))
            ctx.save_for_backward(g)
            ctx._orig_device = logits.device
        return costs_t.to(logits.device)

    @staticmethod
    def backward(ctx, grad_costs):
        (grads,) = ctx.saved_tensors
        scale = grad_costs.detach().cpu().to(grads.dtype)[:, None, None, None]
        return ((scale * grads).to(ctx._orig_device), None, None, None, None,
                None, None, None)


def monotonic_rnnt_loss_padded(logits, labels, input_lengths, label_lengths,
                               alignment=None,
                               max_distance_from_alignment: int = 0,
                               blank_label: int = 0, backend=None):
    """Padded-layout torch loss running the JAX engine (TPU when available).

    logits: [B, T_max, S_max+1, V] float torch tensor (any device; CPU
    tensors bridge into JAX zero-copy via dlpack); labels [B, S_max] int;
    lengths int [B]. Returns per-sample costs [B] on logits' device,
    differentiable w.r.t. logits. backend as in the JAX API ('auto' default).
    """
    _require_torch()
    return _MonotonicRNNTPaddedFunction.apply(
        logits, labels, input_lengths, label_lengths, alignment,
        max_distance_from_alignment, blank_label, backend)


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
