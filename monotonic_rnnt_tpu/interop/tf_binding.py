"""TensorFlow binding (API-compatible with the reference's tensorflow_binding).

Mirrors the reference's public TF surface (register_op.py:20-72 and the
MonotonicRNNT / MonotonicRNNTAlignRestrict custom ops,
monotonic_rnnt_op.cu:16-41, monotonic_rnnt_op_align_restrict.cu:25-41):

  monotonic_rnnt_loss(acts, labels, input_lengths, label_lengths,
                      alignment=None, max_distance_from_alignment=0,
                      blank_label=0) -> costs [B]

over the packed activation layout ([sum_b T_b*(S_b+1), V]), with the
gradient registered as the reference does it — the forward produces logit
grads, backward is `tf.repeat(grad_loss, T_b*(S_b+1))[:, None] * grads`
(register_op.py:77-148). Compute runs on the native C++ engine
(native/mrnnt.cpp) through `tf.numpy_function`, so it works in both eager
and graph mode on CPU hosts — the same role the reference's compiled
`.so` op plays, without a TF build dependency.

For accelerator execution inside TF graphs there is additionally
`monotonic_rnnt_loss_padded`: the framework's padded-layout JAX loss
staged into TF via jax2tf, differentiable under `tf.GradientTape` and
jit-compilable with XLA (this is the TPU-native replacement for the
reference's CUDA kernel path inside the TF op).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:
    import tensorflow as tf
except ImportError:  # pragma: no cover - tf is baked into the image
    tf = None

from ..native import rnnt_loss_native


def _require_tf():
    if tf is None:
        raise ImportError("tensorflow is not available in this environment")


def _native_fwd(acts, labels, ilen, slen, align, max_dist, blank):
    # Adopt TF's intra-op thread pool size for the OpenMP engine, as the
    # reference's CPU TF op does (monotonic_rnnt_op.cu:182); 0 = the
    # engine's default when TF reports 0 (= "pick for me").
    threads = tf.config.threading.get_intra_op_parallelism_threads()
    costs, grads = rnnt_loss_native(
        acts, labels, ilen, slen, blank_id=int(blank),
        alignment=None if align.size == 0 else align,
        max_distance_from_alignment=int(max_dist), with_grads=True,
        num_threads=int(threads))
    return costs.astype(np.float32), grads.astype(np.float32)


def monotonic_rnnt_loss(
    acts,
    labels,
    input_lengths,
    label_lengths,
    alignment=None,
    max_distance_from_alignment: int = 0,
    blank_label: int = 0,
):
    """Reference-compatible packed-layout TF loss.

    Args:
      acts: packed 2-D float32 tensor [sum_b T_b*(S_b+1), V] of raw logits,
        row-major per sample exactly as the reference documents
        (register_op.py:32-39); softmax is applied internally.
      labels: [B, S_max] int32 padded label sequences (no blanks).
      input_lengths / label_lengths: [B] int32 per-sample T_b / S_b.
      alignment: optional [B, T_max] int32 reference alignment; selects the
        alignment-restricted variant (reference MonotonicRNNTAlignRestrict).
      max_distance_from_alignment: allowed band half-width around `alignment`.
      blank_label: vocabulary index of blank.

    Returns:
      [B] float32 per-sample negative log-likelihoods, differentiable w.r.t.
      acts (and only acts, matching register_op.py:77-148).
    """
    _require_tf()
    acts = tf.convert_to_tensor(acts, tf.float32)
    labels = tf.convert_to_tensor(labels, tf.int32)
    input_lengths = tf.convert_to_tensor(input_lengths, tf.int32)
    label_lengths = tf.convert_to_tensor(label_lengths, tf.int32)
    align_t = (tf.zeros([0, 0], tf.int32) if alignment is None
               else tf.convert_to_tensor(alignment, tf.int32))

    @tf.custom_gradient
    def _loss(acts_in):
        costs, grads = tf.numpy_function(
            _native_fwd,
            [acts_in, labels, input_lengths, label_lengths, align_t,
             np.int32(max_distance_from_alignment), np.int32(blank_label)],
            [tf.float32, tf.float32])
        costs.set_shape(input_lengths.shape)
        grads.set_shape(acts_in.shape)

        def grad_fn(grad_loss, variables=None):
            del variables
            repeats = input_lengths * (label_lengths + 1)
            scale = tf.expand_dims(tf.repeat(grad_loss, repeats, axis=0), 1)
            return scale * grads

        return costs, grad_fn

    return _loss(acts)


def _tf_platforms(backend):
    """Platforms to lower the jax2tf module for.

    The XLA reference backend lowers everywhere, so emit a multi-platform
    module (TF may execute on a CPU host even when jax's default backend is
    a TPU tunnel). The Pallas backend only lowers for TPU — a CPU-host TF
    runtime must pass backend="reference".
    """
    from ..ops.loss import _resolve_backend

    return (("tpu",) if _resolve_backend(backend) == "pallas"
            else ("cpu", "tpu"))


_PADDED_TF_FN = {}


def monotonic_rnnt_loss_padded(
    logits,
    labels,
    input_lengths,
    label_lengths,
    blank_label: int = 0,
    backend: Optional[str] = None,
):
    """Padded-layout loss as a native TF/XLA computation (via jax2tf).

    logits: [B, T_max, S_max+1, V] float tensor; other args as in the packed
    API. Differentiable under tf.GradientTape; compiles with jit_compile=True
    on TPU — the TF-graph equivalent of the framework's JAX entry point.
    """
    _require_tf()
    key = (int(blank_label), backend)
    if key not in _PADDED_TF_FN:
        from jax.experimental import jax2tf

        from ..ops.loss import monotonic_rnnt_loss as jax_loss

        def fn(logits, labels, ilen, slen):
            return jax_loss(logits, labels, ilen, slen,
                            blank_id=int(blank_label), backend=backend)

        _PADDED_TF_FN[key] = jax2tf.convert(
            fn, with_gradient=True,
            native_serialization_platforms=_tf_platforms(backend))
    return _PADDED_TF_FN[key](
        tf.convert_to_tensor(logits),
        tf.convert_to_tensor(labels, tf.int32),
        tf.convert_to_tensor(input_lengths, tf.int32),
        tf.convert_to_tensor(label_lengths, tf.int32))


_BANDED_TF_FN = {}


def monotonic_rnnt_loss_banded(
    logits_band,
    labels,
    input_lengths,
    label_lengths,
    band_min,
    band_max,
    blank_label: int = 0,
    backend: Optional[str] = None,
):
    """Packed band-layout loss as a native TF/XLA computation (via jax2tf).

    logits_band: [B, T_max, W, V] float tensor (ops/bands.py packed layout;
    pack with the JAX helpers or compute the joint directly on the band);
    band_min / band_max: [B, T_max] int32 Bands arrays. Differentiable under
    tf.GradientTape (gradients in the packed layout); compiles with
    jit_compile=True — the TF surface of the long-utterance fast path.
    """
    _require_tf()
    key = (int(blank_label), backend)
    if key not in _BANDED_TF_FN:
        from jax.experimental import jax2tf

        from ..ops.banded import monotonic_rnnt_loss_banded as jax_banded
        from ..ops.bands import Bands

        def fn(lb, labels, ilen, slen, bmin, bmax):
            return jax_banded(lb, labels, ilen, slen,
                              bands=Bands(bmin, bmax),
                              blank_id=int(blank_label), backend=backend)

        _BANDED_TF_FN[key] = jax2tf.convert(
            fn, with_gradient=True,
            native_serialization_platforms=_tf_platforms(backend))
    return _BANDED_TF_FN[key](
        tf.convert_to_tensor(logits_band),
        tf.convert_to_tensor(labels, tf.int32),
        tf.convert_to_tensor(input_lengths, tf.int32),
        tf.convert_to_tensor(label_lengths, tf.int32),
        tf.convert_to_tensor(band_min, tf.int32),
        tf.convert_to_tensor(band_max, tf.int32))


def make_tf_loss_module(blank_label: int = 0, backend: Optional[str] = None):
    """tf.Module exposing the XLA-native losses for tf.saved_model.save.

    The packed `monotonic_rnnt_loss` rides tf.numpy_function and is
    eager/in-process only — it cannot be serialized into a SavedModel. The
    jax2tf padded and banded paths below are pure XLA and can: trace them
    with concrete shapes (call once, or pass get_concrete_function results
    as `signatures=`), then save with
    tf.saved_model.SaveOptions(experimental_custom_gradients=True) to keep
    the registered gradients. This is the installable-artifact role of the
    reference's SavedModel-loadable TF op
    (tensorflow_binding/monotonic_rnnt_op.cu:140-190, CMakeLists.txt:139-144).
    """
    _require_tf()

    class _LossModule(tf.Module):
        @tf.function
        def padded(self, logits, labels, input_lengths, label_lengths):
            return monotonic_rnnt_loss_padded(
                logits, labels, input_lengths, label_lengths,
                blank_label=blank_label, backend=backend)

        @tf.function
        def banded(self, logits_band, labels, input_lengths, label_lengths,
                   band_min, band_max):
            return monotonic_rnnt_loss_banded(
                logits_band, labels, input_lengths, label_lengths,
                band_min, band_max, blank_label=blank_label, backend=backend)

    return _LossModule()


def make_tf_decoder_module(model, params, max_labels: int):
    """tf.Module bundling model weights (as tf.Variables) + greedy decode.

    The returned module's `decode(feats, feat_lengths)` is a tf.function
    over the jax2tf-staged greedy decoder with the params captured as
    module variables — exactly the shape tf.saved_model.save expects for a
    self-contained TF Serving artifact (weights inside the SavedModel, no
    JAX at load time).
    """
    _require_tf()
    import jax
    from jax.experimental import jax2tf

    def fn(p, feats, feat_lengths):
        return model.apply(p, feats, feat_lengths, max_labels,
                           method="greedy_decode")

    conv = jax2tf.convert(fn, native_serialization_platforms=("cpu", "tpu"))

    class _DecoderModule(tf.Module):
        def __init__(self):
            super().__init__()
            flat, treedef = jax.tree.flatten(
                jax.tree.map(np.asarray, params))
            self._treedef = treedef
            self._params = [tf.Variable(a, trainable=False,
                                        name=f"param_{i}")
                            for i, a in enumerate(flat)]

        @tf.function
        def decode(self, feats, feat_lengths):
            p = jax.tree.unflatten(self._treedef, list(self._params))
            return conv(p, feats, feat_lengths)

    return _DecoderModule()


def make_tf_greedy_decoder(model, max_labels: int):
    """TF-graph greedy decoder for the transducer model family (via jax2tf).

    Returns fn(params, feats [B,T,F], feat_lengths [B]) -> (hyp [B,
    max_labels], hyp_lengths [B]) as a native TF computation — wrap it in a
    tf.function / tf.Module with the params as tf.Variables to export a
    SavedModel for TF Serving. Multi-platform (cpu+tpu) lowering; the
    decode path is pure XLA so one module serves both.
    """
    _require_tf()
    from jax.experimental import jax2tf

    def fn(params, feats, feat_lengths):
        return model.apply(params, feats, feat_lengths, max_labels,
                           method="greedy_decode")

    conv = jax2tf.convert(fn, native_serialization_platforms=("cpu", "tpu"))

    def tf_fn(params, feats, feat_lengths):
        import jax

        return conv(jax.tree.map(tf.convert_to_tensor, params),
                    tf.convert_to_tensor(feats),
                    tf.convert_to_tensor(feat_lengths, tf.int32))

    return tf_fn
