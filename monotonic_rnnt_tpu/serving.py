"""Deployment export: serialize entry points to portable StableHLO artifacts.

jax.export captures a jitted function as versioned StableHLO bytes that any
PJRT runtime (TPU server, CPU box, another process without this package)
can deserialize and execute — the TPU-native analogue of shipping the
reference's `libmonotonic_rnnt.so` + headers to embedders
(/root/reference/CMakeLists.txt:85-93, rnnt_entrypoint.h:24-25): the
artifact IS the compiled contract, with shapes and dtypes checked at call
time.

The convenience exporters below lower the pure-XLA oracle path
(`backend="reference"`), which is platform-polymorphic — one artifact
serves both `cpu` and `tpu`. Export a Pallas-backed function only for a
single `("tpu",)` platform.

    blob = export_loss(logits, labels, ilen, slen)        # bytes
    Path("loss.mlir").write_bytes(blob)
    ...
    loss_fn = import_fn(Path("loss.mlir").read_bytes())
    costs, grads = loss_fn(logits, labels, ilen, slen)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.export
import jax.numpy as jnp


def _spec(x):
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def export_fn(fn: Callable, example_args: Tuple,
              platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize jit(fn) at example_args' shapes/dtypes to StableHLO bytes.

    platforms: lowering targets (e.g. ("tpu", "cpu")); None = the default
    export platform of this process.
    """
    exp = jax.export.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms is not None else None,
    )(*jax.tree.map(_spec, tuple(example_args)))
    return bytes(exp.serialize())


def import_fn(blob: bytes) -> Callable:
    """Deserialize an export_fn artifact into a jitted callable."""
    return jax.jit(jax.export.deserialize(blob).call)


def export_loss(example_logits, example_labels, example_input_lengths,
                example_label_lengths, *, blank_id: int = 0,
                platforms: Sequence[str] = ("tpu", "cpu"),
                backend: str = "reference") -> bytes:
    """Export the monotonic RNN-T loss with gradients.

    The artifact computes (costs [B], dlogits) in one call — the same
    contract as the reference's C entry point (costs + per-logit grads,
    src/rnnt_entrypoint.cpp:16-48), shape-specialized to the example batch.

    backend: "reference" (default) lowers the platform-polymorphic XLA
    oracle — one artifact serves every platform in `platforms`. "pallas"
    embeds the fused TPU kernels (the deferred-gradient route) and
    requires platforms=("tpu",); parity with the live pipeline is checked
    on-chip each round (scripts/tpu_acceptance.py).
    """
    from .ops.loss import monotonic_rnnt_loss

    if backend == "pallas" and tuple(platforms) != ("tpu",):
        raise ValueError("backend='pallas' exports must use "
                         "platforms=('tpu',)")

    def fn(logits, labels, input_lengths, label_lengths):
        costs, vjp = jax.vjp(
            lambda lg: monotonic_rnnt_loss(
                lg, labels, input_lengths, label_lengths,
                blank_id=blank_id, backend=backend),
            logits)
        grads, = vjp(jnp.ones_like(costs))
        return costs, grads

    return export_fn(fn, (example_logits, example_labels,
                          example_input_lengths, example_label_lengths),
                     platforms)


def export_banded_loss(example_logits_band, example_labels,
                       example_input_lengths, example_label_lengths,
                       example_band_min, example_band_max, *,
                       blank_id: int = 0,
                       platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Export the packed band-layout loss (costs + packed-layout dlogits).

    The long-utterance serving artifact: takes the [B, T, W, V] band tensor
    plus Bands arrays (ops/bands.py), returns (costs, dlogits_band) — e.g.
    for alignment-restricted rescoring outside this package.
    """
    from .ops.banded import monotonic_rnnt_loss_banded
    from .ops.bands import Bands

    def fn(logits_band, labels, input_lengths, label_lengths, band_min,
           band_max):
        costs, vjp = jax.vjp(
            lambda lb: monotonic_rnnt_loss_banded(
                lb, labels, input_lengths, label_lengths,
                bands=Bands(band_min, band_max), blank_id=blank_id,
                backend="reference"),
            logits_band)
        grads, = vjp(jnp.ones_like(costs))
        return costs, grads

    return export_fn(fn, (example_logits_band, example_labels,
                          example_input_lengths, example_label_lengths,
                          example_band_min, example_band_max), platforms)


def export_greedy_decoder(model, example_params, example_feats,
                          example_feat_lengths, max_labels: int,
                          platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Export a transducer's greedy decoder as a serving artifact.

    The artifact takes (params, feats [B,T,F], feat_lengths [B]) and
    returns (hyp [B, max_labels], hyp_lengths [B]); pair it with an orbax
    checkpoint for the weights (params stay an argument so one artifact
    serves every checkpoint of the model).
    """
    def fn(params, feats, feat_lengths):
        return model.apply(params, feats, feat_lengths, max_labels,
                           method="greedy_decode")

    return export_fn(fn, (example_params, example_feats,
                          example_feat_lengths), platforms)


def export_streaming_decoder(model, example_params, batch: int,
                             feat_dim: int, chunk_frames: int,
                             max_labels: int,
                             platforms: Sequence[str] = ("tpu", "cpu")):
    """Export one streaming_step as an artifact, plus its initial state.

    Returns (blob, init_state): the artifact takes (params, state,
    feat_chunk [B, C, F], chunk_valid [B]) and returns (state, emitted);
    the serving loop feeds each returned state back in. The lookback is
    sized from conformer.streaming_lookback (exact-recompute guarantee).
    """
    from .models.conformer import streaming_lookback

    lookback = streaming_lookback(model.cfg.encoder)
    init_state = model.apply(example_params, batch, feat_dim, lookback,
                             max_labels, method="streaming_init")
    chunk = jax.ShapeDtypeStruct((batch, chunk_frames, feat_dim),
                                 jnp.float32)
    cv = jax.ShapeDtypeStruct((batch,), jnp.int32)

    def fn(params, state, feat_chunk, chunk_valid):
        return model.apply(params, state, feat_chunk, chunk_valid,
                           method="streaming_step")

    return export_fn(fn, (example_params, init_state, chunk, cv),
                     platforms), init_state
