"""Serving-side decoding throughput of the Conformer-transducer.

The reference is a training-loss library with no decoder; this benchmarks the
framework's own serving surface: frame-synchronous greedy and beam search
(models/transducer.py) — encoder forward + one joint evaluation per frame
with the predictor advanced statefully.

Timing: K data-dependent iterations inside ONE jit (each iteration folds the
previous hypothesis lengths back into the features), measured at two loop
lengths to subtract the tunnel's fixed per-dispatch cost (~30 ms):
utils/profiling.corrected_args_loop_bench, the variant that passes params as
jit arguments so weights are never baked in as constants.

  python benchmarks/decode_bench.py [--batch 16] [--frames 400] [--layers 4]
      [--dim 256] [--vocab 1024] [--beam 4] [--iters 20] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--feat-dim", type=int, default=80)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--vocab", type=int, default=1024)
    p.add_argument("--max-labels", type=int, default=50)
    p.add_argument("--beam", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--f32", action="store_true")
    p.add_argument("--stream-chunk", type=int, default=32,
                   help="streaming chunk size in 10ms frames")
    p.add_argument("--attn-left", type=int, default=16,
                   help="causal attention window for the streaming model")
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=args.layers, dim=args.dim,
                                num_heads=max(2, args.dim // 64),
                                dropout=0.0, dtype=dtype),
        predictor=PredictorConfig(vocab_size=args.vocab, dim=args.dim,
                                  embed_dim=args.dim // 2, dtype=dtype),
        joint_dim=args.dim, vocab_size=args.vocab, dtype=dtype)
    model = MonotonicTransducer(cfg)

    rng = np.random.RandomState(0)
    B, T = args.batch, args.frames
    feats = jnp.asarray(rng.randn(B, T, args.feat_dim).astype(np.float32))
    flen = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.randint(1, args.vocab, (B, 8)).astype(np.int32))
    slen = jnp.full((B,), 8, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels,
                        slen)["params"]

    def greedy_run(iters):
        @jax.jit
        def run(params, feats, flen):
            def body(i, carry):
                f, acc = carry
                f = f.at[0, 0, 0].add((acc * 1e-20).astype(f.dtype))
                _, n_hyp = model.apply(
                    {"params": params}, f, flen, args.max_labels,
                    method="greedy_decode")
                return (f, jnp.sum(n_hyp).astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body,
                                     (feats, jnp.float32(0)))[1]

        return lambda *a: run(*a)

    def beam_run(iters):
        @jax.jit
        def run(params, feats, flen):
            def body(i, carry):
                f, acc = carry
                f = f.at[0, 0, 0].add((acc * 1e-20).astype(f.dtype))
                _, n_hyp, scores = model.apply(
                    {"params": params}, f, flen, args.max_labels, args.beam,
                    method="beam_search_decode")
                return (f, (jnp.sum(n_hyp) + jnp.sum(scores))
                        .astype(jnp.float32))

            return jax.lax.fori_loop(0, iters, body,
                                     (feats, jnp.float32(0)))[1]

        return lambda *a: run(*a)

    from monotonic_rnnt_tpu.utils.profiling import corrected_args_loop_bench

    t_greedy = corrected_args_loop_bench(greedy_run, (params, feats, flen),
                                         args.iters)
    t_beam = corrected_args_loop_bench(beam_run, (params, feats, flen),
                                       args.iters)

    # Streaming: per-chunk latency of exact chunked inference on the causal
    # model (the serving metric — how far behind real time each 10ms-hop
    # chunk lands). The carried state makes the loop data-dependent.
    from monotonic_rnnt_tpu.models.conformer import streaming_lookback

    s_cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=args.layers, dim=args.dim,
                                num_heads=max(2, args.dim // 64),
                                dropout=0.0, causal=True,
                                attn_left_context=args.attn_left,
                                dtype=dtype),
        predictor=PredictorConfig(vocab_size=args.vocab, dim=args.dim,
                                  embed_dim=args.dim // 2, dtype=dtype),
        joint_dim=args.dim, vocab_size=args.vocab, dtype=dtype)
    s_model = MonotonicTransducer(s_cfg)
    s_params = s_model.init(jax.random.PRNGKey(0), feats, flen, labels,
                            slen)["params"]
    lookback = streaming_lookback(s_cfg.encoder)
    chunk = feats[:, :args.stream_chunk]
    cv = jnp.full((B,), args.stream_chunk, jnp.int32)
    state0 = s_model.apply({"params": s_params}, B, args.feat_dim, lookback,
                           args.max_labels, method="streaming_init")

    def stream_run(iters):
        @jax.jit
        def run(params, state, chunk, cv):
            def body(i, st):
                st2, _ = s_model.apply({"params": params}, st, chunk, cv,
                                       method="streaming_step")
                return st2
            return jax.lax.fori_loop(0, iters, body, state)["ctx"].sum()

        return lambda *a: run(*a)

    t_stream = corrected_args_loop_bench(
        stream_run, (s_params, state0, chunk, cv), args.iters)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    # 10 ms frame hop -> audio seconds decoded per wall second.
    rtf_greedy = B * T * 0.01 / t_greedy
    rtf_beam = B * T * 0.01 / t_beam
    result = {
        "metric": (f"greedy decode throughput (B={B},T={T},"
                   f"{args.layers}x{args.dim},V={args.vocab},"
                   f"{'f32' if args.f32 else 'bf16'})"),
        "value": round(rtf_greedy, 1),
        "unit": "x realtime (10ms hop)",
        "greedy_ms_per_batch": round(t_greedy * 1e3, 3),
        "beam_ms_per_batch": round(t_beam * 1e3, 3),
        "beam_size": args.beam,
        "beam_x_realtime": round(rtf_beam, 1),
        "params_m": round(n_params / 1e6, 1),
        "max_labels": args.max_labels,
        "streaming_ms_per_chunk": round(t_stream * 1e3, 3),
        "streaming_chunk_frames": args.stream_chunk,
        "streaming_lookback_frames": lookback,
        "streaming_x_realtime": round(
            B * args.stream_chunk * 0.01 / t_stream, 1),
        "device": jax.devices()[0].device_kind,
    }
    from monotonic_rnnt_tpu.utils.provenance import provenance_stamp
    result["provenance"] = provenance_stamp(seed=0)
    line = json.dumps(result)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
