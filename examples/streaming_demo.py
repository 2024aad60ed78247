"""Streaming serving demo: overfit a causal transducer, then decode it
chunk by chunk as audio "arrives", printing the incremental hypothesis.

Shows the serving loop a real-time recognizer runs: one jitted
streaming_step per chunk, carried state (feature lookback + predictor +
hypothesis), bounded per-chunk latency. The final hypothesis is verified
against the full-utterance greedy decode — exact, token for token (the
property tests/test_models.py::test_streaming_decode_matches_full_greedy
asserts; here it's demonstrated on trained weights).

  python examples/streaming_demo.py [--steps 150] [--chunk 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=150,
                   help="overfit steps before the streaming decode")
    p.add_argument("--chunk", type=int, default=16,
                   help="chunk size in 10ms frames (160ms of audio)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.models.conformer import (ConformerConfig,
                                                     streaming_lookback)
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)
    from monotonic_rnnt_tpu.models.train import create_train_state, train_step

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=2, dim=64, num_heads=2,
                                dropout=0.0, causal=True,
                                attn_left_context=8, conv_kernel=7,
                                dtype=jnp.float32),
        predictor=PredictorConfig(vocab_size=32, dim=64, embed_dim=32,
                                  dtype=jnp.float32),
        joint_dim=64, vocab_size=32, dtype=jnp.float32)
    model = MonotonicTransducer(cfg)

    B, T, F, S, max_labels = 2, 128, 16, 6, 12
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=B, t=T, feat_dim=F, s=S, vocab=32))
    feats, flen, labels, slen = batch

    print(f"training {args.steps} steps on {jax.default_backend()} "
          f"(causal model, attn window {cfg.encoder.attn_left_context})...")
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                               learning_rate=3e-3, warmup_steps=1)
    step = jax.jit(train_step)
    metrics = None
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    if metrics is not None:
        print(f"final loss {float(metrics['loss']):.4f}")
    params = {"params": state.params}

    hyp_full, n_full = jax.jit(lambda p, f, fl: model.apply(
        p, f, fl, max_labels, method="greedy_decode"))(params, feats, flen)

    lookback = streaming_lookback(cfg.encoder)
    print(f"\nstreaming: {args.chunk}-frame chunks "
          f"({args.chunk * 10} ms), lookback {lookback} frames")
    sstate = model.apply(params, B, F, lookback, max_labels,
                         method="streaming_init")
    sstep = jax.jit(lambda p, st, ch, cv: model.apply(
        p, st, ch, cv, method="streaming_step"))
    # warm the compile so printed latencies are steady-state
    sstate_w, _ = sstep(params, sstate, feats[:, :args.chunk],
                        jnp.full((B,), args.chunk, jnp.int32))
    jax.block_until_ready(sstate_w["ctx"])

    for i in range(0, T, args.chunk):
        cv = jnp.clip(flen - i, 0, args.chunk)
        t0 = time.perf_counter()
        sstate, emitted = sstep(params, sstate, feats[:, i:i + args.chunk],
                                cv)
        jax.block_until_ready(emitted)
        dt = (time.perf_counter() - t0) * 1e3
        hyp0 = [int(x) for x in
                np.asarray(sstate["hyp"][0][:int(sstate["n_hyp"][0])])]
        print(f"  t={i * 10 + args.chunk * 10:5d} ms | chunk {dt:6.2f} ms "
              f"wall (incl. dispatch overhead; see decode_bench for "
              f"compute) | stream 0 hypothesis: {hyp0}")

    ok = (np.array_equal(np.asarray(sstate["hyp"]), np.asarray(hyp_full))
          and np.array_equal(np.asarray(sstate["n_hyp"]), np.asarray(n_full)))
    print(f"\nstreaming == full-utterance greedy decode: "
          f"{'exact' if ok else 'MISMATCH'}")
    for b in range(B):
        tgt = [int(x) for x in np.asarray(labels[b][:int(slen[b])])]
        got = [int(x) for x in
               np.asarray(sstate["hyp"][b][:int(sstate["n_hyp"][b])])]
        print(f"  stream {b}: target {tgt} -> decoded {got}")
    if not ok:
        raise SystemExit("streaming mismatch")


if __name__ == "__main__":
    main()
