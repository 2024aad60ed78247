"""End-to-end training-step throughput of the flagship Conformer-transducer.

Complements bench.py (the loss kernel alone): here the step includes the
encoder/predictor/joint forward, the fused loss, and the full backward +
optimizer update — the MXU matmuls dominate, with the loss's lattice passes
riding along. The optimizer state update makes every step data-dependent on
the previous one, so timing K steps wall-to-wall is honest even through an
async dispatch tunnel.

  python benchmarks/train_bench.py [--steps 20] [--batch 16] [--frames 400]
      [--layers 4] [--dim 256] [--vocab 1024] [--bf16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--frames", type=int, default=400)
    p.add_argument("--labels", type=int, default=25)
    p.add_argument("--feat-dim", type=int, default=80)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--vocab", type=int, default=1024)
    p.add_argument("--f32", action="store_true",
                   help="f32 model compute (default bf16)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json-out", default=None,
                   help="write a provenance-stamped JSON record (TRAIN_rNN)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import TransducerConfig
    from monotonic_rnnt_tpu.models.train import (create_train_state,
                                                 train_step)

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=args.layers, dim=args.dim,
                                num_heads=max(2, args.dim // 64),
                                dropout=0.0, dtype=dtype),
        predictor=PredictorConfig(vocab_size=args.vocab, dim=args.dim,
                                  embed_dim=args.dim // 2, dtype=dtype),
        joint_dim=args.dim, vocab_size=args.vocab, dtype=dtype)

    rng = np.random.RandomState(args.seed)
    B, T, S = args.batch, args.frames, args.labels
    feats = jnp.asarray(rng.randn(B, T, args.feat_dim).astype(np.float32))
    flen = jnp.full((B,), T, jnp.int32)
    labels = jnp.asarray(rng.randint(1, args.vocab, (B, S)).astype(np.int32))
    slen = jnp.full((B,), S, jnp.int32)
    batch = (feats, flen, labels, slen)

    n_dev = len(jax.devices())
    state = create_train_state(cfg, jax.random.PRNGKey(args.seed), batch)

    # K steps inside ONE jit (per-call dispatch through an async tunnel would
    # otherwise dominate); the optimizer update chains the steps, so nothing
    # can be elided. Single-device here — the sharded step is exercised by
    # examples/train_tiny.py and the dryrun.
    @jax.jit
    def run(st, batch):
        def body(i, carry):
            new_state, metrics = train_step(carry[0], batch)
            return (new_state, metrics["loss"])

        return jax.lax.fori_loop(0, args.steps, body, (st, jnp.float32(0)))

    (state, loss) = run(state, batch)              # compile + warm
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    (state, loss) = run(state, batch)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.steps

    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(state.params))
    frames_per_s = B * T / dt
    # 10 ms frame hop -> audio-seconds processed per wall-second.
    rtf = frames_per_s * 0.01
    print(f"model: {args.layers}x{args.dim} conformer-transducer, "
          f"V={args.vocab}, {n_params / 1e6:.1f}M params, "
          f"{'f32' if args.f32 else 'bf16'}")
    print(f"step: B={B} T={T} S={S} on {n_dev} device(s) "
          f"({jax.devices()[0].device_kind})")
    print(f"{dt * 1e3:.2f} ms/step | {frames_per_s / 1e3:.1f} kframes/s | "
          f"{rtf:.0f}x realtime (10ms hop) | "
          f"loss {float(loss):.3f}")
    if args.json_out:
        import json

        from monotonic_rnnt_tpu.utils.provenance import provenance_stamp

        Path(args.json_out).write_text(json.dumps({
            "model": f"{args.layers}x{args.dim} conformer-transducer",
            "vocab": args.vocab,
            "params_M": round(float(n_params) / 1e6, 2),
            "dtype": "f32" if args.f32 else "bf16",
            "shape": {"B": B, "T": T, "S": S},
            "steps": args.steps,
            "ms_per_step": round(dt * 1e3, 3),
            "kframes_per_s": round(frames_per_s / 1e3, 2),
            "realtime_x_10ms_hop": round(rtf, 1),
            "final_loss": round(float(loss), 6),
            "n_devices": n_dev,
            "provenance": provenance_stamp(seed=args.seed),
        }, indent=1) + "\n")
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
