"""End-to-end example: train a tiny Conformer-transducer with the monotonic
RNN-T loss on synthetic data, then decode.

Runs on whatever JAX sees — one TPU chip, a CPU, or a multi-chip mesh (the
train step is shard_map'd over the 'data' axis; batch must divide by the
device count).

  python examples/train_tiny.py [--steps 30] [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--beam", type=int, default=4)
    p.add_argument("--overfit", action="store_true",
                   help="repeat one batch: loss should collapse and the "
                        "decoders should reproduce the targets")
    p.add_argument("--json-out", default=None,
                   help="write the loss curve + decode accuracy as JSON")
    p.add_argument("--seed", type=int, default=0,
                   help="data + init seed (recorded in the JSON provenance)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monotonic_rnnt_tpu.data.synthetic import SyntheticConfig, SyntheticDataset
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)
    from monotonic_rnnt_tpu.models.train import (create_train_state,
                                                 make_sharded_train_step)
    from monotonic_rnnt_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    batch = args.batch - args.batch % n_dev or n_dev
    print(f"devices: {n_dev} ({jax.default_backend()}), batch {batch}")

    vocab = 64
    data = SyntheticDataset(
        SyntheticConfig(feat_dim=32, min_frames=32, max_frames=64,
                        frames_per_label=10.0, vocab_size=vocab,
                        seed=args.seed),
        batch_size=batch)
    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=2, dim=96, num_heads=4,
                                dropout=0.0),
        predictor=PredictorConfig(vocab_size=vocab, dim=96, embed_dim=48),
        joint_dim=96, vocab_size=vocab)

    it = data.batches()
    first_batch = next(it)
    if args.overfit:
        it = iter(lambda: first_batch, None)   # same batch forever
    example = tuple(jnp.asarray(a) for a in first_batch)
    state = create_train_state(cfg, jax.random.PRNGKey(args.seed), example,
                               learning_rate=3e-3, warmup_steps=5)
    mesh = make_mesh(data=n_dev, model=1)
    step = make_sharded_train_step(mesh)
    model = MonotonicTransducer(cfg)
    greedy = jax.jit(lambda p, f, l: model.apply(
        p, f, l, 6, method=MonotonicTransducer.greedy_decode))

    def label_accuracy(params, batch_np):
        """1 - normalized edit distance of greedy decodes vs targets."""
        feats, flen, labels, slen = (jnp.asarray(a) for a in batch_np)
        hyp, n_hyp = greedy({"params": params}, feats, flen)
        hyp, n_hyp = np.asarray(hyp), np.asarray(n_hyp)
        labels, slen = np.asarray(labels), np.asarray(slen)
        accs = []
        for b in range(hyp.shape[0]):
            ref, out = labels[b, :slen[b]], hyp[b, :n_hyp[b]]
            dp = np.arange(len(out) + 1, dtype=np.int32)
            for r in ref:
                prev, dp[0] = dp[0], dp[0] + 1
                for j1 in range(1, len(out) + 1):
                    cur = min(dp[j1] + 1, dp[j1 - 1] + 1,
                              prev + (r != out[j1 - 1]))
                    prev, dp[j1] = dp[j1], cur
            accs.append(1.0 - dp[-1] / max(1, len(ref)))
        return float(np.mean(accs))

    curve, acc_curve = [], []
    first = last = None
    acc0 = label_accuracy(state.params, first_batch)
    for i in range(args.steps):
        batch_np = next(it)
        state, metrics = step(state, tuple(jnp.asarray(a) for a in batch_np))
        loss = float(metrics["loss"])
        first = first if first is not None else loss
        last = loss
        if i % 10 == 0 or i == args.steps - 1:
            curve.append({"step": i, "loss": round(loss, 4)})
        if i % 50 == 0 or i == args.steps - 1:
            acc = label_accuracy(state.params, first_batch)
            acc_curve.append({"step": i, "label_acc": round(acc, 4)})
            print(f"step {i:3d}  loss {loss:8.4f}  label_acc {acc:.3f}")
        elif i % 5 == 0:
            print(f"step {i:3d}  loss {loss:8.4f}")
    print(f"loss {first:.4f} -> {last:.4f} over {args.steps} steps")
    if args.json_out:
        import json

        from monotonic_rnnt_tpu.utils.provenance import provenance_stamp

        Path(args.json_out).write_text(json.dumps({
            "device": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "steps": args.steps, "batch": batch, "overfit": args.overfit,
            "loss_first": round(first, 4), "loss_last": round(last, 4),
            "label_acc_init": round(acc0, 4),
            "label_acc_final": acc_curve[-1]["label_acc"],
            "loss_curve": curve, "label_acc_curve": acc_curve,
            "provenance": provenance_stamp(seed=args.seed),
        }, indent=1) + "\n")

    # Decode the last batch, greedy and beam.
    feats, flen, labels, slen = (jnp.asarray(a) for a in batch_np)
    hyp, n_hyp = greedy({"params": state.params}, feats, flen)
    tok, n_b, score = jax.jit(lambda p, f, l: model.apply(
        p, f, l, 6, args.beam,
        method=MonotonicTransducer.beam_search_decode))(
            {"params": state.params}, feats, flen)
    for b in range(min(2, hyp.shape[0])):
        print(f"sample {b}: target {np.asarray(labels[b, :slen[b]])} | "
              f"greedy {np.asarray(hyp[b, :n_hyp[b]])} | "
              f"beam-{args.beam} {np.asarray(tok[b, 0, :n_b[b, 0]])} "
              f"(logp {float(score[b, 0]):.2f})")


if __name__ == "__main__":
    main()
