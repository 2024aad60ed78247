"""The long-utterance recipe end to end: align, then train restricted at O(W).

Demonstrates the workflow the alignment-restricted mode exists for
(reference README "Alignment restriction"; here with every stage on the
packed band layout):

  1. warm up the tiny transducer unrestricted for a few steps;
  2. Viterbi-align the training batch with the current model;
  3. build a band around those alignments and continue training through the
     banded fused-joint loss — joint matmuls AND loss scale with the band
     width W, not S+1;
  4. periodically re-align *inside the band* with the packed-layout Viterbi
     (viterbi_alignment_banded), so the full lattice never exists after
     step 1.

Synthetic data; loss values printed per phase. Runs on whatever JAX sees.

  python examples/realign_restrict.py [--warmup 40] [--restricted 80]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--warmup", type=int, default=40)
    p.add_argument("--restricted", type=int, default=80)
    p.add_argument("--shift", type=int, default=3)
    p.add_argument("--realign-every", type=int, default=25)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import monotonic_rnnt_tpu as mr
    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)
    from monotonic_rnnt_tpu.models.train import \
        make_banded_memory_efficient_loss

    vocab = 32
    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=1, dim=64, num_heads=2,
                                dropout=0.0, dtype=jnp.float32),
        predictor=PredictorConfig(vocab_size=vocab, dim=64, embed_dim=32,
                                  dtype=jnp.float32),
        joint_dim=64, vocab_size=vocab, dtype=jnp.float32)
    model = MonotonicTransducer(cfg)
    batch = tuple(jnp.asarray(a) for a in tiny_batch(
        batch=4, t=64, feat_dim=16, s=6, vocab=vocab))
    feats, flen, labels, slen = batch
    params = model.init(jax.random.PRNGKey(0), *batch)["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    # --- Phase 1: unrestricted warmup (overfit one batch). ------------------
    def unrestricted_loss(p):
        return jnp.mean(model.apply({"params": p}, *batch))

    @jax.jit
    def warm_step(p, s):
        loss, g = jax.value_and_grad(unrestricted_loss)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    for i in range(args.warmup):
        params, opt_state, loss = warm_step(params, opt_state)
        if i % 10 == 0:
            print(f"[warmup]     step {i:3d}  loss {float(loss):8.4f}")

    # --- Phase 2: align with the current model (full lattice, once). --------
    encode = jax.jit(lambda p, f, l: model.apply(
        {"params": p}, f, l, True, method=lambda m, f_, l_, d: m.encode(f_,
                                                                        l_,
                                                                        d)))
    logits_fn = jax.jit(lambda p, f, l, la: model.apply(
        {"params": p}, f, l, la, True,
        method=lambda m, f_, l_, la_, d: m.logits(f_, l_, la_, d)))

    logits, enc_lengths = logits_fn(params, feats, flen, labels)
    res = jax.jit(mr.viterbi_alignment)(logits, labels, enc_lengths, slen)
    print(f"[align]      viterbi score {np.asarray(res.score).round(3)}")

    t_enc, s1 = logits.shape[1], labels.shape[1] + 1
    bands = mr.bands_from_alignment(res.alignment, enc_lengths, slen,
                                    args.shift, cfg.blank_id)
    width = int(mr.required_band_width(enc_lengths, slen, bands, t_enc, s1))
    print(f"[align]      band width {width} vs S+1={s1}")

    # --- Phase 3: banded training; re-align inside the band. ----------------
    # The width is a static (compile-time) parameter, so everything that
    # bakes it in is built by this factory — growing the width later is a
    # rebuild + recompile, never a silent behavior change.
    def build_banded_fns(width):
        banded_loss = make_banded_memory_efficient_loss(
            model, band_width=width, chunk_t=16)

        @jax.jit
        def banded_step(p, s, bmin, bmax):
            loss, g = jax.value_and_grad(
                lambda p_: banded_loss(p_, batch, mr.Bands(bmin, bmax)))(p)
            updates, s = opt.update(g, s)
            return optax.apply_updates(p, updates), s, loss

        @jax.jit
        def realign(p, bmin, bmax):
            enc, el = encode(p, feats, flen)
            pred = model.apply({"params": p}, labels, True,
                               method=lambda m, la, d: m.predictor(la, d))
            layout = mr.compute_band_layout(el, slen, mr.Bands(bmin, bmax),
                                            enc.shape[1], s1, width)
            idx = layout.offset[:, :, None] + jnp.arange(width)[None, None, :]
            pred_band = jnp.take_along_axis(pred[:, None, :, :],
                                            idx[..., None], axis=2)
            lb = model.apply({"params": p}, enc, pred_band, True,
                             method=lambda m, e, pb, d: m.joint.banded(e, pb))
            return mr.viterbi_alignment_banded(lb, labels, el, slen,
                                               bands=mr.Bands(bmin, bmax))

        return banded_step, realign

    banded_step, realign = build_banded_fns(width)
    for i in range(args.restricted):
        params, opt_state, loss = banded_step(params, opt_state,
                                              bands.min_s, bands.max_s)
        if i % 10 == 0:
            print(f"[restricted] step {i:3d}  loss {float(loss):8.4f}")
        if (i + 1) % args.realign_every == 0:
            res = realign(params, bands.min_s, bands.max_s)
            bands = mr.bands_from_alignment(res.alignment, enc_lengths, slen,
                                            args.shift, cfg.blank_id)
            # A new alignment can need a wider window than the one the
            # static width was sized for (label clustering changes the
            # span). Silently training on a clipped band would change the
            # objective — grow the width (one recompile) instead.
            if not np.asarray(mr.band_layout_is_exact(
                    enc_lengths, slen, bands, t_enc, s1, width)).all():
                width = int(mr.required_band_width(enc_lengths, slen, bands,
                                                   t_enc, s1))
                banded_step, realign = build_banded_fns(width)
                print(f"[realign]    band width grown to {width}")
            print(f"[realign]    step {i:3d}  packed viterbi score "
                  f"{np.asarray(res.score).round(3)}")

    print(f"done: final restricted loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
