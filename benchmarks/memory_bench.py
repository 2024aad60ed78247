"""Memory headroom: monolithic vs fused-joint loss at an OOM-grade shape.

Substantiates the fused-joint design claim (docs/DESIGN.md §9): at
B=4, T'=1024, S=63, V=8192 the [B, T, S+1, V] f32 logits tensor is 8 GiB —
with its gradient, past a 16 GiB chip — so the monolithic path OOMs while
the T-chunked fused path (which never materializes it) trains fine. Runs
both, records the outcome, fused step time, and (when the runtime exposes
allocator stats) peak bytes.

  python benchmarks/memory_bench.py [--frames 1024] [--labels 63]
      [--vocab 8192] [--batch 4] [--hidden 512] [--chunk-t 64]
      [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=1024)   # encoder frames T'
    p.add_argument("--labels", type=int, default=63)
    p.add_argument("--vocab", type=int, default=8192)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--enc-dim", type=int, default=512)
    p.add_argument("--pred-dim", type=int, default=512)
    p.add_argument("--chunk-t", type=int, default=64)
    p.add_argument("--skip-monolithic", action="store_true",
                   help="only measure the fused path")
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from monotonic_rnnt_tpu.ops.chunked import rnnt_loss_fused_joint

    B, T, S, V, H = (args.batch, args.frames, args.labels, args.vocab,
                     args.hidden)
    rng = np.random.RandomState(0)
    enc = jnp.asarray(rng.randn(B, T, args.enc_dim).astype(np.float32) * .1)
    pred = jnp.asarray(
        rng.randn(B, S + 1, args.pred_dim).astype(np.float32) * .1)
    labels = jnp.asarray(rng.randint(1, V, (B, S)).astype(np.int32))
    ilen = jnp.full((B,), T, jnp.int32)
    slen = jnp.full((B,), S, jnp.int32)
    params = {
        "we": jnp.asarray(
            rng.randn(args.enc_dim, H).astype(np.float32) * 0.05),
        "wp": jnp.asarray(
            rng.randn(args.pred_dim, H).astype(np.float32) * 0.05),
        "wv": jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.05),
        "bv": jnp.zeros((V,), jnp.float32),
    }

    def joint(p_, e_c, pr):
        h = jnp.tanh((e_c @ p_["we"])[:, :, None, :]
                     + (pr @ p_["wp"])[:, None, :, :])
        return h @ p_["wv"] + p_["bv"]

    logits_gib = B * T * (S + 1) * V * 4 / 2 ** 30
    result = {
        "metric": (f"fused-joint loss+grads at OOM-grade shape "
                   f"(B={B},T'={T},S={S},V={V},H={H}, "
                   f"logits tensor {logits_gib:.1f} GiB f32)"),
        "unit": "ms/step",
        "logits_tensor_gib": round(logits_gib, 2),
        "device": jax.devices()[0].device_kind,
    }

    # --- Fused path FIRST (so peak_bytes_in_use, a process-lifetime
    # high-water mark, reflects the fused footprint, not the later
    # monolithic OOM attempt). Streams T-chunks; logits never exist. -------
    def fused_loss(e_, p_, pr):
        return jnp.sum(rnnt_loss_fused_joint(
            e_, p_, labels, ilen, slen, joint, pr, chunk_t=args.chunk_t))

    def chain(iters):
        # K data-dependent steps inside ONE jit (repo timing rule: never
        # per-call wall time through the async tunnel); two-point slope
        # removes the remaining fixed dispatch cost.
        @jax.jit
        def run(e_, p_, pr):
            def body(i, carry):
                e_c, acc = carry
                e_c = e_c.at[0, 0, 0].add((acc * 1e-20).astype(e_c.dtype))
                v, _ = jax.value_and_grad(
                    fused_loss, argnums=(0, 1, 2))(e_c, p_, pr)
                return (e_c, v)

            return jax.lax.fori_loop(0, iters, body,
                                     (e_, jnp.float32(0)))[1]

        return run

    run_hi, run_lo = chain(6), chain(2)
    v = run_hi(enc, pred, params)
    jax.block_until_ready(v)                   # compile + warm
    assert np.isfinite(float(v)), f"fused loss non-finite: {v}"
    jax.block_until_ready(run_lo(enc, pred, params))
    t0 = time.perf_counter()
    jax.block_until_ready(run_hi(enc, pred, params))
    t_hi = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(run_lo(enc, pred, params))
    t_lo = time.perf_counter() - t0
    result["value"] = round((t_hi - t_lo) / 4 * 1e3, 1)
    result["fused_loss"] = round(float(v), 2)

    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    result["fused_peak_gib"] = (round(peak / 2 ** 30, 2)
                                if peak else "unavailable")

    # --- Monolithic attempt LAST: expected to exhaust a 16 GiB chip. -------
    if not args.skip_monolithic:
        def mono_loss(e_, p_, pr):
            lg = joint(pr, e_, p_)
            from monotonic_rnnt_tpu import monotonic_rnnt_loss
            return jnp.sum(monotonic_rnnt_loss(lg, labels, ilen, slen))

        try:
            vm, _ = jax.jit(jax.value_and_grad(
                mono_loss, argnums=(0, 1, 2)))(enc, pred, params)
            jax.block_until_ready(vm)
            result["monolithic"] = "fit"       # bigger chip than expected
        except Exception as e:                  # noqa: BLE001 — record OOM
            kind = type(e).__name__
            oom = ("RESOURCE_EXHAUSTED" in str(e) or "memory" in
                   str(e).lower() or "allocat" in str(e).lower())
            result["monolithic"] = ("oom" if oom
                                    else f"failed ({kind})")

    from monotonic_rnnt_tpu.utils.provenance import provenance_stamp
    result["provenance"] = provenance_stamp(seed=0)
    line = json.dumps(result)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")


if __name__ == "__main__":
    main()
