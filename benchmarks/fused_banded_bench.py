"""Fused-joint training-path benchmark: full-lattice vs banded, long form.

Times a full value_and_grad step of the memory-efficient fused-joint loss
(enc/pred -> joint -> loss -> d_enc/d_pred/d_params) against its banded
variant at the long-utterance acceptance shape. The banded path evaluates
the joint only on the packed band window, so the dominant matmuls scale
with W instead of S+1 — this measures the end-to-end training-step gain,
complementing benchmarks/banded_bench.py's loss-only figure.

Usage:
  python benchmarks/fused_banded_bench.py [--B 2 --T 1600 --S 200 --V 1024
      --H 512 --shift 20 --chunk-t 64] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def joint_fn_full(params, enc_c, pred):
    import jax.numpy as jnp

    e = enc_c.astype(jnp.float32) @ params["we"]
    p = pred.astype(jnp.float32) @ params["wp"]
    h = jnp.tanh(e[:, :, None, :] + p[:, None, :, :])
    return h @ params["wv"] + params["bv"]


def joint_fn_banded(params, enc_c, pred_band):
    import jax.numpy as jnp

    e = enc_c.astype(jnp.float32) @ params["we"]
    p = pred_band.astype(jnp.float32) @ params["wp"]
    h = jnp.tanh(e[:, :, None, :] + p)
    return h @ params["wv"] + params["bv"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=2)
    p.add_argument("--T", type=int, default=1600)
    p.add_argument("--S", type=int, default=200)
    p.add_argument("--V", type=int, default=1024)
    p.add_argument("--H", type=int, default=512)
    p.add_argument("--De", type=int, default=512)
    p.add_argument("--Dp", type=int, default=512)
    p.add_argument("--shift", type=int, default=20)
    p.add_argument("--chunk-t", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              suggested_band_width)
    from monotonic_rnnt_tpu.ops.chunked import rnnt_loss_fused_joint
    from monotonic_rnnt_tpu.ops.chunked_banded import \
        rnnt_loss_fused_joint_banded
    from monotonic_rnnt_tpu.utils.profiling import (corrected_loop_bench,
                                                    default_perturb)

    B, T, S, V, H = args.B, args.T, args.S, args.V, args.H
    rng = np.random.RandomState(0)
    enc = jax.device_put(rng.randn(B, T, args.De).astype(np.float32) * 0.3)
    pred = jax.device_put(rng.randn(B, S + 1, args.Dp).astype(np.float32)
                          * 0.3)
    labels = jax.device_put(rng.randint(1, V, (B, S)).astype(np.int32))
    ilen = jnp.full((B,), T, jnp.int32)
    slen = jnp.full((B,), S, jnp.int32)
    align = np.zeros((B, T), np.int32)
    for b in range(B):
        pos = np.sort(rng.choice(T, size=S, replace=False))
        align[b, pos] = np.asarray(labels[b])
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, args.shift,
                                 0)
    w = suggested_band_width(ilen, slen, bands, T, S + 1)
    params = {
        "we": jax.device_put(rng.randn(args.De, H).astype(np.float32)
                             * (args.De ** -0.5)),
        "wp": jax.device_put(rng.randn(args.Dp, H).astype(np.float32)
                             * (args.Dp ** -0.5)),
        "wv": jax.device_put(rng.randn(H, V).astype(np.float32)
                             * (H ** -0.5)),
        "bv": jax.device_put(np.zeros(V, np.float32)),
    }
    print(f"# band width {w} vs S+1={S + 1}", file=sys.stderr)

    def full_step(enc_, pred_, params_):
        c = rnnt_loss_fused_joint(enc_, pred_, labels, ilen, slen,
                                  joint_fn_full, params_, bands=bands,
                                  chunk_t=args.chunk_t)
        return jnp.sum(c)

    def banded_step(enc_, pred_, params_):
        c = rnnt_loss_fused_joint_banded(enc_, pred_, labels, ilen, slen,
                                         joint_fn_banded, params_,
                                         bands=bands, band_width=w,
                                         chunk_t=args.chunk_t)
        return jnp.sum(c)

    g_full = jax.value_and_grad(full_step, argnums=(0, 1, 2))
    g_band = jax.value_and_grad(banded_step, argnums=(0, 1, 2))

    # Parity before timing.
    (v_f, gr_f) = jax.jit(g_full)(enc, pred, params)
    (v_b, gr_b) = jax.jit(g_band)(enc, pred, params)
    cost_err = abs(float(v_f) - float(v_b)) / max(1.0, abs(float(v_f)))
    genc_err = float(jnp.max(jnp.abs(gr_f[0] - gr_b[0])))

    def fb(out):
        return out[0] + jnp.sum(out[1][0][0, 0, :1])

    t_full, _ = corrected_loop_bench(
        lambda e, p_, pr: g_full(e, p_, pr), default_perturb, fb,
        (enc, pred, params), iters=args.iters)
    t_band, _ = corrected_loop_bench(
        lambda e, p_, pr: g_band(e, p_, pr), default_perturb, fb,
        (enc, pred, params), iters=args.iters)

    result = {
        "metric": f"banded fused-joint train-step speedup "
                  f"(B={B},T={T},S={S},V={V},H={H},shift={args.shift})",
        "value": round(t_full / t_band, 3),
        "unit": "x vs full-lattice fused-joint",
        "full_ms": round(t_full * 1e3, 3),
        "banded_ms": round(t_band * 1e3, 3),
        "band_width": w,
        "rel_cost_err": cost_err,
        "max_denc_err": genc_err,
        "chunk_t": args.chunk_t,
        "device": jax.devices()[0].device_kind,
    }
    from monotonic_rnnt_tpu.utils.provenance import provenance_stamp
    result["provenance"] = provenance_stamp(seed=0)
    line = json.dumps(result)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")
    return result


if __name__ == "__main__":
    main()
