"""Banded vs full-lattice loss benchmark — the long-utterance regime.

The reference's alignment-restricted mode exists to make T~1000s utterances
tractable by pruning compute and storage to a band around a known alignment
(cpu_workspace_manager.h:286-297, gpu_rnnt_kernel.h:58-72). This harness
measures the TPU equivalent: the packed band pipeline (ops/pallas/banded.py)
against the unrestricted-shape pipeline on the same restricted lattice, with
oracle parity checks on both.

Default shape is the acceptance case (B=2, T=1600, S=200, V=1024, shift=20);
target is >= 5x (band width ~W vs S+1 rows of traffic).

Usage:
  python benchmarks/banded_bench.py [--B 2 --T 1600 --S 200 --V 1024
      --shift 20 --iters 10] [--json-out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_case(B, T, S, V, shift, seed=0):
    import jax
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width,
                                              suggested_band_width)

    rng = np.random.RandomState(seed)
    logits = jax.device_put(rng.randn(B, T, S + 1, V).astype(np.float32))
    labels = jax.device_put(rng.randint(1, V, size=(B, S)).astype(np.int32))
    ilen = jnp.full((B,), T, jnp.int32)
    slen = jnp.full((B,), S, jnp.int32)
    align = np.zeros((B, T), np.int32)
    for b in range(B):
        pos = np.sort(rng.choice(T, size=S, replace=False))
        align[b, pos] = np.asarray(labels[b])
    bands = bands_from_alignment(jnp.asarray(align), ilen, slen, shift, 0)
    w_req = int(required_band_width(ilen, slen, bands, T, S + 1))
    w = suggested_band_width(ilen, slen, bands, T, S + 1)
    layout = compute_band_layout(ilen, slen, bands, T, S + 1, w)
    logits_band = jax.device_put(pack_band(logits, layout))
    return dict(logits=logits, logits_band=logits_band, labels=labels,
                ilen=ilen, slen=slen, bands=bands, layout=layout,
                w_req=w_req, w=w)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=2)
    p.add_argument("--T", type=int, default=1600)
    p.add_argument("--S", type=int, default=200)
    p.add_argument("--V", type=int, default=1024)
    p.add_argument("--shift", type=int, default=20)
    p.add_argument("--iters", type=int, default=80)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--backend", default="pallas",
                   choices=["pallas", "reference"])
    p.add_argument("--json-out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.banded import rnnt_loss_banded_reference
    from monotonic_rnnt_tpu.ops.bands import unpack_band
    from monotonic_rnnt_tpu.ops.pallas.banded import rnnt_loss_banded_pallas
    from monotonic_rnnt_tpu.ops.pallas.fused import rnnt_loss_pallas
    from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference
    from monotonic_rnnt_tpu.utils.profiling import (corrected_loop_bench,
                                                    default_perturb)

    B, T, S, V = args.B, args.T, args.S, args.V
    case = build_case(B, T, S, V, args.shift)
    if args.dtype == "bf16":
        case["logits"] = case["logits"].astype(jnp.bfloat16)
        case["logits_band"] = case["logits_band"].astype(jnp.bfloat16)
    s1 = S + 1
    print(f"# band width: required {case['w_req']}, padded {case['w']} "
          f"(vs S+1={s1}; cell ratio {s1 / case['w']:.2f}x)", file=sys.stderr)

    if args.backend == "pallas":
        full_fn = lambda lg, lab, il, sl, bd: rnnt_loss_pallas(
            lg, lab, il, sl, bands=bd)
        band_fn = lambda lb, lab, il, sl, bd: rnnt_loss_banded_pallas(
            lb, lab, il, sl, bd)
    else:
        full_fn = lambda lg, lab, il, sl, bd: rnnt_loss_reference(
            lg, lab, il, sl, bands=bd)
        band_fn = lambda lb, lab, il, sl, bd: rnnt_loss_banded_reference(
            lb, lab, il, sl, bd)

    common = (case["labels"], case["ilen"], case["slen"], case["bands"])

    # Parity first (compiled kernels on this device vs the XLA oracle).
    c_full, g_full = jax.jit(full_fn)(case["logits"], *common)
    c_band, g_band = jax.jit(band_fn)(case["logits_band"], *common)
    cost_err = float(jnp.max(jnp.abs(c_full - c_band)))
    g_scat = unpack_band(g_band, case["layout"], s1)
    grad_err = float(jnp.max(jnp.abs(g_full.astype(jnp.float32)
                                     - g_scat.astype(jnp.float32))))

    # Two-point dispatch-corrected timing: the axon tunnel's ~30 ms fixed
    # dispatch cost would otherwise swamp the banded path's few-ms iterations.
    feedback = lambda out: jnp.sum(out[0]) + jnp.sum(out[1][0, 0, 0, :1])
    t_full, oh_full = corrected_loop_bench(
        lambda lg, *rest: full_fn(lg, *rest), default_perturb, feedback,
        (case["logits"],) + common, iters=args.iters)
    t_band, oh_band = corrected_loop_bench(
        lambda lb, *rest: band_fn(lb, *rest), default_perturb, feedback,
        (case["logits_band"],) + common, iters=args.iters)

    cells = B * T * s1 * V
    result = {
        "metric": f"banded fwd-bwd+grad speedup "
                  f"(B={B},T={T},S={S},V={V},shift={args.shift}"
                  f"{',bf16' if args.dtype == 'bf16' else ''})",
        "value": round(t_full / t_band, 3),
        "unit": "x vs full-lattice",
        "full_ms": round(t_full * 1e3, 3),
        "banded_ms": round(t_band * 1e3, 3),
        "dispatch_overhead_ms": round(max(oh_full, oh_band) * 1e3, 1),
        "band_width": case["w"],
        "band_width_required": case["w_req"],
        "cell_ratio": round((B * T * s1 * V) / (B * T * case["w"] * V), 3),
        "full_Mcells_per_s": round(cells / t_full / 1e6, 2),
        "banded_Mcells_per_s_effective": round(cells / t_band / 1e6, 2),
        "max_cost_err": cost_err,
        "max_grad_err": grad_err,
        "backend": args.backend,
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
