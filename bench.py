"""Benchmark: fused monotonic RNN-T fwd-bwd+grad on one TPU chip.

Shape: B=32, T=200, S=50, V=1000 (BASELINE.json benchmark lattice).

Measurement method: the driver's TPU is reached through an async tunnel whose
dispatch/caching behavior makes naive per-call wall timing meaningless, so we
time K dependent iterations *inside one jit* — each iteration perturbs the
logits with the previous iteration's outputs (costs + one grad element), so
no iteration can be cached, hoisted, or overlapped away — and divide the
single-call wall time by K. The HBM roofline is calibrated the same way with
a pure streaming copy chain (1 read + 1 write per iteration) on a tensor of
identical size.

Reported metric: lattice cells per second per chip (cells = B*T*(S+1)).
vs_baseline: achieved fraction of the memory-bound roofline divided by the
0.80 target fraction (BASELINE.json north star) — >= 1.0 means the target is
met. The fused pipeline's algorithmic minimum traffic is 2 reads + 1 write of
the [B,T,S+1,V] tensor (see ops/pallas/fused.py).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from monotonic_rnnt_tpu.ops.pallas.fused import rnnt_loss_pallas
    from monotonic_rnnt_tpu.ops.reference import rnnt_loss_reference
    from monotonic_rnnt_tpu.utils.provenance import provenance_stamp

    B, T, S, V = 32, 200, 50, 1000
    S1 = S + 1
    # K=60 dependent iterations per jit: the axon tunnel adds ~30 ms fixed
    # cost per dispatch, so the uncorrected per-iter time carries oh/K of
    # artifact — 0.5 ms at K=60 (was 1 ms at K=30 through round 2; the
    # two-point corrected figures are K-independent).
    K = 60
    nbytes = B * T * S1 * V * 4
    on_tpu = jax.default_backend() != "cpu"

    rng = np.random.RandomState(0)
    logits = jax.device_put(rng.randn(B, T, S1, V).astype(np.float32))
    labels = jax.device_put(rng.randint(1, V, size=(B, S)).astype(np.int32))
    ilen = jnp.full((B,), T, jnp.int32)
    slen = jnp.full((B,), S, jnp.int32)

    backend = "pallas" if on_tpu else "reference"

    def loss_body(i, carry):
        x, acc = carry
        x = x.at[:, 0, 0, 0].add((acc * 1e-20).astype(x.dtype))
        c, g = rnnt_loss_pallas(x, labels, ilen, slen) if on_tpu else \
            rnnt_loss_reference(x, labels, ilen, slen)
        return (x, c[0] + g[0, 0, 0, 0].astype(jnp.float32))

    loss_loop = jax.jit(
        lambda x: jax.lax.fori_loop(0, K, loss_body, (x, jnp.float32(0)))[1])

    def copy_body(i, y):
        return y * 1.0000001 + 1e-9

    copy_loop = jax.jit(
        lambda x: jax.lax.fori_loop(0, K, copy_body, x))

    def timed(fn, arg, reduce_out):
        out = fn(arg)
        _ = np.asarray(reduce_out(out))  # warmup + force completion
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(arg)
            _ = np.asarray(reduce_out(out))
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    t_loss = timed(loss_loop, logits, lambda r: r)
    t_copy = timed(copy_loop, logits, lambda r: r[0, 0, 0, :2])

    # Secondary figures (not the headline): bf16 inputs and cost-only path.
    loss16_loop = jax.jit(lambda x: jax.lax.fori_loop(
        0, K, loss_body, (x, jnp.float32(0)))[1])
    t_loss16 = timed(loss16_loop, logits.astype(jnp.bfloat16), lambda r: r)

    # One host generation + device upload of the ~1.3GB calibration tensor,
    # shared by both dtype probes (the bf16 operand is an on-device cast).
    stream_base = (jax.device_put(rng.randn(327680, 1024).astype(np.float32))
                   if on_tpu else None)

    def build_stream_probe(dtype, k=8):
        """Compile a k-copy UNROLLED Pallas chain; return (trial_fn, bytes).

        Unrolled because inside a fori_loop the while-carry forces an extra
        full-tensor copy per iteration (a pallas output cannot alias the
        carry), halving the apparent rate — benchmarks/stream_bench.py
        documents the sweep; vmem_512 was the fastest config (~641 GB/s f32
        on v5e through axon). trial_fn() runs ONE timed dispatch and
        returns per-copy seconds; the caller interleaves trials across
        dtypes and medians them (a per-run single-shot ceiling swings ~4%
        round-over-round — too noisy to support fraction targets). The
        per-dispatch tunnel overhead is removed later using the copy-loop
        pair's fit (one compile per dtype instead of two).
        """
        if not on_tpu:
            return None, 0
        from monotonic_rnnt_tpu.ops.pallas.stream import stream_copy

        xc = stream_base.astype(dtype)
        cbytes = xc.size * xc.dtype.itemsize

        def chain(a):
            for _ in range(k):
                a = stream_copy(a, mode="vmem", block_rows=512)
            return a

        loop = jax.jit(chain)
        _ = np.asarray(loop(xc)[0, :2])  # compile + first (cold) dispatch
        _ = np.asarray(loop(xc)[0, :2])  # warm: cold dispatches run ~2x slow

        def trial():
            t0 = time.perf_counter()
            _ = np.asarray(loop(xc)[0, :2])
            return (time.perf_counter() - t0) / k

        return trial, 2 * cbytes

    # k=24 keeps the shared-overhead estimate (oh/k) small next to the
    # per-copy time; iterations are cheap, compiles are not.
    CEIL_K = 24
    CEIL_TRIALS = 5
    probe_f32, ceil_bytes = build_stream_probe(jnp.float32, CEIL_K)
    probe_bf16, ceil_bytes16 = build_stream_probe(jnp.bfloat16, CEIL_K)
    ceil_trials_f32, ceil_trials_bf16 = [], []
    if on_tpu:
        # Interleave the dtype probes so slow drift (tunnel/allocator state)
        # hits both ceilings alike instead of biasing whichever ran second.
        for _ in range(CEIL_TRIALS):
            ceil_trials_f32.append(probe_f32())
            ceil_trials_bf16.append(probe_bf16())
    ceil_f32_t = float(np.median(ceil_trials_f32)) if on_tpu else None
    ceil_bf16_t = float(np.median(ceil_trials_bf16)) if on_tpu else None
    # Free the flat calibration operands (the probes' closures pin ~2.7 GB
    # of HBM) before the blocked controls allocate their own ~2.7 GB.
    probe_f32 = probe_bf16 = stream_base = None

    def _spread(ts):
        return ((max(ts) - min(ts)) / float(np.median(ts))) if ts else None

    # Blocked-stream controls: the DP-fused kernels' exact block structure
    # with ZERO compute, per dtype (f32 streams one-row blocks, bf16
    # two-row — same tiles the pipeline picks). 'btsv' reads [B, TT, S1, V]
    # blocks of the [B, T, S1, V] layout — B per-sample-strided runs per
    # grid step, what the pipeline actually streams. 'tbsv' reads the same
    # block bytes from a [T, B, S1, V] layout — one contiguous run per grid
    # step, the layout counter-experiment. If btsv caps near the pipeline's
    # rate while tbsv reaches the flat ceiling, the residual gap is the
    # layout's DMA-descriptor cost, not the kernels'.
    BLOCK_K = 8
    BLOCK_TRIALS = 5

    def build_blocked_probe(layout, dtype, k=BLOCK_K):
        if not on_tpu:
            return None
        from monotonic_rnnt_tpu.ops.pallas.stream import (
            stream_copy_blocked, stream_copy_blocked_tbsv)

        tt = 2 if dtype == jnp.bfloat16 else 1
        v128 = (V + 127) // 128 * 128
        shape = ((B, T, S1, v128) if layout == "btsv"
                 else (T, B, S1, v128))
        fn = (stream_copy_blocked if layout == "btsv"
              else stream_copy_blocked_tbsv)
        xb = jnp.zeros(shape, dtype)
        cbytes = xb.size * jnp.dtype(dtype).itemsize

        def chain(a):
            for _ in range(k):
                a = fn(a, tt=tt)
            return a

        loop = jax.jit(chain)
        _ = np.asarray(loop(xb)[0, 0, 0, :2])
        _ = np.asarray(loop(xb)[0, 0, 0, :2])

        def trial():
            t0 = time.perf_counter()
            _ = np.asarray(loop(xb)[0, 0, 0, :2])
            return (time.perf_counter() - t0) / k

        trial.nbytes = cbytes
        return trial

    BLOCK_CFGS = [("btsv", jnp.bfloat16), ("tbsv", jnp.bfloat16),
                  ("btsv", jnp.float32)]
    blocked_trials = {lay + sfx: []
                      for lay, dt in BLOCK_CFGS
                      for sfx in ("" if dt == jnp.bfloat16 else "_f32",)}
    blocked_nbytes = {}
    if on_tpu:
        pb = {}
        for lay, dt in BLOCK_CFGS:
            key = lay + ("" if dt == jnp.bfloat16 else "_f32")
            pb[key] = build_blocked_probe(lay, dt)
            blocked_nbytes[key] = pb[key].nbytes
        for _ in range(BLOCK_TRIALS):
            for key in blocked_trials:
                blocked_trials[key].append(pb[key]())
        del pb

    def cost_body(i, carry):
        x, acc = carry
        x = x.at[:, 0, 0, 0].add((acc * 1e-20).astype(x.dtype))
        if on_tpu:
            c, _ = rnnt_loss_pallas(x, labels, ilen, slen, with_grads=False)
        else:
            c, _ = rnnt_loss_reference(x, labels, ilen, slen,
                                       with_grads=False)
        return (x, c[0])

    cost_loop = jax.jit(lambda x: jax.lax.fori_loop(
        0, K, cost_body, (x, jnp.float32(0)))[1])
    t_cost = timed(cost_loop, logits, lambda r: r)

    # Training-path figure: value_and_grad through the PUBLIC API. On the
    # deferred-gradient route this is 3 big-tensor passes total (fwd one
    # read; bwd one read + one write with the cotangent folded in-kernel)
    # vs 5 for forward-produced grads + a cotangent scaling pass.
    t_vjp = None
    if on_tpu:
        from monotonic_rnnt_tpu import monotonic_rnnt_loss as api_loss

        def vjp_body(i, carry):
            x, acc = carry
            x = x.at[:, 0, 0, 0].add((acc * 1e-20).astype(x.dtype))
            val, g = jax.value_and_grad(lambda lg: jnp.sum(
                api_loss(lg, labels, ilen, slen)))(x)
            return (x, val + g[0, 0, 0, 0].astype(jnp.float32))

        vjp_loop = jax.jit(lambda x: jax.lax.fori_loop(
            0, K, vjp_body, (x, jnp.float32(0)))[1])
        t_vjp = timed(vjp_loop, logits, lambda r: r)

    hbm_bw = 2 * nbytes / t_copy                      # measured stream rate
    sol_time = 3 * nbytes / hbm_bw                    # 2 reads + 1 write
    roofline_frac = sol_time / t_loss

    # Dispatch-corrected secondary figures: the axon tunnel adds a ~30 ms
    # fixed cost per dispatch, which at K=30 folds ~1 ms/iter into BOTH the
    # loss and copy loops above. The headline keeps the uncorrected method
    # (numerator and denominator pay the same overhead, and it stays
    # comparable across rounds); these report the two-point-corrected
    # per-iter times and the roofline fraction rebuilt from them.
    K2 = K // 4
    loss_loop2 = jax.jit(
        lambda x: jax.lax.fori_loop(0, K2, loss_body, (x, jnp.float32(0)))[1])
    copy_loop2 = jax.jit(lambda x: jax.lax.fori_loop(0, K2, copy_body, x))
    # timed() divides by K; undo to totals, then fit total = oh + n*per_iter.
    total_loss2 = timed(loss_loop2, logits, lambda r: r) * K
    total_copy2 = timed(copy_loop2, logits, lambda r: r[0, 0, 0, :2]) * K
    t_loss_c = (t_loss * K - total_loss2) / (K - K2)
    t_copy_c = (t_copy * K - total_copy2) / (K - K2)
    hbm_bw_c = 2 * nbytes / t_copy_c
    roofline_frac_c = (3 * nbytes / hbm_bw_c) / t_loss_c

    # The copy pair's fit gives the tunnel's fixed per-dispatch overhead;
    # reuse it to dispatch-correct the single-compile measurements (bf16
    # loss, stream ceilings) instead of paying a second compile for each.
    oh = max(t_copy * K - K * t_copy_c, 0.0)
    t_loss16_c = (t_loss16 * K - oh) / K
    ceil_f32 = (ceil_bytes / max(ceil_f32_t - oh / CEIL_K, 1e-9)
                if ceil_f32_t else None)
    ceil_bf16 = (ceil_bytes16 / max(ceil_bf16_t - oh / CEIL_K, 1e-9)
                 if ceil_bf16_t else None)

    def _gbps(trials, nb, k):
        return [round(nb / max(t - oh / k, 1e-9) / 1e9, 1) for t in trials]

    blocked_rate = {
        key: (2 * blocked_nbytes[key]
              / max(float(np.median(ts)) - oh / BLOCK_K, 1e-9)
              if ts else None)
        for key, ts in blocked_trials.items()}
    # Every clean stream measurement lower-bounds the achievable ceiling, and
    # the corrected f32 elementwise-chain rate (hbm_bw_c, 1r+1w) is one such
    # measurement — floor the f32 ceiling there so a transient-slow Pallas
    # probe can never report a "ceiling" below a bandwidth this same run
    # achieved. (No equivalent pure-f32-stream exists for bf16; it stays as
    # probed.)
    if ceil_f32:
        ceil_f32 = max(ceil_f32, hbm_bw_c)
    # bf16 roofline vs the bf16 stream ceiling (the bf16 pipeline moves half
    # the bytes: 2 reads + 1 write of a bf16 tensor).
    bf16_roofline = ((3 * (nbytes // 2) / ceil_bf16) / t_loss16_c
                     if ceil_bf16 else None)
    # Also report the fraction against the chip's *spec* bandwidth so the
    # measured-copy headline can't be misread as "% of hardware peak". The
    # measured ceiling is the honest achievable bound through this runtime
    # (axon tunnel); spec is the datasheet number.
    hbm_spec = 819e9 if "v5 lite" in jax.devices()[0].device_kind else None
    roofline_frac_spec = (3 * nbytes / hbm_spec) / t_loss if hbm_spec else None
    cells_per_s = B * T * S1 / t_loss

    # Correctness spot check against the oracle (allclose per BASELINE).
    small = tuple(jax.device_put(a) for a in (
        rng.randn(4, 24, 7, 64).astype(np.float32) * 2,
        rng.randint(1, 64, size=(4, 6)).astype(np.int32),
        np.array([24, 17, 9, 24], np.int32),
        np.array([6, 5, 0, 6], np.int32)))
    f_test = jax.jit(lambda *a: (rnnt_loss_pallas(*a) if on_tpu
                                 else rnnt_loss_reference(*a)))
    f_ref = jax.jit(lambda *a: rnnt_loss_reference(*a))
    c1, g1 = f_test(*small)
    c2, g2 = f_ref(*small)
    max_cost_err = float(jnp.max(jnp.abs(c1 - c2)))
    max_grad_err = float(jnp.max(jnp.abs(g1 - g2)))

    print(json.dumps({
        "metric": "fused fwd-bwd+grad lattice cells/s/chip "
                  "(B=32,T=200,S=50,V=1000, fp32)",
        "value": round(cells_per_s / 1e6, 2),
        "unit": "Mcells/s",
        "vs_baseline": round(roofline_frac / 0.80, 3),
        "detail": {
            # The uncorrected figures carry oh/K of tunnel-dispatch artifact
            # (K was 30 through round 2, 60 from round 3) — compare rounds
            # on the dispatch_corrected block, which is K-independent.
            "iters_K": K,
            "iter_ms": round(t_loss * 1e3, 3),
            "measured_hbm_GBps": round(hbm_bw / 1e9, 1),
            "roofline_fraction": round(roofline_frac, 3),
            "hbm_spec_GBps": round(hbm_spec / 1e9, 1) if hbm_spec else None,
            "roofline_fraction_vs_spec": (round(roofline_frac_spec, 3)
                                          if roofline_frac_spec else None),
            "max_cost_err_vs_oracle": max_cost_err,
            "max_grad_err_vs_oracle": max_grad_err,
            "bf16_iter_ms": round(t_loss16 * 1e3, 3),
            "cost_only_iter_ms": round(t_cost * 1e3, 3),
            "train_vjp_iter_ms": (round(t_vjp * 1e3, 3) if t_vjp else None),
            "train_vjp_iter_ms_corrected": (
                round((t_vjp - oh / K) * 1e3, 3) if t_vjp else None),
            "copy_ceiling_f32_GBps": (round(ceil_f32 / 1e9, 1)
                                      if ceil_f32 else None),
            "copy_ceiling_bf16_GBps": (round(ceil_bf16 / 1e9, 1)
                                       if ceil_bf16 else None),
            "ceiling_probe": {
                "method": f"median of {CEIL_TRIALS} interleaved trials "
                          "per dtype, dispatch-corrected",
                "trials_f32_GBps": _gbps(ceil_trials_f32, ceil_bytes,
                                         CEIL_K),
                "trials_bf16_GBps": _gbps(ceil_trials_bf16, ceil_bytes16,
                                          CEIL_K),
                "spread_f32": (round(_spread(ceil_trials_f32), 3)
                               if ceil_trials_f32 else None),
                "spread_bf16": (round(_spread(ceil_trials_bf16), 3)
                                if ceil_trials_bf16 else None),
            },
            "blocked_stream": {
                "note": "DP-fused block structure, zero compute; btsv = "
                        "per-sample-strided [B,TT,S1,V] blocks (what the "
                        "pipeline streams; bf16 TT=2, f32 TT=1), tbsv = "
                        "same block bytes contiguous (layout "
                        "counter-experiment)",
                **{f"{key}_GBps": (round(blocked_rate[key] / 1e9, 1)
                                   if blocked_rate[key] else None)
                   for key in blocked_trials},
                **{f"trials_{key}_GBps": _gbps(blocked_trials[key],
                                               2 * blocked_nbytes.get(
                                                   key, 0), BLOCK_K)
                   for key in blocked_trials},
            },
            "dispatch_corrected": {
                "iter_ms": round(t_loss_c * 1e3, 3),
                "Mcells_per_s": round(B * T * S1 / t_loss_c / 1e6, 2),
                "measured_hbm_GBps": round(hbm_bw_c / 1e9, 1),
                "roofline_fraction": round(roofline_frac_c, 3),
                "bf16_iter_ms": round(t_loss16_c * 1e3, 3),
                "bf16_roofline_fraction": (round(bf16_roofline, 3)
                                           if bf16_roofline else None),
                "bf16_fraction_of_blocked_ceiling": (
                    round((3 * (nbytes // 2) / blocked_rate["btsv"])
                          / t_loss16_c, 3)
                    if blocked_rate["btsv"] else None),
                "f32_fraction_of_blocked_ceiling": (
                    round((3 * nbytes / blocked_rate["btsv_f32"])
                          / t_loss_c, 3)
                    if blocked_rate.get("btsv_f32") else None),
                "roofline_fraction_vs_spec": (
                    round((3 * nbytes / hbm_spec) / t_loss_c, 3)
                    if hbm_spec else None),
            },
            "backend": backend,
            "device": str(jax.devices()[0]),
        },
        "provenance": provenance_stamp(seed=0),
    }))


if __name__ == "__main__":
    main()
