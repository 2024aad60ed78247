"""2-process jax.distributed smoke test for the multi-host runtime.

Exercises initialize_multihost + local_batch_slice + the data-parallel loss
across real process boundaries (localhost coordinator, CPU backend with 2
virtual devices per process) and checks the distributed mean loss against the
single-process oracle — the minimal credible evidence for the multi-host
scaling path (SURVEY §2.5 comm-backend row).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_loss():
    worker = Path(__file__).parent / "_multiproc_worker.py"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(Path(__file__).parent.parent) + os.pathsep + \
        env.get("PYTHONPATH", "")
    port = _free_port()

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"

    def grab(key):
        line = [l for l in outs[0][1].splitlines() if l.startswith(key + "=")]
        assert line, f"no {key} in worker 0 output:\n{outs[0][1]}"
        return float(line[0].split("=")[1])

    dp_loss = grab("DP_LOSS")
    tp_loss = grab("TP_LOSS")

    # Single-process oracle on the same deterministic batch.
    from monotonic_rnnt_tpu import monotonic_rnnt_loss

    GB, T, S, V = 8, 12, 4, 10
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(GB, T, S + 1, V).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, V, size=(GB, S)).astype(np.int32))
    ilen = jnp.full((GB,), T, jnp.int32)
    slen = jnp.full((GB,), S, jnp.int32)
    expected = float(jnp.mean(monotonic_rnnt_loss(
        logits, labels, ilen, slen, backend="reference")))
    np.testing.assert_allclose(dp_loss, expected, rtol=1e-5, atol=1e-5)
    # The vocab-sharded (DP x TP) loss over the same 2 processes: the data
    # mean crosses process boundaries, the vocab pmax/psum stay intra-process.
    np.testing.assert_allclose(tp_loss, expected, rtol=1e-5, atol=1e-5)


def test_local_batch_slice_contract(monkeypatch):
    """Shard-assignment arithmetic across the procs/n_data regimes."""
    from monotonic_rnnt_tpu.parallel import local_batch_slice, make_mesh

    mesh = make_mesh(data=4, model=2)

    def fake_counts(idx, procs):
        monkeypatch.setattr(jax, "process_index", lambda: idx)
        monkeypatch.setattr(jax, "process_count", lambda: procs)

    # procs < n_data, divisible: each proc feeds n_data/procs shards.
    fake_counts(1, 2)
    assert local_batch_slice(8, mesh) == (4, 4)
    # procs == n_data: one shard each.
    fake_counts(3, 4)
    assert local_batch_slice(8, mesh) == (6, 2)
    # procs > n_data, divisible: processes sharing a shard feed the same slice.
    fake_counts(5, 8)
    assert local_batch_slice(8, mesh) == (4, 2)
    # Non-divisible combinations are layout-dependent: reject.
    fake_counts(0, 3)
    with pytest.raises(ValueError):
        local_batch_slice(12, mesh)
    fake_counts(0, 6)
    with pytest.raises(ValueError):
        local_batch_slice(8, mesh)
    # Batch not divisible by the data axis.
    fake_counts(0, 1)
    with pytest.raises(ValueError):
        local_batch_slice(7, mesh)
