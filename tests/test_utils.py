"""Utils tests: config flags, debug dumps, profiling helpers."""

import numpy as np
import jax.numpy as jnp

from monotonic_rnnt_tpu.utils.config import (config_override, get_config,
                                             update_config)
from monotonic_rnnt_tpu.utils.debug import (check_lattice, dump_lattice,
                                            interpret_mode)

import golden


def test_config_override_scoping():
    cfg = get_config()
    base = cfg.interpret
    with config_override(interpret=not base):
        assert get_config().interpret == (not base)
        with interpret_mode():
            assert get_config().interpret is True
    assert get_config().interpret == base


def test_config_rejects_unknown():
    try:
        update_config(nonexistent_flag=1)
        raise AssertionError("should have raised")
    except AttributeError:
        pass


def test_dump_lattice_readme():
    logits, labels, ilen, slen = golden.readme_batch()
    text = dump_lattice(logits, labels, ilen, slen, sample=0, file=False)
    # ll values from the README worked example (README.md:138,150)
    assert "ll_fwd=-1.0134" in text
    assert "ll_bwd=-1.0134" in text
    assert "alphas" in text and "betas" in text


def test_check_lattice():
    assert not check_lattice(np.array([1.0]), np.array([1.05])).any()
    assert check_lattice(np.array([1.0]), np.array([2.0])).all()


def test_debug_flags_emit_output(capfd):
    import jax
    import jax.numpy as jnp
    from monotonic_rnnt_tpu import monotonic_rnnt_loss
    from monotonic_rnnt_tpu.utils.config import config_override

    import golden
    logits, labels, ilen, slen = golden.readme_batch()

    def run():
        val = jax.jit(jax.value_and_grad(lambda lg: jnp.sum(
            monotonic_rnnt_loss(lg, jnp.asarray(labels), jnp.asarray(ilen),
                                jnp.asarray(slen), backend="reference"))))(
                                    jnp.asarray(logits))
        jax.block_until_ready(val)

    with config_override(debug_fwdbwd=True, debug_grads=True,
                         check_fwd_bwd=True):
        run()
    out = capfd.readouterr().out
    assert "mrnnt fwdbwd" in out
    assert "mrnnt grads" in out
    # fwd/bwd agree on a healthy lattice: the mismatch warning must NOT fire.
    assert "mismatch" not in out

    run()
    out = capfd.readouterr().out
    assert "mrnnt" not in out  # flags off -> silent


def test_debug_space_reports_pipeline(capfd):
    # The DEBUG_SPACE equivalent (reference cpu_workspace_manager.h:110-112):
    # one line per traced loss call with the chosen pipeline, predicted
    # kernel VMEM, and big-tensor HBM traffic. Printed at trace time, so
    # it works on hosts without callback support.
    import numpy as np
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.pallas.fused import rnnt_loss_pallas
    from monotonic_rnnt_tpu.utils.config import config_override

    rng = np.random.RandomState(0)
    B, T, S, V = 2, 6, 3, 20
    logits = jnp.asarray(rng.randn(B, T, S + 1, V).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, V, size=(B, S)).astype(np.int32))
    ilen = jnp.full((B,), T, jnp.int32)
    slen = jnp.full((B,), S, jnp.int32)

    with config_override(debug_space=True):
        rnnt_loss_pallas(logits, labels, ilen, slen, interpret=True)
        out = capfd.readouterr().out
        assert "pipeline=dp-fused" in out
        assert "kernel_vmem=" in out and "2r+1w" in out
        assert f"shape=({B}, {T}, {S + 1}, {V})" in out

        rnnt_loss_pallas(logits, labels, ilen, slen, with_grads=False,
                         interpret=True)
        assert "1r+0w" in capfd.readouterr().out

        # bf16 reports the two-row tiles
        rnnt_loss_pallas(logits.astype(jnp.bfloat16), labels, ilen, slen,
                         interpret=True)
        out = capfd.readouterr().out
        assert "dtype=bfloat16" in out and "tiles=(2," in out

    rnnt_loss_pallas(logits, labels, ilen, slen, interpret=True)
    assert "pipeline=" not in capfd.readouterr().out  # flag off -> silent


def test_log_diff_exp():
    import numpy as np
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.helpers import NEG_INF, log_diff_exp

    a, b = jnp.log(jnp.asarray(5.0)), jnp.log(jnp.asarray(3.0))
    np.testing.assert_allclose(float(log_diff_exp(a, b)), np.log(2.0),
                               rtol=1e-6)
    assert float(log_diff_exp(a, a)) == NEG_INF       # exp(a)-exp(a) = 0
    assert float(log_diff_exp(a, jnp.asarray(NEG_INF))) == float(a)
