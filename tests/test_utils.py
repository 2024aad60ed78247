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


def test_log_diff_exp():
    import numpy as np
    import jax.numpy as jnp
    from monotonic_rnnt_tpu.ops.helpers import NEG_INF, log_diff_exp

    a, b = jnp.log(jnp.asarray(5.0)), jnp.log(jnp.asarray(3.0))
    np.testing.assert_allclose(float(log_diff_exp(a, b)), np.log(2.0),
                               rtol=1e-6)
    assert float(log_diff_exp(a, a)) == NEG_INF       # exp(a)-exp(a) = 0
    assert float(log_diff_exp(a, jnp.asarray(NEG_INF))) == float(a)
