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
