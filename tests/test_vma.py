"""utils/vma.py contracts: promotion of scan carries under shard_map and
cotangent reduction to primal varying-axes. These helpers underpin the
fused-joint TP losses and the model family's shard_map compatibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from monotonic_rnnt_tpu.parallel import make_mesh
from monotonic_rnnt_tpu.utils.vma import (psum_to_primal, tree_vma, vary_like,
                                          vary_to)


def test_noops_outside_shard_map():
    x = jnp.ones((4, 3))
    assert tree_vma(x, {"a": x}) == set()
    np.testing.assert_array_equal(np.asarray(vary_to(x, set())),
                                  np.asarray(x))
    np.testing.assert_array_equal(np.asarray(psum_to_primal(x, x)),
                                  np.asarray(x))


def test_scan_carry_promotion_inside_shard_map():
    """The motivating case: a constant-built scan carry must be promoted to
    the per-step outputs' varying axes, or the scan fails to type-check."""
    mesh = make_mesh(data=4, model=1)

    def body(promote):
        @jax.jit
        def run(x):                                   # x: [B, T]
            def fn(x_):
                assert tree_vma(x_) == {"data"}
                init = jnp.zeros(x_.shape[:1], x_.dtype)
                if promote:
                    init = vary_like(init, x_)
                    assert tree_vma(init) == {"data"}

                def step(c, col):
                    return c + col, None

                out, _ = jax.lax.scan(step, init, x_.T)
                return out

            return shard_map(fn, mesh=mesh, in_specs=P("data", None),
                             out_specs=P("data"))(x)

        return run

    x = jnp.arange(12.0).reshape(4, 3)
    got = body(True)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x.sum(axis=1)))
    with pytest.raises(Exception):
        jax.block_until_ready(body(False)(x))


def test_psum_to_primal_reduces_replicated_cotangent():
    """A cotangent varying over an axis its primal does not vary on gets
    psum'd down — the per-shard contributions of a replicated weight."""
    mesh = make_mesh(data=4, model=1)

    def fn(w, x):                                     # w replicated, x sharded
        cot = x * 0 + w                               # varies over 'data'
        assert tree_vma(cot) == {"data"}
        red = psum_to_primal(cot.sum(), w)
        assert tree_vma(red) == set()
        return red

    w = jnp.float32(2.0)
    x = jnp.ones((8,))
    got = shard_map(fn, mesh=mesh, in_specs=(P(), P("data")),
                    out_specs=P())(w, x)
    # 4 shards x (2 local elements x w) = 16.
    assert float(got) == 16.0
