"""shard_map varying-axes (vma) typing helpers.

Under vma-typed shard_map, scan carries must type-match their per-step
outputs: inits built from fresh constants (jnp.zeros, initialize_carry) are
axis-invariant while the step outputs inherit the mesh axes of the tensors
they are computed from. Elementwise ops auto-promote, scan carries do not —
the init must be explicitly pcast to the axes its outputs will vary over.
All helpers are no-ops outside shard_map (jax.typeof has no vma there).

Used by the fused-joint chunk scans (ops/chunked*.py) and by model-internal
scans (LSTM predictor carry) so the model family runs unmodified inside
shard_map factories (models/train.make_tp_sharded_train_step).
"""

from __future__ import annotations

import jax


def tree_vma(*trees):
    """Union of the shard_map varying axes of all leaves of the trees."""
    out = set()
    for tree in trees:
        for leaf in jax.tree.leaves(tree):
            out |= set(getattr(jax.typeof(leaf), "vma", frozenset()))
    return out


def vary_to(x, want_axes):
    """Promote array x to vary over want_axes (no-op where already varying)."""
    missing = tuple(sorted(set(want_axes)
                           - set(getattr(jax.typeof(x), "vma", frozenset()))))
    if missing:
        return jax.lax.pcast(x, missing, to="varying")
    return x


def vary_like(tree, *refs):
    """Promote every leaf of tree to the union vma of the reference trees."""
    axes = tree_vma(*refs)
    return jax.tree.map(lambda x: vary_to(x, axes), tree)


def psum_to_primal(cot, primal):
    """psum a cotangent over the mesh axes its primal does not vary on.

    A replicated input's true cotangent is the sum of per-shard
    contributions, and shard_map's transpose requires the vma types to
    match: a weight replicated over 'data' gets its gradient psum'd over
    'data', a vocab-sharded projection's gradient stays per-shard, and
    enc/pred cotangents are summed over the model axis whose V-slices they
    were computed from. No-op outside shard_map.
    """
    extra = tuple(sorted(
        set(getattr(jax.typeof(cot), "vma", frozenset()))
        - set(getattr(jax.typeof(primal), "vma", frozenset()))))
    return jax.lax.psum(cot, extra) if extra else cot
