"""Training loop pieces: sharded train step, optimizer, checkpointing.

Checkpoint/resume is a capability the reference lacks entirely (SURVEY.md §5:
"none (stateless library)"); here it is first-class via orbax. The train step
is a single pjit-compatible function: data-parallel over the 'data' mesh axis
with parameters replicated; XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
from .transducer import MonotonicTransducer, TransducerConfig


class TrainState(train_state.TrainState):
    dropout_rng: jax.Array = None


def create_train_state(cfg: TransducerConfig, rng: jax.Array,
                       example_batch, learning_rate: float = 1e-3,
                       weight_decay: float = 1e-6,
                       warmup_steps: int = 1000) -> TrainState:
    model = MonotonicTransducer(cfg)
    feats, feat_lengths, labels, label_lengths = example_batch
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init({"params": params_rng, "dropout": dropout_rng},
                           feats, feat_lengths, labels, label_lengths)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(warmup_steps * 10, 10_000))
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    return TrainState.create(apply_fn=model.apply, params=variables["params"],
                             tx=tx, dropout_rng=dropout_rng)


def train_step(state: TrainState, batch) -> Tuple[TrainState, dict]:
    """One SPMD training step. batch = (feats, feat_lens, labels, label_lens)."""
    feats, feat_lengths, labels, label_lengths = batch
    step_rng = jax.random.fold_in(state.dropout_rng, state.step)

    def loss_fn(params):
        costs = state.apply_fn({"params": params}, feats, feat_lengths,
                               labels, label_lengths, deterministic=False,
                               rngs={"dropout": step_rng})
        return jnp.mean(costs)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads=grads)
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "step": state.step,
    }
    return new_state, metrics


def make_memory_efficient_loss(model: MonotonicTransducer,
                               chunk_t: int = 32,
                               deterministic: bool = True):
    """Loss fn that never materializes the [B, T, S+1, V] joint tensor.

    Streams the lattice in T-chunks through ops.chunked.rnnt_loss_fused_joint
    — peak activation memory drops from O(B·T·S·V) to one chunk's worth,
    enabling large-vocab long-utterance training that OOMs with the standard
    path (e.g. V=8k, T'=1024, B=4 needs an 8 GiB logits tensor plus its
    gradient on the monolithic path; the fused path fits comfortably on one
    16 GiB chip). Returns loss_fn(params, batch) -> mean cost; differentiable
    w.r.t. all params (encoder/predictor grads via autodiff through enc/pred,
    joint grads via the fused custom VJP).
    """
    from ..ops.chunked import rnnt_loss_fused_joint

    def _encode(m, feats, flen, det):
        return m.encode(feats, flen, det)

    def _predict(m, labels, det):
        return m.predictor(labels, det)

    def _joint(m, e_c, p):
        return m.joint(e_c, p)

    def loss_fn(params, batch, rngs=None):
        """rngs: e.g. {"dropout": key} when deterministic=False."""
        feats, feat_lengths, labels, label_lengths = batch
        enc, enc_lengths = model.apply({"params": params}, feats,
                                       feat_lengths, deterministic,
                                       method=_encode, rngs=rngs)
        pred = model.apply({"params": params}, labels, deterministic,
                           method=_predict, rngs=rngs)

        def joint_fn(jp, e_c, p):
            # jp is the joint submodule's param subtree; re-nest it at its
            # scope path so model.apply resolves m.joint's variables.
            return model.apply({"params": {"joint": jp}}, e_c, p,
                               method=_joint)

        costs = rnnt_loss_fused_joint(
            enc, pred, labels, enc_lengths, label_lengths.astype(jnp.int32),
            joint_fn, params["joint"], blank_id=model.cfg.blank_id,
            chunk_t=chunk_t)
        return jnp.mean(costs)

    return loss_fn


def make_banded_memory_efficient_loss(model: MonotonicTransducer,
                                      band_width: int,
                                      chunk_t: int = 32,
                                      deterministic: bool = True):
    """Fused-joint loss restricted to a band: the O(W) training step.

    Like make_memory_efficient_loss, but the joint network is evaluated only
    on the packed band window (ops/chunked_banded.py) — hidden/vocab
    projections and loss all scale with band_width instead of S+1. Returns
    loss_fn(params, batch, bands, rngs=None) -> mean cost; `bands` is the
    per-call restriction (e.g. bands_from_alignment on stored alignments in
    *encoder-frame* time), band_width the static window width (size it with
    bands.required_band_width).
    """
    from ..ops.chunked_banded import rnnt_loss_fused_joint_banded

    def _encode(m, feats, flen, det):
        return m.encode(feats, flen, det)

    def _predict(m, labels, det):
        return m.predictor(labels, det)

    def _joint_banded(m, e_c, pb):
        return m.joint.banded(e_c, pb)

    def loss_fn(params, batch, bands, rngs=None):
        feats, feat_lengths, labels, label_lengths = batch
        enc, enc_lengths = model.apply({"params": params}, feats,
                                       feat_lengths, deterministic,
                                       method=_encode, rngs=rngs)
        pred = model.apply({"params": params}, labels, deterministic,
                           method=_predict, rngs=rngs)

        def joint_fn(jp, e_c, pb):
            return model.apply({"params": {"joint": jp}}, e_c, pb,
                               method=_joint_banded)

        costs = rnnt_loss_fused_joint_banded(
            enc, pred, labels, enc_lengths, label_lengths.astype(jnp.int32),
            joint_fn, params["joint"], bands=bands, band_width=band_width,
            blank_id=model.cfg.blank_id, chunk_t=chunk_t)
        return jnp.mean(costs)

    return loss_fn


def transducer_tp_specs(tree):
    """PartitionSpec tree for vocab tensor parallelism of the transducer.

    Everything is replicated except the joint's vocab projection, whose
    output (vocab) axis is sharded over MODEL_AXIS. The rule matches by path
    suffix, so it applies to the params tree AND to optimizer-state trees
    whose leaves mirror the params tree (e.g. adam's mu/nu).
    """
    def _spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "vocab_proj" in names:
            if names[-1] == "kernel" and leaf.ndim >= 2:
                return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
            if names[-1] == "bias" and leaf.ndim == 1:
                return P(MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(_spec, tree)


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState for the vocab-TP train step.

    Params and optimizer state move to NamedShardings from
    transducer_tp_specs (vocab projection + its adam moments sharded over
    MODEL_AXIS, the rest replicated over the whole mesh).
    """
    def put(tree):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, transducer_tp_specs(tree))

    return state.replace(
        params=put(state.params), opt_state=put(state.opt_state),
        dropout_rng=jax.device_put(state.dropout_rng,
                                   NamedSharding(mesh, P())))


def make_tp_sharded_train_step(mesh: Mesh, model: MonotonicTransducer,
                               params, chunk_t: int = 32,
                               deterministic: bool = False,
                               band_width: int = None):
    """Train step with batch on 'data' AND the vocab axis on 'model'.

    The production configuration for large vocabularies: the joint's output
    projection lives sharded (transducer_tp_specs), each shard evaluates only
    its V-slice of the joint chunk by chunk through the memory-efficient
    fused loss (ops/chunked.py, axis_name='model'), and the [B, T, S+1, V]
    logits tensor never exists on any chip. The optimizer update runs under
    jit/GSPMD on the sharded grads, so adam moments for the vocab projection
    stay sharded too.

    Call shard_train_state(state, mesh) once before stepping. `params` is an
    example params tree (spec inference only). Dropout (deterministic=False)
    folds the data-axis index into the step rng so masks differ per data
    shard but agree across the model axis.

    With band_width set, the step is the full long-utterance composition —
    the joint is evaluated only on band cells (ops/chunked_banded.py), so
    per-chip work is O(B/n_data · T · W · V/n_model) — and takes
    step(state, batch, bands) with `bands` a Bands pair in *encoder-frame*
    time (e.g. bands_from_alignment on stored alignments).

    Returns step(state, batch[, bands]) -> (state, metrics), jitted.
    """
    import dataclasses as _dc
    from functools import partial as _partial

    from jax import shard_map

    from ..ops.bands import Bands
    from ..ops.chunked import rnnt_loss_fused_joint
    from ..ops.chunked_banded import rnnt_loss_fused_joint_banded
    from .transducer import Joint

    n_model = mesh.shape[MODEL_AXIS]
    vocab = model.cfg.vocab_size
    if vocab % n_model:
        raise ValueError(f"vocab_size {vocab} not divisible by model axis "
                         f"{n_model}")
    joint_local = Joint(_dc.replace(model.cfg, vocab_size=vocab // n_model))
    pspecs = transducer_tp_specs(params)
    dspecs = (P(DATA_AXIS, None, None), P(DATA_AXIS), P(DATA_AXIS, None),
              P(DATA_AXIS))
    bspecs = (P(DATA_AXIS, None), P(DATA_AXIS, None))

    def _encode(m, feats, flen, det):
        return m.encode(feats, flen, det)

    def _predict(m, labels, det):
        return m.predictor(labels, det)

    def _loss_and_grads(p, batch, rng, bands):
        feats, feat_lengths, labels, label_lengths = batch
        rngs = None
        if not deterministic:
            rngs = {"dropout": jax.random.fold_in(
                rng, jax.lax.axis_index(DATA_AXIS))}

        def loss_fn(p):
            enc, enc_lengths = model.apply({"params": p}, feats,
                                           feat_lengths, deterministic,
                                           method=_encode, rngs=rngs)
            pred = model.apply({"params": p}, labels, deterministic,
                               method=_predict, rngs=rngs)
            slen = label_lengths.astype(jnp.int32)
            if band_width is None:
                def joint_fn(jp, e_c, pr):
                    return joint_local.apply({"params": jp}, e_c, pr)

                costs = rnnt_loss_fused_joint(
                    enc, pred, labels, enc_lengths, slen, joint_fn,
                    p["joint"], blank_id=model.cfg.blank_id,
                    chunk_t=chunk_t, axis_name=MODEL_AXIS)
            else:
                def joint_fn(jp, e_c, pb):
                    return joint_local.apply({"params": jp}, e_c, pb,
                                             method="banded")

                costs = rnnt_loss_fused_joint_banded(
                    enc, pred, labels, enc_lengths, slen, joint_fn,
                    p["joint"], bands=bands, band_width=band_width,
                    blank_id=model.cfg.blank_id, chunk_t=chunk_t,
                    axis_name=MODEL_AXIS)
            total = jax.lax.psum(jnp.sum(costs), DATA_AXIS)
            n = jax.lax.psum(jnp.asarray(costs.shape[0], jnp.float32),
                             DATA_AXIS)
            return total / n

        return jax.value_and_grad(loss_fn)(p)

    if band_width is None:
        @_partial(shard_map, mesh=mesh, in_specs=(pspecs, dspecs, P()),
                  out_specs=(P(), pspecs))
        def loss_and_grads(p, batch, rng):
            return _loss_and_grads(p, batch, rng, None)
    else:
        @_partial(shard_map, mesh=mesh,
                  in_specs=(pspecs, dspecs, P(), bspecs),
                  out_specs=(P(), pspecs))
        def loss_and_grads(p, batch, rng, bands_pair):
            return _loss_and_grads(p, batch, rng, Bands(*bands_pair))

    def _step(state: TrainState, batch, *extra):
        rng = jax.random.fold_in(state.dropout_rng, state.step)
        loss, grads = loss_and_grads(state.params, batch, rng, *extra)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   "step": state.step}
        return new_state, metrics

    if band_width is None:
        def step(state: TrainState, batch):
            return _step(state, batch)
    else:
        def step(state: TrainState, batch, bands):
            return _step(state, batch, (bands.min_s, bands.max_s))

    return jax.jit(step, donate_argnums=(0,))


def make_grad_accum_train_step(n_micro: int, mesh: Mesh = None):
    """Train step that accumulates gradients over n_micro microbatches.

    The production lever for effective batch sizes beyond device memory:
    the batch splits into n_micro equal slices, a lax.scan runs
    value_and_grad per slice accumulating the mean, and ONE optimizer
    update applies at the end. With dropout disabled this is the same
    parameter update as a single step whose loss averages over the whole
    batch, up to fp summation order (tested); with dropout active each
    microbatch folds its own rng, so masks — and therefore the update —
    legitimately differ from the single-step ones. Peak activation memory
    is one microbatch's.

    With mesh set, the step is additionally jitted with the batch sharded
    over 'data' and params replicated (the make_sharded_train_step
    layout). GSPMD reshards each scan slice as needed; for zero-reshard
    execution make batch/n_micro divisible by the data axis too.

    Returns step(state, batch) -> (state, metrics); batch dims must divide
    by n_micro.
    """
    def step(state: TrainState, batch):
        feats, feat_lengths, labels, label_lengths = batch
        total = feats.shape[0]
        if total % n_micro:
            raise ValueError(f"batch {total} not divisible by "
                             f"n_micro {n_micro}")
        m = total // n_micro
        micro = jax.tree.map(
            lambda x: x.reshape(n_micro, m, *x.shape[1:]), batch)
        step_rng = jax.random.fold_in(state.dropout_rng, state.step)

        def loss_fn(params, mb, rng):
            mfeats, mflen, mlabels, mslen = mb
            costs = state.apply_fn({"params": params}, mfeats, mflen,
                                   mlabels, mslen, deterministic=False,
                                   rngs={"dropout": rng})
            return jnp.mean(costs)

        def accum(carry, xs):
            loss_acc, grad_acc = carry
            mb, i = xs
            rng = jax.random.fold_in(step_rng, i)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, mb, rng)
            return (loss_acc + loss / n_micro,
                    jax.tree.map(lambda a, g: a + g / n_micro, grad_acc,
                                 grads)), None

        init = (jnp.float32(0),
                jax.tree.map(jnp.zeros_like, state.params))
        (loss, grads), _ = jax.lax.scan(
            accum, init, (micro, jnp.arange(n_micro)))
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   "step": state.step}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step,
                   in_shardings=(repl, (data, data, data, data)),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


def make_sharded_train_step(mesh: Mesh):
    """jit train_step with batch sharded over 'data', params replicated.

    XLA turns the per-shard gradient contributions into an ICI all-reduce;
    nothing in the model code mentions communication.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        in_shardings=(repl, (data, data, data, data)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step, "dropout_rng": state.dropout_rng}), force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step, "dropout_rng": state.dropout_rng}
    restored = ckpt.restore(path, target)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"],
                         dropout_rng=restored["dropout_rng"])
