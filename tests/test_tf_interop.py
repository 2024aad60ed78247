"""TF binding tests — parity with reference tensorflow_binding/test.py.

Covers: golden forward + gradients through tf.GradientTape (reference
test.py:9-67), the alignment-restricted variant (test.py:70-124), cotangent
scaling through the registered gradient (register_op.py:77-148 chain rule),
multibatch packed offsets, and the padded-layout jax2tf path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

tf = pytest.importorskip("tensorflow")

from monotonic_rnnt_tpu.interop.tf_binding import (monotonic_rnnt_loss,
                                                   monotonic_rnnt_loss_padded)
from monotonic_rnnt_tpu.interop.returnn_op import (
    monotonic_rnnt_loss as returnn_loss)
from monotonic_rnnt_tpu.ops.packing import pack_acts

import golden


def _packed_readme():
    logits, labels, ilen, slen = golden.readme_batch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    return (tf.constant(packed), tf.constant(labels), tf.constant(ilen),
            tf.constant(slen))


def test_tf_golden_forward_backward():
    acts, labels, ilen, slen = _packed_readme()
    with tf.GradientTape() as tape:
        tape.watch(acts)
        costs = monotonic_rnnt_loss(acts, labels, ilen, slen)
        total = tf.reduce_sum(costs)
    np.testing.assert_allclose(costs.numpy(), [golden.README_LOSS], atol=1e-4)
    grads = tape.gradient(total, acts)
    np.testing.assert_allclose(grads.numpy().reshape(4, 3, 3),
                               golden.README_GRADS, atol=1e-2)


def test_tf_cotangent_scaling():
    acts, labels, ilen, slen = _packed_readme()
    with tf.GradientTape() as tape:
        tape.watch(acts)
        total = 2.5 * tf.reduce_sum(
            monotonic_rnnt_loss(acts, labels, ilen, slen))
    grads = tape.gradient(total, acts)
    np.testing.assert_allclose(grads.numpy().reshape(4, 3, 3),
                               2.5 * golden.README_GRADS, atol=3e-2)


def test_tf_align_restrict_golden():
    acts, labels, ilen, slen = _packed_readme()
    c1 = monotonic_rnnt_loss(acts, labels, ilen, slen,
                             alignment=tf.constant(golden.ALIGN_A[None]),
                             max_distance_from_alignment=1)
    np.testing.assert_allclose(c1.numpy(), [1.22], atol=1e-2)
    c2 = monotonic_rnnt_loss(acts, labels, ilen, slen,
                             alignment=tf.constant(golden.ALIGN_B[None]),
                             max_distance_from_alignment=0)
    np.testing.assert_allclose(c2.numpy(), [2.7], atol=1e-2)


def test_tf_multibatch():
    logits, labels, ilen, slen, exp_losses, _ = golden.multibatch()
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    costs = monotonic_rnnt_loss(tf.constant(packed), tf.constant(labels),
                                tf.constant(ilen), tf.constant(slen))
    np.testing.assert_allclose(costs.numpy(), exp_losses, atol=1e-4)


def test_tf_graph_mode():
    acts, labels, ilen, slen = _packed_readme()

    @tf.function
    def step(a):
        with tf.GradientTape() as tape:
            tape.watch(a)
            total = tf.reduce_sum(monotonic_rnnt_loss(a, labels, ilen, slen))
        return total, tape.gradient(total, a)

    total, grads = step(acts)
    assert float(total) == pytest.approx(golden.README_LOSS, abs=1e-4)
    assert grads.shape == acts.shape


def test_tf_padded_jax2tf_path():
    logits, labels, ilen, slen = golden.readme_batch()
    x = tf.constant(np.asarray(logits, np.float32))
    with tf.GradientTape() as tape:
        tape.watch(x)
        costs = monotonic_rnnt_loss_padded(x, tf.constant(labels),
                                           tf.constant(ilen),
                                           tf.constant(slen))
        total = tf.reduce_sum(costs)
    np.testing.assert_allclose(costs.numpy(), [golden.README_LOSS], atol=1e-4)
    grads = tape.gradient(total, x)
    np.testing.assert_allclose(grads.numpy()[0], golden.README_GRADS,
                               atol=1e-2)


def test_returnn_surface():
    acts, labels, ilen, slen = _packed_readme()
    costs = returnn_loss(acts, labels, ilen, slen, blank_label=0)
    np.testing.assert_allclose(costs.numpy(), [golden.README_LOSS], atol=1e-4)


def test_tf_no_inf_nan_random():
    # Reference tensorflow_binding/test.py size-test property: finite outputs.
    rng = np.random.RandomState(0)
    B, T, S, V = 2, 20, 5, 11
    logits = rng.randn(B, T, S + 1, V).astype(np.float32)
    labels = rng.randint(1, V, size=(B, S)).astype(np.int32)
    ilen = np.array([T, T - 3], np.int32)
    slen = np.array([S, S - 2], np.int32)
    packed = np.asarray(pack_acts(jnp.asarray(logits), ilen, slen))
    with tf.GradientTape() as tape:
        a = tf.constant(packed)
        tape.watch(a)
        costs = monotonic_rnnt_loss(a, tf.constant(labels), tf.constant(ilen),
                                    tf.constant(slen))
        total = tf.reduce_sum(costs)
    g = tape.gradient(total, a)
    assert np.all(np.isfinite(costs.numpy()))
    assert np.all(np.isfinite(g.numpy()))


def test_tf_banded_padded_matches_jax():
    """jax2tf band-layout entry: costs + tape gradients match the JAX path."""
    import jax
    from monotonic_rnnt_tpu.interop.tf_binding import \
        monotonic_rnnt_loss_banded as tf_banded
    from monotonic_rnnt_tpu.ops.banded import \
        monotonic_rnnt_loss_banded as jax_banded
    from monotonic_rnnt_tpu.ops.bands import (Bands, bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width)

    rng = np.random.RandomState(4)
    B, T, S, V = 2, 14, 4, 11
    logits = rng.randn(B, T, S + 1, V).astype(np.float32)
    labels = rng.randint(1, V, (B, S)).astype(np.int32)
    ilen = np.array([14, 10], np.int32)
    slen = np.array([4, 2], np.int32)
    align = np.zeros((B, T), np.int32)
    for b in range(B):
        pos = np.sort(rng.choice(ilen[b], size=slen[b], replace=False))
        align[b, pos] = labels[b, :slen[b]]
    bands = bands_from_alignment(jnp.asarray(align), jnp.asarray(ilen),
                                 jnp.asarray(slen), 1, 0)
    w = int(required_band_width(jnp.asarray(ilen), jnp.asarray(slen), bands,
                                T, S + 1))
    layout = compute_band_layout(jnp.asarray(ilen), jnp.asarray(slen), bands,
                                 T, S + 1, w)
    lb = np.asarray(pack_band(jnp.asarray(logits), layout))

    lb_tf = tf.constant(lb)
    with tf.GradientTape() as tape:
        tape.watch(lb_tf)
        costs_tf = tf_banded(lb_tf, labels, ilen, slen,
                             np.asarray(bands.min_s), np.asarray(bands.max_s))
        total = tf.reduce_sum(costs_tf)
    g_tf = tape.gradient(total, lb_tf)

    val, g = jax.value_and_grad(lambda x: jnp.sum(jax_banded(
        x, jnp.asarray(labels), jnp.asarray(ilen), jnp.asarray(slen),
        bands=bands, backend="reference")))(jnp.asarray(lb))
    np.testing.assert_allclose(float(total), float(val), rtol=1e-5)
    np.testing.assert_allclose(g_tf.numpy(), np.asarray(g), rtol=1e-4,
                               atol=1e-6)


@pytest.mark.slow  # ~40-80 s: SavedModel/export round-trip; default suite keeps the smaller round-trips
def test_tf_saved_model_roundtrip_losses(tmp_path):
    """SavedModel save/load of the jax2tf loss surface preserves outputs.

    The packed numpy_function path is eager/in-process only by design; the
    padded and banded XLA paths are the exportable contract (reference's
    installable TF op role).
    """
    from monotonic_rnnt_tpu.interop.tf_binding import make_tf_loss_module
    from monotonic_rnnt_tpu.ops.bands import (bands_from_alignment,
                                              compute_band_layout, pack_band,
                                              required_band_width)

    logits, labels, ilen, slen = golden.readme_batch()
    x = tf.constant(np.asarray(logits, np.float32))
    labels_t, ilen_t, slen_t = (tf.constant(labels), tf.constant(ilen),
                                tf.constant(slen))

    bands = bands_from_alignment(jnp.asarray(golden.ALIGN_A[None]),
                                 jnp.asarray(ilen), jnp.asarray(slen), 1, 0)
    w = int(required_band_width(jnp.asarray(ilen), jnp.asarray(slen), bands,
                                logits.shape[1], labels.shape[1] + 1))
    layout = compute_band_layout(jnp.asarray(ilen), jnp.asarray(slen), bands,
                                 logits.shape[1], labels.shape[1] + 1, w)
    lb = tf.constant(np.asarray(pack_band(jnp.asarray(logits), layout)))
    bmin, bmax = tf.constant(np.asarray(bands.min_s)), tf.constant(
        np.asarray(bands.max_s))

    module = make_tf_loss_module()
    c_pad = module.padded(x, labels_t, ilen_t, slen_t)       # trace + value
    c_band = module.banded(lb, labels_t, ilen_t, slen_t, bmin, bmax)
    np.testing.assert_allclose(c_pad.numpy(), [golden.README_LOSS],
                               atol=1e-4)

    path = str(tmp_path / "mrnnt_tf")
    tf.saved_model.save(
        module, path,
        options=tf.saved_model.SaveOptions(
            experimental_custom_gradients=True))
    loaded = tf.saved_model.load(path)
    np.testing.assert_allclose(
        loaded.padded(x, labels_t, ilen_t, slen_t).numpy(), c_pad.numpy(),
        atol=1e-6)
    np.testing.assert_allclose(
        loaded.banded(lb, labels_t, ilen_t, slen_t, bmin, bmax).numpy(),
        c_band.numpy(), atol=1e-6)


@pytest.mark.slow  # ~40-80 s: SavedModel/export round-trip; default suite keeps the smaller round-trips
def test_tf_saved_model_roundtrip_decoder(tmp_path):
    """SavedModel decoder artifact (weights as variables) == JAX decode."""
    import jax
    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.interop.tf_binding import make_tf_decoder_module
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=1, dim=64, num_heads=2,
                                dropout=0.0),
        predictor=PredictorConfig(vocab_size=32, dim=64, embed_dim=32),
        joint_dim=64, vocab_size=32)
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=32, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)
    ref_hyp, ref_n = jax.jit(lambda p, f, fl: model.apply(
        p, f, fl, 6, method="greedy_decode"))(params, feats, flen)

    module = make_tf_decoder_module(model, params, 6)
    hyp, n = module.decode(np.asarray(feats), np.asarray(flen))  # trace
    np.testing.assert_array_equal(hyp.numpy(), np.asarray(ref_hyp))

    path = str(tmp_path / "mrnnt_decoder")
    tf.saved_model.save(module, path)
    loaded = tf.saved_model.load(path)
    hyp_l, n_l = loaded.decode(np.asarray(feats), np.asarray(flen))
    np.testing.assert_array_equal(hyp_l.numpy(), np.asarray(ref_hyp))
    np.testing.assert_array_equal(n_l.numpy(), np.asarray(ref_n))


def test_tf_greedy_decoder_matches_jax():
    """jax2tf greedy decoder == JAX greedy decode (eager and tf.function)."""
    import jax
    from monotonic_rnnt_tpu.data.synthetic import tiny_batch
    from monotonic_rnnt_tpu.interop.tf_binding import make_tf_greedy_decoder
    from monotonic_rnnt_tpu.models.conformer import ConformerConfig
    from monotonic_rnnt_tpu.models.predictor import PredictorConfig
    from monotonic_rnnt_tpu.models.transducer import (MonotonicTransducer,
                                                      TransducerConfig)

    cfg = TransducerConfig(
        encoder=ConformerConfig(num_layers=1, dim=64, num_heads=2,
                                dropout=0.0),
        predictor=PredictorConfig(vocab_size=32, dim=64, embed_dim=32),
        joint_dim=64, vocab_size=32)
    model = MonotonicTransducer(cfg)
    feats, flen, labels, slen = (jnp.asarray(a) for a in tiny_batch(
        batch=2, t=32, feat_dim=16, s=4, vocab=32))
    params = model.init(jax.random.PRNGKey(0), feats, flen, labels, slen)

    ref_hyp, ref_n = jax.jit(lambda p, f, fl: model.apply(
        p, f, fl, 6, method="greedy_decode"))(params, feats, flen)

    decoder = make_tf_greedy_decoder(model, 6)
    hyp, n = decoder(params, np.asarray(feats), np.asarray(flen))
    np.testing.assert_array_equal(hyp.numpy(), np.asarray(ref_hyp))
    np.testing.assert_array_equal(n.numpy(), np.asarray(ref_n))

    graph_decoder = tf.function(decoder)
    hyp_g, n_g = graph_decoder(params, np.asarray(feats), np.asarray(flen))
    np.testing.assert_array_equal(hyp_g.numpy(), np.asarray(ref_hyp))
    np.testing.assert_array_equal(n_g.numpy(), np.asarray(ref_n))
