"""Golden fixtures: the reference's hand-computed worked example.

All constants come from the reference's README worked example
(reference README.md:83-174) and its test suites (tests/test_cpu.cpp:10-552).
These are *data* (expected values of a published algorithm), asserted to
guarantee numerical parity with the reference implementation.
"""

import numpy as np

V = 3
BLANK = 0

# README.md:88-106 — posteriors p_t(y | s) for T=4, S=2, V=3 (blank = 0).
README_PROBS = np.array([
    # t = 0
    [[0.6, 0.3, 0.1], [0.7, 0.1, 0.2], [0.5, 0.1, 0.4]],
    # t = 1
    [[0.5, 0.4, 0.1], [0.5, 0.1, 0.4], [0.8, 0.1, 0.1]],
    # t = 2
    [[0.4, 0.3, 0.3], [0.5, 0.1, 0.4], [0.7, 0.2, 0.1]],
    # t = 3
    [[0.8, 0.1, 0.1], [0.3, 0.1, 0.6], [0.8, 0.1, 0.1]],
], dtype=np.float32)  # [T=4, S+1=3, V=3]

README_LABELS = np.array([1, 2], dtype=np.int32)
README_LOSS = -np.log(0.363)  # README.md:126

# README.md:156-174 — gradients w.r.t. logits.
README_GRADS = np.array([
    [[0.04, -0.14, 0.1], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
    [[0.13, -0.19, 0.06], [-0.04, 0.04, -0.01], [0.0, 0.0, 0.0]],
    [[0.06, -0.1, 0.04], [0.01, 0.07, -0.08], [-0.06, 0.04, 0.02]],
    [[0.0, 0.0, 0.0], [0.14, 0.05, -0.19], [-0.11, 0.05, 0.05]],
], dtype=np.float32)

# tests/test_cpu.cpp:194-295 — two-sample batch, (T, S) = (2, 1) and (4, 2).
MULTIBATCH_SMALL_PROBS = np.array([
    # t = 0
    [[0.6, 0.3, 0.1], [0.7, 0.1, 0.2]],
    # t = 1
    [[0.5, 0.4, 0.1], [0.5, 0.1, 0.4]],
], dtype=np.float32)  # [T=2, S+1=2, V=3]
MULTIBATCH_SMALL_LABELS = np.array([1], dtype=np.int32)
MULTIBATCH_SMALL_LOSS = -np.log(0.39)
MULTIBATCH_SMALL_GRADS = np.array([
    [[-0.02, -0.08, 0.1], [0.0, 0.0, 0.0]],
    [[0.31, -0.37, 0.06], [-0.19, 0.04, 0.15]],
], dtype=np.float32)

# tests/test_cpu.cpp:405-433 — alignment-restricted golden losses.
ALIGN_A = np.array([0, 1, 0, 2], dtype=np.int32)
ALIGN_A_LOSSES = {2: -np.log(0.363), 1: -np.log(0.2958), 0: -np.log(0.072)}
# tests/test_cpu.cpp:532-545
ALIGN_B = np.array([1, 2, 0, 0], dtype=np.int32)
ALIGN_B_LOSSES = {1: -np.log(0.192), 0: -np.log(0.0672)}


def readme_batch():
    """README lattice as a padded [1, 4, 3, 3] logits batch (log-probs)."""
    logits = np.log(README_PROBS)[None]
    labels = README_LABELS[None]
    return (logits.astype(np.float32), labels,
            np.array([4], np.int32), np.array([2], np.int32))


def repeat_label_case(seed, batch, t, s, v, blank_id=0):
    """Random case with adjacent repeated labels planted around S/2.

    Mirrors the reference generator's deliberate repeat-planting
    (reference: tests/random.cpp:31-35): adjacent equal labels stress the
    label[s-1]/label[s] gather distinction in the stats and grad kernels
    (a wrong-slot gather is invisible when all labels differ only by
    luck). Labels avoid blank_id; blank may be any vocab index.
    """
    rng = np.random.RandomState(seed)
    logits = rng.randn(batch, t, s + 1, v).astype(np.float32) * 2
    labels = rng.randint(0, v - 1, size=(batch, s)).astype(np.int32)
    labels = np.where(labels >= blank_id, labels + 1, labels)  # skip blank
    mid = s // 2
    if s >= 2:
        labels[:, mid] = labels[:, mid - 1]          # plant l[m-1] == l[m]
    if s >= 4:
        labels[:, mid + 1] = labels[:, mid]          # a triple repeat
    ilen = np.full((batch,), t, np.int32)
    slen = np.full((batch,), s, np.int32)
    if batch > 1:
        ilen[1] = max(s + 1, t - 3)
        slen[-1] = max(0, s - 2)
    return logits, labels, ilen, slen


def multibatch(t_pad=None, s_pad=None):
    """Padded 2-sample batch mirroring tests/test_cpu.cpp:194-295.

    Padding cells are filled with zeros (an arbitrary finite value) to check
    padding-independence.
    """
    t_max = t_pad or 4
    s1 = (s_pad + 1) if s_pad else 3
    logits = np.zeros((2, t_max, s1, V), np.float32)
    logits[0, :2, :2] = np.log(MULTIBATCH_SMALL_PROBS)
    logits[1, :4, :3] = np.log(README_PROBS)
    labels = np.zeros((2, s1 - 1), np.int32)
    labels[0, :1] = MULTIBATCH_SMALL_LABELS
    labels[1, :2] = README_LABELS
    expected_losses = np.array([MULTIBATCH_SMALL_LOSS, README_LOSS], np.float32)
    expected_grads = np.zeros_like(logits)
    expected_grads[0, :2, :2] = MULTIBATCH_SMALL_GRADS
    expected_grads[1, :4, :3] = README_GRADS
    return (logits, labels, np.array([2, 4], np.int32),
            np.array([1, 2], np.int32), expected_losses, expected_grads)
