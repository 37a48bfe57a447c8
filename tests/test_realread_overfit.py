"""Real-read overfit golden anchor (VERDICT r4 #4): joint WaveNet-CTC
overfit on ONE read from the real-data HDF5 pipeline to per-char CTC < 0.3
with the early-stop criterion, greedy decode bit-matching the read's true
bases — the reference's canonical convergence demo
(reference ipynbs/CTC Overfit.ipynb cell 19,
reference tests/wavenet_overfit_test.py:16-63) reproduced on the
worker_fns data layout instead of synthetic pore fixtures."""
import numpy as np
import jax

import tests.make_golden_realread as mgr
from wavenet_speech_tpu.decoding import greedy_ctc_decode, labels2strings
from wavenet_speech_tpu.models import WaveNet, WaveNetClassifier
from wavenet_speech_tpu.training import (
    JointLoss,
    TrainState,
    build_optimizer,
    make_joint_train_step,
)


def test_realread_window_fixture_bitmatch(tmp_path):
    """The committed window fixture must be regenerable bit-exactly from
    the live pipeline (r9.4 physics read -> worker_fns HDF5 layout ->
    ecoli_worker_fn windowing) — guards generator/loader drift."""
    want = dict(np.load(mgr.OUT, allow_pickle=False))
    got = mgr.build(tmp_path)
    for k in ("signal", "labels", "label_lengths", "signal_lengths",
              "subintervals"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_realread_overfit_joint_wavenet_ctc():
    """Overfit to per-char CTC < 0.3 (the reference's early-stop
    criterion), then greedy-decode the read windows bit-exactly."""
    fx = dict(np.load(mgr.OUT, allow_pickle=False))
    batch = {
        "signal": fx["signal"].astype(np.int32),  # levels: one-hot on device
        "labels": fx["labels"].astype(np.int32),
        "label_lengths": fx["label_lengths"].astype(np.int32),
        "signal_lengths": fx["signal_lengths"].astype(np.int32),
    }
    levels, C = mgr.NUM_LEVELS, 32
    base = WaveNet(levels, 2, tuple((C, C, 2, d) for d in (1, 2, 4)),
                   levels, softmax=False)
    clf = WaveNetClassifier(levels, 5,
                            tuple((C, C, 2, d) for d in (1, 2, 4)) * 2,
                            C, pool_kernel_size=1, softmax=False)
    params = {"base": base.init(jax.random.PRNGKey(0)),
              "ctc": clf.init(jax.random.PRNGKey(1))}
    tx = build_optimizer("adam", 2e-3)
    state = TrainState.create(params, tx)
    step = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                 donate=False)

    per_char = None
    hit_criterion_at = None
    for i in range(2500):
        state, metrics = step(state, batch)
        per_char = float(metrics["ctc_loss"]) * batch["signal"].shape[1] / \
            float(batch["label_lengths"].sum())
        if hit_criterion_at is None and per_char < 0.3:
            hit_criterion_at = i  # the reference's early-stop criterion
        if per_char < 0.02:  # deep overfit: greedy decode must lock exactly
            break
    assert hit_criterion_at is not None, f"per-char CTC {per_char}"

    signal_onehot = jax.nn.one_hot(batch["signal"], levels,
                                   dtype=np.float32)
    logits = clf.apply(state.params["ctc"],
                       base.apply(state.params["base"], signal_onehot))
    decoded = greedy_ctc_decode(np.asarray(logits))
    labels = fx["labels"]
    lens = fx["label_lengths"]
    expected = labels2strings([labels[b, : lens[b]]
                               for b in range(labels.shape[0])])
    assert decoded == expected  # greedy bit-match on the real-read windows
