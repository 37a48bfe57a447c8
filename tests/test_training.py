"""Training-layer tests: XE loss parity vs the reference's per-timestep
torch loop, optimizer facade, and the end-to-end overfit slice (the
framework's v0 milestone: synthetic pore batch -> jit joint train step ->
greedy decode -> per-char CTC < 0.3, mirroring
legacy_code/wavenet_ctc_artificial.py:144-193)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from wavenet_speech_tpu.data import PoreModelLoader, batch_to_device
from wavenet_speech_tpu.decoding import greedy_ctc_decode, labels2strings, ctc_collapse
from wavenet_speech_tpu.models import WaveNet, WaveNetClassifier
from wavenet_speech_tpu.training import (
    JointLoss,
    Optimizer,
    ReduceLROnPlateau,
    TrainState,
    build_optimizer,
    make_ctc_train_step,
    make_joint_train_step,
    next_signal_xe_loss,
)


def test_xe_loss_matches_reference_loop(rng):
    """Vectorized XE must equal the reference's python-loop XE
    (Loss.py:38-43)."""
    B, L, C = 3, 20, 8
    signal = np.zeros((B, L, C), np.float32)
    levels = rng.integers(0, C, size=(B, L))
    signal[np.arange(B)[:, None], np.arange(L)[None, :], levels] = 1.0
    pred = rng.standard_normal((B, L, C)).astype(np.float32)

    ours = float(next_signal_xe_loss(jnp.asarray(signal), jnp.asarray(pred)))

    # reference: dense = argmax(signal[:,:,1:], dim=1) on NCL; loop over t
    xe_fn = nn.CrossEntropyLoss()
    sig_t = torch.from_numpy(signal.transpose(0, 2, 1))
    pred_t = torch.from_numpy(pred.transpose(0, 2, 1))
    _, dense = torch.max(sig_t[:, :, 1:], dim=1)
    xe = 0.0
    for t in range(pred_t.size(2) - 1):
        xe = xe + xe_fn(pred_t[:, :, t], dense[:, t])
    expected = float(xe / sig_t.size(2))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_build_optimizer_types():
    for t in ["adam", "adagrad", "adamax", "rmsprop", "sgd", "adamw"]:
        tx = build_optimizer(t, 1e-3, weight_decay=1e-4, max_grad_norm=1.0)
        params = {"w": jnp.ones((3,))}
        state = tx.init(params)
        updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
        assert updates["w"].shape == (3,)


def test_reduce_lr_on_plateau():
    opt = Optimizer("adam", 1e-2)
    sched = ReduceLROnPlateau(opt, factor=0.5, patience=1)
    sched.step(1.0)
    sched.step(1.1)
    sched.step(1.2)  # 2 bad steps > patience -> reduce
    assert abs(sched.current_lr - 5e-3) < 1e-12
    assert abs(opt._lr_scale - 0.5) < 1e-12


def test_ctc_collapse_and_strings():
    labels = np.array([[1, 1, 0, 2, 2, 0, 0, 3],
                       [0, 4, 4, 4, 0, 1, 0, 0]])
    collapsed = ctc_collapse(labels)
    assert labels2strings(collapsed) == ["AGC", "TA"]
    # reference labels2strings on raw labels (no collapse): blanks drop only
    assert labels2strings(labels)[0] == "AAGGC"


def test_e2e_overfit_joint_wavenet_ctc():
    """The v0 end-to-end slice (SURVEY.md §7 item 5): tiny joint WaveNet-CTC
    overfit on a fixed synthetic pore batch; success = per-char CTC < 0.3
    (reference early-stop criterion) and correct greedy decode."""
    levels = 32
    loader = PoreModelLoader(max_iters=10 ** 9, num_epochs=10 ** 6,
                             epoch_size=100, batch_size=2, num_levels=levels,
                             lengths=(8, 12), sample_rate=2,
                             sample_noise=0.5, seed=7)
    batch = batch_to_device(loader.fetch())

    C = 32
    wn_layers = tuple((C, C, 2, d) for d in (1, 2, 4))
    base = WaveNet(levels, 2, wn_layers, levels, softmax=False)
    clf_layers = tuple((C, C, 2, d) for d in (1, 2, 4)) * 2
    clf = WaveNetClassifier(levels, 5, clf_layers, C, pool_kernel_size=1,
                            softmax=False)

    key = jax.random.PRNGKey(0)
    params = {"base": base.init(key), "ctc": clf.init(jax.random.PRNGKey(1))}
    tx = build_optimizer("adam", 2e-3)
    state = TrainState.create(params, tx)
    step = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                 donate=False)

    per_char = None
    for i in range(400):
        state, metrics = step(state, batch)
        per_char = float(metrics["ctc_loss"]) * batch["signal"].shape[1] / \
            float(batch["label_lengths"].sum())
        if per_char < 0.25:
            break
    assert per_char is not None and per_char < 0.3, f"per-char CTC {per_char}"

    # greedy decode must reproduce the target sequences exactly (bit-match
    # fixture, BASELINE north star); decode through the same base->ctc
    # pipeline used in training and in facade Model.predict
    logits = clf.apply(state.params["ctc"],
                       base.apply(state.params["base"], batch["signal"]))
    decoded = greedy_ctc_decode(np.asarray(logits))
    labels = np.asarray(batch["labels"])
    lens = np.asarray(batch["label_lengths"])
    expected = labels2strings([labels[b, : lens[b]] for b in range(2)])
    assert decoded == expected


def test_update_norm_clipping_bounds_updates():
    """max_update_norm clips the post-optimizer update, not the raw grads
    (raw grad norms of the batch-summed CTC are O(1e13); gradient clipping
    at small thresholds destroys adamax's update direction)."""
    import optax

    from wavenet_speech_tpu.training import build_optimizer

    params = {"w": jnp.ones((64,))}
    grads = {"w": jnp.full((64,), 1e12)}  # absurd-scale gradient spike
    tx = build_optimizer("adamax", 1.0, max_update_norm=0.5)
    st = tx.init(params)
    upd, _ = tx.update(grads, st, params)
    assert float(optax.global_norm(upd)) <= 0.5 + 1e-6
    # and without the spike, normal updates are untouched by a loose bound
    tx2 = build_optimizer("adamax", 1e-3, max_update_norm=10.0)
    st2 = tx2.init(params)
    upd2, _ = tx2.update({"w": jnp.full((64,), 0.1)}, st2, params)
    n = float(optax.global_norm(upd2))
    assert 0 < n < 10.0


def test_nonfinite_step_is_skipped():
    """A poisoned batch (inf signal -> non-finite loss/grads) must leave
    params AND optimizer state untouched (skip, not NaN-poison — the round-2
    and round-3 anneal-leg divergences), and the next finite batch must
    train normally."""
    import jax
    import jax.numpy as jnp

    from wavenet_speech_tpu.models import RawCTCNet
    from wavenet_speech_tpu.training import (TrainState, build_optimizer,
                                             make_ctc_train_step)

    F = 8
    net = RawCTCNet(num_features=F, feature_kwidth=3, num_labels=5,
                    layers=((F, F, 2, 1),), out_dim=F, positions=False,
                    softmax=False)
    params = net.init(jax.random.PRNGKey(0))
    tx = build_optimizer("adamax", 1e-3, max_update_norm=30.0)
    state = TrainState.create(params, tx)
    step = make_ctc_train_step(net, tx, donate=False)
    rng = np.random.default_rng(0)
    good = {
        "signal": rng.standard_normal((2, 32, 1)).astype(np.float32),
        "labels": rng.integers(1, 5, size=(2, 4)).astype(np.int32),
        "label_lengths": np.full((2,), 4, np.int32),
    }
    bad = dict(good, signal=np.full((2, 32, 1), np.inf, np.float32))

    state1, m1 = step(state, good)
    assert int(m1["skipped_nonfinite"]) == 0
    state2, m2 = step(state1, bad)
    assert int(m2["skipped_nonfinite"]) == 1
    assert not np.isfinite(float(m2["total_loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state1.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues normally after the skip
    state3, m3 = step(state2, good)
    assert int(m3["skipped_nonfinite"]) == 0
    assert np.isfinite(float(m3["total_loss"]))
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                               jax.tree_util.tree_leaves(state3.params)))


def test_multi_step_scan_matches_sequential():
    """steps_per_call > 1 compiles K optimizer steps into ONE dispatched
    program (trainer._scan_steps — erases the per-step dispatch tax the
    reference pays in its Python loop, wavenet_speech.py:59-80). K scanned
    steps must reproduce K sequential single-step calls exactly, in both
    batch modes (same batch re-fed / K stacked batches)."""
    D, L, B, K = 8, 64, 2, 4
    base = WaveNet(D, 2, tuple((D, D, 2, d) for d in (1, 2)), D,
                   softmax=False)
    clf = WaveNetClassifier(D, 5, tuple((D, D, 2, d) for d in (1, 2)), D,
                            pool_kernel_size=4, softmax=False)
    params = {"base": base.init(jax.random.PRNGKey(0)),
              "ctc": clf.init(jax.random.PRNGKey(1))}
    tx = build_optimizer("adagrad", 3e-4)
    rng = np.random.default_rng(0)

    def mk_batch(seed):
        r = np.random.default_rng(seed)
        sig = np.eye(D, dtype=np.float32)[r.integers(0, D, size=(B, L))]
        return {"signal": jnp.asarray(sig),
                "labels": jnp.asarray(r.integers(1, 5, size=(B, 6)),
                                      jnp.int32),
                "label_lengths": jnp.full((B,), 6, jnp.int32),
                "signal_lengths": jnp.full((B,), L, jnp.int32)}

    step1 = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                  donate=False)

    # mode 1: one batch re-fed to every inner step (bench.py's workload)
    batch = mk_batch(0)
    s_seq = TrainState.create(params, tx)
    for _ in range(K):
        s_seq, m_seq = step1(s_seq, batch)
    stepK = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                  donate=False, steps_per_call=K,
                                  multi_same_batch=True)
    s_multi, m_multi = stepK(TrainState.create(params, tx), batch)
    assert m_multi["total_loss"].shape == (K,)
    np.testing.assert_allclose(float(m_multi["total_loss"][-1]),
                               float(m_seq["total_loss"]), rtol=1e-6)
    assert int(s_multi.step) == K
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_seq.params),
            jax.tree_util.tree_leaves_with_path(s_multi.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                                   atol=1e-7,
                                   err_msg=jax.tree_util.keystr(kp))

    # mode 2: K distinct batches stacked on a leading scan axis (the
    # cli.py steps_per_call path)
    batches = [mk_batch(i) for i in range(K)]
    s_seq = TrainState.create(params, tx)
    for b in batches:
        s_seq, m_seq = step1(s_seq, b)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    stepKs = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                   donate=False, steps_per_call=K,
                                   multi_same_batch=False)
    s_multi, m_multi = stepKs(TrainState.create(params, tx), stacked)
    np.testing.assert_allclose(float(m_multi["total_loss"][-1]),
                               float(m_seq["total_loss"]), rtol=1e-6)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(s_seq.params),
            jax.tree_util.tree_leaves_with_path(s_multi.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6,
                                   atol=1e-7,
                                   err_msg=jax.tree_util.keystr(kp))


def test_safe_global_norm_and_all_finite_overflow_regression():
    """Round-5 postmortem regression: a FINITE gradient tree at the scale
    the batch-summed CTC loss actually produces (|g|max ~1e18) overflows
    optax.global_norm's f32 sum-of-squares to inf — which silently froze
    12k consecutive quality-run steps via the skip guard
    (results/tpu_r5/freeze_repro.json). The overflow-proof predicates the
    trainer now uses must report the truth."""
    import optax

    from wavenet_speech_tpu.training.trainer import (all_finite,
                                                     global_norm_safe)

    big = {"a": jnp.full((1000,), 1e18, jnp.float32),
           "b": jnp.full((100,), -2e18, jnp.float32)}
    # the naive norm overflows on these fully-finite values...
    assert not np.isfinite(float(optax.global_norm(big)))
    # ...the safe norm matches the f64 ground truth
    want = float(np.sqrt(1000 * (1e18) ** 2 + 100 * (2e18) ** 2))
    got = float(global_norm_safe(big))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert bool(all_finite(big))

    poisoned = dict(big, c=jnp.asarray([1.0, np.inf], jnp.float32))
    assert not bool(all_finite(poisoned))
    assert not np.isfinite(float(global_norm_safe(poisoned)))

    # ordinary scales: safe norm == naive norm
    small = {"a": jnp.asarray([3.0, 4.0]), "b": jnp.zeros((5,))}
    np.testing.assert_allclose(float(global_norm_safe(small)),
                               float(optax.global_norm(small)), rtol=1e-6)
    zero = {"a": jnp.zeros((4,))}
    assert float(global_norm_safe(zero)) == 0.0


def test_huge_finite_grads_are_not_skipped():
    """A training step whose gradients are astronomically large but FINITE
    must APPLY its (update-norm-clipped) update, not skip it — the exact
    silent-freeze scenario of the round-5 leg 3."""
    import optax

    from wavenet_speech_tpu.training.trainer import TrainState

    from wavenet_speech_tpu.training import build_optimizer

    # loss with gradient 1e18 * sign pattern — finite, overflow-scale
    def loss_fn(p, batch):
        return jnp.sum(p["w"] * batch["x"]) * 1e18, {"ctc_loss": jnp.zeros(())}

    tx = build_optimizer("adamax", 1e-3, max_update_norm=30.0)
    params = {"w": jnp.ones((64,))}
    state = TrainState.create(params, tx)
    batch = {"x": jnp.ones((64,))}

    # replicate the trainer's step body on this loss (the factories are
    # CTC-bound; the guard logic under test is shared)
    from wavenet_speech_tpu.training.trainer import (all_finite,
                                                     global_norm_safe)

    (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, batch)
    gnorm = global_norm_safe(grads)
    ok = jnp.isfinite(total) & all_finite(grads)
    assert bool(ok)                       # finite grads -> step proceeds
    assert np.isfinite(float(gnorm)) and float(gnorm) > 1e18
    updates, _ = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # the update actually moved the params, bounded by the update-norm clip
    delta = float(jnp.linalg.norm(new_params["w"] - state.params["w"]))
    assert 0.0 < delta <= 30.0 + 1e-6
