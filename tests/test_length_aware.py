"""Length-aware CTC mode: padded frames beyond the true signal length must
not affect the loss (unlike the reference-default full-length mode)."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.models import WaveNet, WaveNetClassifier
from wavenet_speech_tpu.training import (JointLoss, TrainState,
                                         build_optimizer,
                                         make_joint_train_step)


def _setup():
    levels, C = 16, 8
    base = WaveNet(levels, 2, ((C, C, 2, 1), (C, C, 2, 2)), levels,
                   softmax=False)
    clf = WaveNetClassifier(levels, 5, ((C, C, 2, 1),), C,
                            pool_kernel_size=1, softmax=False)
    params = {"base": base.init(jax.random.PRNGKey(0)),
              "ctc": clf.init(jax.random.PRNGKey(1))}
    tx = build_optimizer("adam", 1e-3)
    return base, clf, params, tx


def _batch(L_pad, true_len, rng):
    levels = 16
    sig = np.zeros((1, L_pad, levels), np.float32)
    lv = rng.integers(0, levels, size=true_len)
    sig[0, np.arange(true_len), lv] = 1.0
    return {
        "signal": jnp.asarray(sig),
        "labels": jnp.asarray([[1, 2, 3]], jnp.int32),
        "label_lengths": jnp.asarray([3], jnp.int32),
        "signal_lengths": jnp.asarray([true_len], jnp.int32),
    }


def test_length_aware_invariant_to_padding():
    rng = np.random.default_rng(0)
    base, clf, params, tx = _setup()
    fn = lambda sl: sl  # pool=1
    step = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                 donate=False, logit_length_fn=fn)
    b1 = _batch(L_pad=24, true_len=20, rng=np.random.default_rng(1))
    b2 = dict(b1)
    b2["signal"] = jnp.pad(b1["signal"], ((0, 0), (0, 16), (0, 0)))
    s1 = TrainState.create(params, tx)
    s2 = TrainState.create(params, tx)
    _, m1 = step(s1, b1)
    _, m2 = step(s2, b2)
    # CTC must be padding-invariant in length-aware mode; note the XE term
    # divides by padded L (reference semantics), so compare CTC only
    np.testing.assert_allclose(float(m1["ctc_loss"]) * 24,
                               float(m2["ctc_loss"]) * 40, rtol=1e-4)


def test_default_mode_depends_on_padding():
    """Sanity: the reference-default (full-length) mode is NOT padding
    invariant, which is why length_aware_ctc exists."""
    base, clf, params, tx = _setup()
    step = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                 donate=False)
    b1 = _batch(24, 20, np.random.default_rng(1))
    b2 = dict(b1)
    b2["signal"] = jnp.pad(b1["signal"], ((0, 0), (0, 16), (0, 0)))
    _, m1 = step(TrainState.create(params, tx), b1)
    _, m2 = step(TrainState.create(params, tx), b2)
    assert abs(float(m1["ctc_loss"]) * 24 - float(m2["ctc_loss"]) * 40) > 1e-3
