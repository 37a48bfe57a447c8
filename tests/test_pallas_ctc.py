"""Fused Pallas CTC kernels vs the XLA scan path (interpret mode on CPU):
values, gradients, variable lengths, and the reference known-answer anchors."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_speech_tpu.ops.ctc import (
    ctc_forward_logprob,
    ctc_loss_per_seq,
)
from wavenet_speech_tpu.ops.pallas.ctc import ctc_forward_logprob_pallas


def _rand(B=4, T=37, S=9, C=5, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    labels = rng.integers(1, C, size=(B, S)).astype(np.int32)
    ll = rng.integers(1, S + 1, size=(B,)).astype(np.int32)
    tl = rng.integers(2 * S + 1, T + 1, size=(B,)).astype(np.int32)
    return (jnp.asarray(logits), jnp.asarray(tl), jnp.asarray(labels),
            jnp.asarray(ll))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_matches_xla(seed):
    logits, tl, labels, ll = _rand(seed=seed)
    lp = jax.nn.log_softmax(logits, axis=-1)
    ref = ctc_forward_logprob(lp, tl, labels, ll)
    got = ctc_forward_logprob_pallas(lp, tl, labels, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_xla():
    logits, tl, labels, ll = _rand(seed=3)

    def loss_x(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return -jnp.sum(ctc_forward_logprob(lp, tl, labels, ll))

    def loss_p(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return -jnp.sum(ctc_forward_logprob_pallas(lp, tl, labels, ll))

    vx, gx = jax.value_and_grad(loss_x)(logits)
    vp, gp = jax.value_and_grad(loss_p)(logits)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-6)


def test_weighted_cotangent_and_jit():
    logits, tl, labels, ll = _rand(seed=4, B=3, T=29, S=6)
    w = jnp.asarray([0.5, 2.0, -1.0])

    def loss_p(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(w * ctc_forward_logprob_pallas(lp, tl, labels, ll))

    def loss_x(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(w * ctc_forward_logprob(lp, tl, labels, ll))

    gp = jax.jit(jax.grad(loss_p))(logits)
    gx = jax.grad(loss_x)(logits)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-6)


def test_known_answers_via_pallas_path():
    """The two reference anchors (tests/test_classifier.py:52-59 = 2.4628;
    CTC Overfit.ipynb cell 27 = 1.4519) through the Pallas kernels."""
    # 2-step example
    acts = jnp.asarray(np.array(
        [[[0.1, 0.6, 0.1, 0.1, 0.1],
          [0.1, 0.1, 0.6, 0.1, 0.1]]], np.float32))
    lp = jax.nn.log_softmax(acts, axis=-1)
    v = -ctc_forward_logprob_pallas(
        lp, jnp.asarray([2]), jnp.asarray([[1, 2]]), jnp.asarray([2]))
    np.testing.assert_allclose(float(v[0]), 2.4628, atol=2e-4)
    # 1-step warp-ctc example (T=1, activations -10..-6, label 3)
    acts1 = jnp.asarray([[[-10.0, -9.0, -8.0, -7.0, -6.0]]])
    lp1 = jax.nn.log_softmax(acts1, axis=-1)
    v1 = -ctc_forward_logprob_pallas(
        lp1, jnp.asarray([1]), jnp.asarray([[3]]), jnp.asarray([1]))
    np.testing.assert_allclose(float(v1[0]), 1.4519, atol=5e-3)


def test_long_sequence_multi_chunk():
    """T large enough to span several time chunks (grid > 1)."""
    logits, tl, labels, ll = _rand(B=2, T=300, S=11, seed=5)
    lp = jax.nn.log_softmax(logits, axis=-1)
    ref = ctc_forward_logprob(lp, tl, labels, ll)
    got = ctc_forward_logprob_pallas(lp, tl, labels, ll)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda x: -jnp.sum(ctc_forward_logprob(
        jax.nn.log_softmax(x, -1), tl, labels, ll)))(logits)
    g_got = jax.grad(lambda x: -jnp.sum(ctc_forward_logprob_pallas(
        jax.nn.log_softmax(x, -1), tl, labels, ll)))(logits)
    # autodiff-through-scan and the analytic alpha*beta posterior round
    # independently over 300 frames of f32 log-space work
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=5e-3, atol=5e-4)
