"""Sequence-sharded CTC loss: value and GRADIENT equality vs the
single-device loss on the virtual 8-device mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq
from wavenet_speech_tpu.parallel import make_mesh
from wavenet_speech_tpu.parallel.ctc_sharded import ctc_loss_seq_sharded


def _batch(B=4, T=48, S=7, C=5, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    labels = rng.integers(1, C, size=(B, S)).astype(np.int32)
    ll = rng.integers(1, S + 1, size=(B,)).astype(np.int32)
    tl = rng.integers(2 * S + 1, T + 1, size=(B,)).astype(np.int32)
    return jnp.asarray(logits), jnp.asarray(tl), jnp.asarray(labels), jnp.asarray(ll)


def test_seq_sharded_ctc_matches_single_device():
    logits, tl, labels, ll = _batch()
    mesh = make_mesh(data=2, model=1, seq=4)
    ref = ctc_loss_per_seq(logits, tl, labels, ll, impl="xla")
    got = ctc_loss_seq_sharded(mesh, logits, tl, labels, ll,
                               data_sharded=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_seq_sharded_ctc_gradient_matches():
    logits, tl, labels, ll = _batch(seed=3)
    mesh = make_mesh(data=1, model=1, seq=4)

    def loss_ref(lg):
        return jnp.sum(ctc_loss_per_seq(lg, tl, labels, ll, impl="xla"))

    def loss_sharded(lg):
        return jnp.sum(ctc_loss_seq_sharded(mesh, lg, tl, labels, ll))

    v0, g0 = jax.value_and_grad(loss_ref)(logits)
    v1, g1 = jax.value_and_grad(loss_sharded)(logits)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_seq_sharded_ctc_under_jit():
    logits, tl, labels, ll = _batch(seed=5, T=64)
    mesh = make_mesh(data=2, model=1, seq=2)
    f = jax.jit(lambda lg: ctc_loss_seq_sharded(mesh, lg, tl, labels, ll,
                                                data_sharded=True))
    ref = ctc_loss_per_seq(logits, tl, labels, ll, impl="xla")
    np.testing.assert_allclose(np.asarray(f(logits)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_seq_sharded_ctc_pallas_segments_match():
    """VERDICT r2 #6: the Pallas segment kernels (interpret-mode here on
    CPU; the real fused kernels on TPU) chained across time shards with
    ppermuted alpha/beta carries must reproduce the single-device loss AND
    gradient — including sequences that END inside an interior shard."""
    logits, tl, labels, ll = _batch(seed=7, T=48)
    mesh = make_mesh(data=1, model=1, seq=4)

    def loss_ref(lg):
        return jnp.sum(ctc_loss_per_seq(lg, tl, labels, ll, impl="xla"))

    def loss_pallas(lg):
        return jnp.sum(ctc_loss_seq_sharded(mesh, lg, tl, labels, ll,
                                            impl="pallas"))

    v0, g0 = jax.value_and_grad(loss_ref)(logits)
    v1, g1 = jax.value_and_grad(loss_pallas)(logits)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)


def test_seq_sharded_ctc_pallas_jit_data_sharded():
    logits, tl, labels, ll = _batch(seed=9, T=64, B=4)
    mesh = make_mesh(data=2, model=1, seq=2)
    f = jax.jit(jax.value_and_grad(
        lambda lg: jnp.sum(ctc_loss_seq_sharded(
            mesh, lg, tl, labels, ll, data_sharded=True, impl="pallas"))))
    v1, g1 = f(logits)
    v0, g0 = jax.value_and_grad(
        lambda lg: jnp.sum(ctc_loss_per_seq(lg, tl, labels, ll,
                                            impl="xla")))(logits)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)


def test_seq_sharded_ctc_pallas_full_length():
    """All sequences spanning every shard (the SP training regime)."""
    B, T, S, C = 4, 64, 8, 5
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, C, size=(B, S)), jnp.int32)
    ll = jnp.full((B,), S, jnp.int32)
    tl = jnp.full((B,), T, jnp.int32)
    mesh = make_mesh(data=1, model=1, seq=8)
    v0, g0 = jax.value_and_grad(lambda lg: jnp.sum(
        ctc_loss_per_seq(lg, tl, labels, ll, impl="xla")))(logits)
    v1, g1 = jax.value_and_grad(lambda lg: jnp.sum(
        ctc_loss_seq_sharded(mesh, lg, tl, labels, ll,
                             impl="pallas")))(logits)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
