"""Parallelism tests on the 8-device virtual CPU mesh: DP step equivalence,
TP sharding placement, and sequence-parallel halo exchange equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from wavenet_speech_tpu.models import RawCTCNet, WaveNet
from wavenet_speech_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_params,
    param_shardings,
    seq_sharded_apply,
)
from wavenet_speech_tpu.training import TrainState, build_optimizer, make_ctc_train_step


def _tiny_rawctcnet(F=16, blocks=(1, 2, 4)):
    layers = tuple((F, F, 3, d) for d in blocks)
    return RawCTCNet(F, 3, 5, layers, F, softmax=False)


def _batch(B=8, L=32, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return {
        "signal": rng.standard_normal((B, L, 1)).astype(np.float32),
        "labels": rng.integers(1, 5, size=(B, 6)).astype(np.int32),
        "label_lengths": np.full((B,), 6, np.int32),
        "signal_lengths": np.full((B,), L, np.int32),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device():
    """A DP-sharded train step must produce the same loss and params as the
    unsharded one (same global batch)."""
    net = _tiny_rawctcnet()
    params = net.init(jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    step = make_ctc_train_step(net, tx, donate=False)
    batch = _batch()

    # single-device
    s0 = TrainState.create(params, tx)
    s0, m0 = step(s0, jax.device_put(batch))

    # DP over 8 devices
    mesh = make_mesh(data=8)
    sp = shard_params(mesh, params)
    s1 = TrainState.create(sp, tx)
    s1, m1 = step(s1, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m0["ctc_loss"]), float(m1["ctc_loss"]),
                               rtol=1e-5)
    l0 = jax.tree_util.tree_leaves(s0.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l0, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_tp_sharding_placement_and_equivalence():
    """Model-parallel param sharding: outputs equal the replicated run."""
    mesh = make_mesh(data=2, model=4)
    net = _tiny_rawctcnet(F=32)
    params = net.init(jax.random.PRNGKey(1))
    shardings = param_shardings(mesh, params, model_parallel=True)
    # at least the big conv kernels must actually be sharded over "model"
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, shardings,
                               is_leaf=lambda x: hasattr(x, "spec")))
    assert any("model" in str(s) for s in specs)

    sp = shard_params(mesh, params, model_parallel=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 24, 1)),
                    dtype=jnp.float32)
    y_ref = net.apply(params, x)
    y_tp = net.apply(sp, x)
    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_seq", [2, 4])
def test_seq_sharded_wavenet_matches_single(n_seq):
    """Halo-exchange sequence parallelism must reproduce the single-device
    forward exactly (causal convs, dilations spanning shard boundaries)."""
    mesh = make_mesh(data=1, model=1, seq=n_seq)
    in_dim = 8
    layers = tuple((in_dim, in_dim, 2, d) for d in (1, 2, 4, 8))
    net = WaveNet(in_dim, 2, layers, in_dim, softmax=False)
    params = net.init(jax.random.PRNGKey(3))
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 64, in_dim)),
        dtype=jnp.float32)
    y_ref = net.apply(params, x)
    y_seq = seq_sharded_apply(net.apply, mesh, params, x, data_sharded=False)
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_seq_sharded_noncausal_matches_single():
    mesh = make_mesh(data=1, model=1, seq=4)
    net = _tiny_rawctcnet(F=8, blocks=(1, 2, 4))
    params = net.init(jax.random.PRNGKey(5))
    x = jnp.asarray(np.random.default_rng(6).standard_normal((1, 64, 1)),
                    dtype=jnp.float32)
    y_ref = net.apply(params, x)

    # RawCTCNet's featurizer changes sequence length (L + fk - 1), which is
    # not shape-preserving per shard -> wrap only the length-preserving part.
    # Here we instead check a noncausal conv stack directly:
    from wavenet_speech_tpu.models.stack import SkipSumStack

    stack = SkipSumStack(tuple((4, 4, 3, d) for d in (1, 2, 4)), 4,
                         causal=False)
    sp = stack.init(jax.random.PRNGKey(7))
    xs = jnp.asarray(np.random.default_rng(8).standard_normal((2, 64, 4)),
                     dtype=jnp.float32)
    ref_out, ref_skip = stack.apply(sp, xs)

    def apply_fn(p, z):
        o, s = stack.apply(p, z)
        return jnp.concatenate([o, s], axis=-1)

    both = seq_sharded_apply(apply_fn, mesh, sp, xs, data_sharded=False)
    np.testing.assert_allclose(np.asarray(both[..., :4]), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(both[..., 4:]), np.asarray(ref_skip),
                               rtol=1e-4, atol=1e-5)


def test_halo_too_large_raises():
    mesh = make_mesh(data=1, model=1, seq=8)
    in_dim = 4
    layers = ((in_dim, in_dim, 2, 64),)  # halo 64 > shard 8
    net = WaveNet(in_dim, 2, layers, in_dim, softmax=False)
    params = net.init(jax.random.PRNGKey(9))
    x = jnp.zeros((1, 64, in_dim))
    with pytest.raises(ValueError, match="halo"):
        seq_sharded_apply(net.apply, mesh, params, x, data_sharded=False)
