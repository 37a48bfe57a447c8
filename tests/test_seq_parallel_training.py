"""Sequence-parallel TRAINING: gradients must flow correctly through the
halo exchange (ppermute is linear, so shard_map AD transposes it exactly);
the seq-sharded loss gradient must equal the single-device gradient."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from wavenet_speech_tpu.models import WaveNet
from wavenet_speech_tpu.parallel import make_mesh, seq_sharded_apply


def test_grad_through_halo_exchange_matches_single_device():
    in_dim = 8
    layers = tuple((in_dim, in_dim, 2, d) for d in (1, 2, 4))
    net = WaveNet(in_dim, 2, layers, in_dim, softmax=False)
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, in_dim)),
                    dtype=jnp.float32)
    mesh = make_mesh(data=1, model=1, seq=4)

    def loss_single(p):
        return jnp.mean(net.apply(p, x) ** 2)

    def loss_sharded(p):
        y = seq_sharded_apply(net.apply, mesh, p, x, data_sharded=False)
        return jnp.mean(y ** 2)

    l0, g0 = jax.value_and_grad(loss_single)(params)
    l1, g1 = jax.value_and_grad(loss_sharded)(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_seq_plus_data_sharded_forward():
    """Combined (data x seq) sharding on the same mesh."""
    in_dim = 8
    layers = tuple((in_dim, in_dim, 2, d) for d in (1, 2))
    net = WaveNet(in_dim, 2, layers, in_dim, softmax=False)
    params = net.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 32, in_dim)),
                    dtype=jnp.float32)
    mesh = make_mesh(data=2, model=1, seq=2)
    y = seq_sharded_apply(net.apply, mesh, params, x, data_sharded=True)
    y_ref = net.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                               atol=1e-5)


def _raw_ctcnet(F=16, fk=3, dils=(1, 2, 4), positions=True):
    from wavenet_speech_tpu.models import RawCTCNet

    return RawCTCNet(num_features=F, feature_kwidth=fk, num_labels=5,
                     layers=tuple((F, F, 2, d) for d in dils),
                     out_dim=F, positions=positions, softmax=False)


def test_raw_ctcnet_sp_forward_matches_single_device():
    """The flagship's featurizer EXTENDS the time axis by fk-1 (reference
    raw_ctcnet.py:57-61 quirk); under SP it is computed shard-locally from
    a both-sides halo, each shard slicing its even share of the global
    L+fk-1 frames (models/raw_ctcnet.py). Output must match unsharded
    frame-for-frame, including both edge-pad regions."""
    for fk, seq in ((3, 2), (5, 4), (9, 4)):
        net = _raw_ctcnet(fk=fk)
        params = net.init(jax.random.PRNGKey(0))
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 64, 1)), jnp.float32)
        mesh = make_mesh(data=2, model=1, seq=seq)
        y = seq_sharded_apply(net.apply, mesh, params, x, data_sharded=True)
        y_ref = net.apply(params, x)
        assert y.shape == y_ref.shape == (2, 64 + fk - 1, 5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)


def test_raw_ctcnet_sp_rejects_indivisible_kwidth():
    import pytest

    net = _raw_ctcnet(fk=4)  # fk-1 = 3 not divisible by seq=2
    params = net.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 64, 1), jnp.float32)
    mesh = make_mesh(data=1, model=1, seq=2)
    with pytest.raises(ValueError, match="feature_kwidth"):
        seq_sharded_apply(net.apply, mesh, params, x, data_sharded=False)


def test_raw_ctcnet_sp_exact_f64():
    """Semantic-exactness proof for the SP RawCTCNet gradient: in float64
    the seq-sharded CTC training gradient matches single-device to ~1e-12,
    establishing that the looser f32 tolerance in __graft_entry__'s dryrun
    covers reduction-order noise only (the eye-init skip sums cancel
    heavily in f32), not a semantic gap."""
    import contextlib

    from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        net = _raw_ctcnet()
        params = net.init(jax.random.PRNGKey(0))
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), params)
        rng = np.random.default_rng(5)
        B, L = 4, 64
        x = jnp.asarray(rng.standard_normal((B, L, 1)))
        labels = jnp.asarray(rng.integers(1, 5, (B, 8)), jnp.int32)
        ll = jnp.full((B,), 8, jnp.int32)
        mesh = make_mesh(data=2, model=1, seq=2)

        def loss(p, sharded):
            logits = (seq_sharded_apply(net.apply, mesh, p, x,
                                        data_sharded=True)
                      if sharded else net.apply(p, x))
            T = logits.shape[1]
            lens = jnp.full((B,), T, jnp.int32)
            return jnp.sum(ctc_loss_per_seq(logits, lens, labels, ll)) / T

        _, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
        _, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-10, atol=1e-12)
