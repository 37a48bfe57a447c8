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
