"""Checkpoint restore into a SHARDED template: params saved from a
single-device state must restore onto a mesh with the template's shardings
(the multi-chip resume path)."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.models import RawCTCNet
from wavenet_speech_tpu.parallel import make_mesh, param_shardings, shard_params
from wavenet_speech_tpu.training import TrainState, build_optimizer
from wavenet_speech_tpu.training.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


def test_restore_into_sharded_template(tmp_path):
    F = 32
    net = RawCTCNet(F, 3, 5, tuple((F, F, 3, d) for d in (1, 2)), F,
                    softmax=False)
    tx = build_optimizer("adam", 1e-3)
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, tx)
    ckpt = str(tmp_path / "ckpts")
    save_checkpoint(ckpt, state)

    mesh = make_mesh(data=2, model=4)
    sharded_params = shard_params(mesh, net.init(jax.random.PRNGKey(9)),
                                  model_parallel=True)
    template = TrainState.create(sharded_params, tx)
    restored = restore_checkpoint(ckpt, template)

    # values equal the saved single-device params...
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...and carry the template's shardings
    shardings = param_shardings(mesh, params, model_parallel=True)
    for leaf, want in zip(jax.tree_util.tree_leaves(restored.params),
                          jax.tree_util.tree_leaves(
                              shardings,
                              is_leaf=lambda x: hasattr(x, "spec"))):
        assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
            leaf.sharding, want)
