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


def test_async_save_restores_identically(tmp_path):
    """async_save=True (background write, manager kept open) must produce
    checkpoints byte-equivalent to the sync path: save two steps async,
    wait, restore the latest, and get the exact state back."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from wavenet_speech_tpu.training import TrainState, build_optimizer
    from wavenet_speech_tpu.training.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint,
        wait_for_async_saves)

    params = {"w": jnp.arange(12.0).reshape(3, 4),
              "b": jnp.ones((4,), jnp.float32)}
    tx = build_optimizer("adam", 1e-3)
    state = TrainState.create(params, tx)
    d = str(tmp_path / "ck")

    save_checkpoint(d, state, step=1, max_to_keep=4, async_save=True)
    state2 = TrainState(
        jax.tree_util.tree_map(lambda a: a + 1.0, state.params),
        state.opt_state, state.step + 2)
    save_checkpoint(d, state2, step=2, max_to_keep=4, async_save=True)
    # re-saving an existing step is a no-op, as in the sync path
    save_checkpoint(d, state2, step=2, max_to_keep=4, async_save=True)
    wait_for_async_saves(d)
    wait_for_async_saves(d)  # idempotent

    assert latest_step(d) == 2
    restored = restore_checkpoint(d, TrainState.create(params, tx))
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state2.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
