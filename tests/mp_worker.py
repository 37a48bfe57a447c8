"""Worker process for tests/test_multiprocess.py — one rank of a REAL
2-process `jax.distributed` run on CPU (the first time
parallel/distributed.py's multi-process branch executes at all; every
prior multi-chip artifact was single-process virtual devices).

Each rank: initialize_multihost -> global ("data",) mesh over all
processes' devices -> one DP CTC train step fed per-process batch shards
-> dump the (replicated) post-step params -> Orbax save across processes
-> restore and check round-trip equality.

Launched by the test via subprocess; not a pytest module.
"""
from __future__ import annotations

import json
import os
import sys


def main() -> None:
    cfg = json.loads(sys.argv[1])
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from wavenet_speech_tpu.parallel.distributed import (
        initialize_multihost, is_primary, local_batch_slice)

    initialize_multihost(cfg["coord"], num_processes=cfg["nproc"],
                         process_id=cfg["pid"])
    assert jax.process_count() == cfg["nproc"], jax.process_count()
    assert jax.process_index() == cfg["pid"]
    assert is_primary() == (cfg["pid"] == 0)
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == cfg["nproc"] * n_local, (n_global, n_local)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from wavenet_speech_tpu.models import RawCTCNet
    from wavenet_speech_tpu.training import (TrainState, build_optimizer,
                                             make_ctc_train_step)

    mesh = Mesh(np.array(jax.devices()), ("data",))

    def to_global(tree, spec):
        def put(x):
            x = np.asarray(x)
            sh = NamedSharding(mesh, spec if x.ndim else P())
            return jax.make_array_from_callback(x.shape, sh,
                                                lambda idx: x[idx])
        return jax.tree_util.tree_map(put, tree)

    F, B, L = 16, 8, 64
    net = RawCTCNet(num_features=F, feature_kwidth=3, num_labels=5,
                    layers=tuple((F, F, 2, d) for d in (1, 2, 4)),
                    out_dim=F, positions=False, softmax=False)
    params = net.init(jax.random.PRNGKey(0))

    # identical global batch on every process; jit consumes per-process
    # shards of it (the per-host feed path, SURVEY.md §2.7 design)
    rng = np.random.default_rng(0)
    batch_np = {
        "signal": rng.standard_normal((B, L, 1)).astype(np.float32),
        "labels": rng.integers(1, 5, size=(B, 6)).astype(np.int32),
        "label_lengths": np.full((B,), 6, np.int32),
    }
    # the rows this process actually feeds: local_batch_slice must agree
    # with the mesh's addressable shards (process-major device order)
    sl = local_batch_slice(B)
    data_sh = NamedSharding(mesh, P("data"))
    lo = min(idx[0].start for d, idx in
             data_sh.addressable_devices_indices_map((B,)).items())
    hi = max(idx[0].stop for d, idx in
             data_sh.addressable_devices_indices_map((B,)).items())
    assert (sl.start, sl.stop) == (lo, hi), (sl, lo, hi)

    gbatch = to_global(batch_np, P("data"))
    gparams = to_global(params, P())
    tx = build_optimizer("adam", 1e-3)
    state = TrainState.create(gparams, tx)
    step = make_ctc_train_step(net, tx, donate=False)
    state, metrics = step(state, gbatch)
    loss = float(metrics["ctc_loss"])  # replicated scalar: readable anywhere
    assert np.isfinite(loss)

    # post-step params are replicated -> every rank can materialize them
    flat = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
            jax.tree_util.tree_leaves_with_path(state.params)}
    np.savez(os.path.join(cfg["outdir"], f"params_{cfg['pid']}.npz"), **flat)

    # Orbax save/restore across processes (coordinated multi-process write)
    ckpt_dir = os.path.join(cfg["outdir"], "ckpts")
    from wavenet_speech_tpu.training.checkpoint import (restore_checkpoint,
                                                        save_checkpoint)

    save_checkpoint(ckpt_dir, state, step=1)
    template = TrainState.create(to_global(params, P()), tx)
    restored = restore_checkpoint(ckpt_dir, template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with open(os.path.join(cfg["outdir"], f"ok_{cfg['pid']}.json"), "w") as f:
        json.dump({"loss": loss, "process_count": jax.process_count()}, f)


if __name__ == "__main__":
    main()
