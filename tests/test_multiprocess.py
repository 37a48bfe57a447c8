"""First REAL multi-process execution of the distributed layer (VERDICT r2
item #4): a subprocess-launched 2-process `jax.distributed` CPU run —
coordinator handshake, global mesh spanning both processes, one DP train
step from per-process batch shards, post-step param equality vs the
single-process step, and a coordinated Orbax save/restore.

The reference has no distributed layer at all (SURVEY.md §2.7); this tests
the new design's multi-process branch, which all prior single-process
virtual-device artifacts never executed.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step_and_checkpoint(tmp_path):
    port = _free_port()
    nproc = 2
    procs = []
    for pid in range(nproc):
        cfg = {"coord": f"127.0.0.1:{port}", "nproc": nproc, "pid": pid,
               "outdir": str(tmp_path)}
        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=2",
                   PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
        # the conftest's platform forcing is process-local; workers force
        # cpu themselves before first backend touch
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             json.dumps(cfg)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    oks = [json.load(open(tmp_path / f"ok_{pid}.json")) for pid in range(nproc)]
    assert all(o["process_count"] == nproc for o in oks)
    # both ranks computed the same (psum-reduced, replicated) loss
    assert abs(oks[0]["loss"] - oks[1]["loss"]) < 1e-6

    # every rank's post-step params agree with each other AND with the
    # single-process reference step on the identical batch
    ranks = [dict(np.load(tmp_path / f"params_{pid}.npz")) for pid in range(nproc)]
    for k in ranks[0]:
        np.testing.assert_array_equal(ranks[0][k], ranks[1][k])

    ref = _single_process_reference()
    assert set(ref) == set(ranks[0])
    for k in ref:
        np.testing.assert_allclose(ranks[0][k], ref[k], rtol=1e-5, atol=1e-7,
                                   err_msg=f"param mismatch at {k}")


def _single_process_reference():
    """The identical train step, single process (the conftest's local CPU
    devices), no distributed init."""
    import jax

    from wavenet_speech_tpu.models import RawCTCNet
    from wavenet_speech_tpu.training import (TrainState, build_optimizer,
                                             make_ctc_train_step)

    F, B, L = 16, 8, 64
    net = RawCTCNet(num_features=F, feature_kwidth=3, num_labels=5,
                    layers=tuple((F, F, 2, d) for d in (1, 2, 4)),
                    out_dim=F, positions=False, softmax=False)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "signal": rng.standard_normal((B, L, 1)).astype(np.float32),
        "labels": rng.integers(1, 5, size=(B, 6)).astype(np.int32),
        "label_lengths": np.full((B,), 6, np.int32),
    }
    tx = build_optimizer("adam", 1e-3)
    state = TrainState.create(params, tx)
    step = make_ctc_train_step(net, tx, donate=False)
    state, _ = step(state, batch)
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in
            jax.tree_util.tree_leaves_with_path(state.params)}
