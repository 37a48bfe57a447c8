"""Facade + CLI + checkpoint tests: the reference's intended top-level API
(Model/Dataset/Decoder) working end-to-end, the config schema round-trip,
and a full CLI train run with resume."""
import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_speech_tpu.facade import Dataset, Decoder, Model
from wavenet_speech_tpu.training import TrainState, build_optimizer
from wavenet_speech_tpu.training.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from wavenet_speech_tpu.utils.config import (
    base_model_cfg,
    classifier_cfg,
    json_to_config,
    layers_from_cfg,
)


def test_config_schema_both_styles():
    # ecoli_testrun style: kernel + dilations
    cfg = {"model": {"base": {"signal_dim": 16, "entry_kwidth": 2,
                              "kernel": 2, "dilations": [1, 2, 4]},
                     "classifier": {"num_labels": 5, "kernel": 2,
                                    "dilations": [1, 2], "downsample": 3,
                                    "out_dim": 16}}}
    b = base_model_cfg(cfg)
    assert b["layers"] == ((16, 16, 2, 1), (16, 16, 2, 2), (16, 16, 2, 4))
    c = classifier_cfg(cfg)
    assert c["downsample"] == 3 and c["num_labels"] == 5
    # example.json style: explicit layers
    cfg2 = {"model": {"base": {"signal_dim": 8,
                               "layers": [[8, 8, 2, 1], [8, 8, 2, 2]]}}}
    assert base_model_cfg(cfg2)["layers"] == ((8, 8, 2, 1), (8, 8, 2, 2))


def test_model_facade_wavenet_ctc():
    cfg = {"model": {"base": {"signal_dim": 16, "kernel": 2,
                              "dilations": [1, 2]},
                     "classifier": {"num_labels": 5, "kernel": 2,
                                    "dilations": [1, 2], "downsample": 2,
                                    "out_dim": 16}}}
    m = Model("wavenet-ctc", cfg)
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 32, 16))
    base_out, logits = m.predict(params, x)
    assert base_out.shape == (2, 32, 16)
    assert logits.shape == (2, 16, 5)


def test_model_facade_raw_ctcnet_small():
    cfg = {"model": {"raw": {"num_features": 8, "feature_kwidth": 3,
                             "num_dilation_blocks": 1,
                             "dilations": [1, 2], "out_dim": 8,
                             "remat": False}}}
    m = Model("raw-ctcnet", cfg)
    params = m.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 20, 1))
    base_out, logits = m.predict(params, x)
    assert logits.shape == (2, 22, 5)  # L + fk - 1


def test_dataset_facade_dispatch():
    for datatype, C in [("pore", 16), ("raw-pore", 1), ("gauss", 16),
                        ("raw-gauss", 1)]:
        ds = Dataset(datatype, max_iters=3, batch_size=2, num_levels=16,
                     min_length=12, max_length=15, seed=0)
        b = ds.fetch()
        assert b.signal.shape[0] == 2 and b.signal.shape[2] == C
        ds.close()
    with pytest.raises(NotImplementedError):
        Dataset("raw-hdf5")


def test_decoder_facade():
    logits = np.random.default_rng(0).standard_normal((2, 10, 5))
    probas, strs = Decoder("argmax").decode(logits)
    assert probas is None and len(strs) == 2
    scores, strs_b = Decoder("beam", beam_width=4).decode(logits)
    assert len(scores) == 2 and len(strs_b) == 2


def test_checkpoint_roundtrip(tmp_path):
    from wavenet_speech_tpu.models import WaveNet

    net = WaveNet(8, 2, ((8, 8, 2, 1), (8, 8, 2, 2)), 8, softmax=False)
    tx = build_optimizer("adam", 1e-3)
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, tx)
    state = TrainState(state.params, state.opt_state,
                       jnp.asarray(42, jnp.int32))
    ckpt_dir = str(tmp_path / "ckpts")
    saved = save_checkpoint(ckpt_dir, state)
    assert saved == 42
    assert latest_step(ckpt_dir) == 42

    fresh = TrainState.create(net.init(jax.random.PRNGKey(1)), tx)
    restored = restore_checkpoint(ckpt_dir, fresh)
    assert int(restored.step) == 42
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_train_and_resume(tmp_path):
    """Full CLI run on the overfit config (CPU), then resume from the saved
    checkpoint — the run dir must follow the reference layout
    (ckpts/ + logs/training.log, utils/logging.py:20-31)."""
    cfg = json_to_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "overfit_pore.json"))
    run_dir = str(tmp_path / "run")
    cfg["training"]["save_dir"] = run_dir
    cfg["training"]["max_iters"] = 60
    cfg["training"]["print_every"] = 10
    cfg["training"]["save_every"] = 50
    cfg["training"].pop("early_stop_vloss", None)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from wavenet_speech_tpu.cli import main

    assert main(["train", cfg_path]) == 0
    assert os.path.exists(os.path.join(run_dir, "logs", "training.log"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    step = latest_step(os.path.join(run_dir, "ckpts/"))
    assert step == 60

    # resume: another 60 iters continue from step 60
    assert main(["train", cfg_path]) == 0
    assert latest_step(os.path.join(run_dir, "ckpts/")) == 120

    # evaluate from the checkpoint
    cfg["training"]["print_samples"] = True
    cfg["training"]["eval_batches"] = 2
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert main(["evaluate", cfg_path]) == 0


def test_batchnorm_running_stats_match_torch():
    """Eval-mode parity vs torch.nn.BatchNorm1d(1).eval() after identical
    training batches (reference Model.py:51 raw-ctcnet base)."""
    import jax
    import jax.numpy as jnp
    import torch

    from wavenet_speech_tpu.facade import BatchNorm1d

    bn = BatchNorm1d(1)
    params = bn.init(jax.random.PRNGKey(0))
    tbn = torch.nn.BatchNorm1d(1)
    tbn.train()

    rng = np.random.default_rng(7)
    for _ in range(5):
        x = rng.standard_normal((4, 33, 1)).astype(np.float32) * 3.0 + 1.5
        y = bn.apply(params, jnp.asarray(x))                 # train forward
        ty = tbn(torch.from_numpy(x).permute(0, 2, 1))        # (B, C, L)
        np.testing.assert_allclose(np.asarray(y)[..., 0],
                                   ty.detach().numpy()[:, 0, :],
                                   rtol=1e-4, atol=1e-5)
        params = bn.update_state(params, params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(params["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["var"]),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # eval mode: small batch normalized with running stats, not its own
    tbn.eval()
    import dataclasses
    bn_eval = dataclasses.replace(bn, use_running=True)
    xe = rng.standard_normal((1, 9, 1)).astype(np.float32) * 3.0 + 1.5
    ye = bn_eval.apply(params, jnp.asarray(xe))
    tye = tbn(torch.from_numpy(xe).permute(0, 2, 1))
    np.testing.assert_allclose(np.asarray(ye)[..., 0],
                               tye.detach().numpy()[:, 0, :],
                               rtol=1e-4, atol=1e-5)


def test_decoder_times_output():
    """Facade Decoder exposes ctcdecode's per-label times via both beam
    engines and they agree."""
    from wavenet_speech_tpu.facade import Decoder

    rng = np.random.default_rng(13)
    logits = rng.standard_normal((2, 12, 5)).astype(np.float32)
    sc_d, str_d, t_d = Decoder("beam", engine="device").decode(
        logits, return_times=True)
    sc_n, str_n, t_n = Decoder("beam", engine="native").decode(
        logits, return_times=True)
    assert str_d == str_n
    assert t_d == t_n
    for s, t in zip(str_d, t_d):
        assert len(s) == len(t)


def test_cli_train_multi_step_schedule_asyncckpt(tmp_path):
    """Round-5 trainer knobs end-to-end through the CLI: steps_per_call
    (device-side K-step loop over K stacked batches), optim.schedule
    (warmup_cosine via make_lr_schedule), fixed_valid_batches (held-out
    batches sampled once), async_checkpoint (background Orbax writes).
    The run-dir contract and checkpoint/resume must hold unchanged."""
    cfg = json_to_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "overfit_pore.json"))
    run_dir = str(tmp_path / "run")
    cfg["training"].update({
        "save_dir": run_dir, "max_iters": 40, "print_every": 10,
        "save_every": 20, "steps_per_call": 5, "fixed_valid_batches": 2,
        "async_checkpoint": True,
    })
    cfg["training"].pop("early_stop_vloss", None)
    cfg["training"]["optim"].update({"schedule": "warmup_cosine",
                                     "warmup_steps": 5, "decay_steps": 40})
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from wavenet_speech_tpu.cli import main

    assert main(["train", cfg_path]) == 0
    assert os.path.exists(os.path.join(run_dir, "logs", "training.log"))
    assert latest_step(os.path.join(run_dir, "ckpts/")) == 40
    # the metrics stream logged at the K-block print boundaries
    mpath = os.path.join(run_dir, "logs", "metrics.jsonl")
    with open(mpath) as f:
        steps = [json.loads(line)["step"] for line in f]
    assert steps == [10, 20, 30, 40]
    # valid_loss present (fixed batches) and finite at every print
    with open(mpath) as f:
        vl = [json.loads(line)["valid_loss"] for line in f]
    assert all(v == v for v in vl)  # no NaNs

    # resume continues the schedule from the async-saved checkpoint
    assert main(["train", cfg_path]) == 0
    assert latest_step(os.path.join(run_dir, "ckpts/")) == 80
