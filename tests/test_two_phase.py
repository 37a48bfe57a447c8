"""Two-phase (XE-pretrain then joint) training via the CLI config knob
(reference legacy_code/wavenet_ctc_artificial.py:146-164)."""
import json
import os

import numpy as np

from wavenet_speech_tpu.training import JointLoss
from wavenet_speech_tpu.utils.config import json_to_config
from wavenet_speech_tpu.training.checkpoint import latest_step


def test_ctc_weight_zero_gives_xe_only():
    import jax.numpy as jnp

    loss = JointLoss("joint", ctc_weight=0.0)
    signal = jnp.zeros((1, 8, 4)).at[0, :, 1].set(1.0)
    pred = jnp.ones((1, 8, 4))
    logits = jnp.ones((1, 8, 5))
    labels = jnp.ones((1, 3), jnp.int32)
    lens = jnp.full((1,), 3, jnp.int32)
    total = loss.total(signal, pred, logits, labels, lens)
    xe, ctc = loss.calculate(signal, pred, logits, labels, lens)
    np.testing.assert_allclose(float(total), float(xe), rtol=1e-6)
    assert float(ctc) > 0  # still reported, just not optimized


def test_cli_two_phase(tmp_path):
    cfg = json_to_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "overfit_pore.json"))
    run_dir = str(tmp_path / "run")
    cfg["training"].update(save_dir=run_dir, max_iters=30, print_every=10,
                           save_every=30, xe_pretrain_iters=15)
    cfg["training"].pop("early_stop_vloss", None)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    from wavenet_speech_tpu.cli import main

    assert main(["train", cfg_path]) == 0
    assert latest_step(os.path.join(run_dir, "ckpts/")) == 30
    # metrics log shows both phases ran
    lines = [json.loads(l) for l in
             open(os.path.join(run_dir, "logs", "metrics.jsonl"))]
    assert lines, "no metrics logged"
