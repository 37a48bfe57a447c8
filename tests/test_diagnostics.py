"""Anomaly forensics (training/diagnostics.py): dump/load round-trip,
section_report correctness, and non-finite localization."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_speech_tpu.data import RawGaussianModelLoader
from wavenet_speech_tpu.ops.norm import batch_standardize
from wavenet_speech_tpu.training.diagnostics import (
    dump_anomaly, first_nonfinite, load_anomaly, section_report)

from examples.gaussian_eval import build_model


@pytest.fixture(scope="module")
def setup():
    model = build_model(1 / 64, remat=False)  # tiny CPU-sized RawCTCNet
    params = model.init(jax.random.PRNGKey(0))
    loader = RawGaussianModelLoader(
        max_iters=10, num_epochs=10, epoch_size=10, batch_size=3,
        upsampling=6, random_upsample=False, lengths=(15, 18), seed=0,
        pad_to=(18 - 1 - 8) * 6, labels_pad_to=17)
    b = loader.fetch()
    batch = {"signal": b.signal, "labels": b.labels,
             "label_lengths": b.label_lengths,
             "signal_lengths": b.signal_lengths}
    return model, params, batch


def test_section_report_healthy(setup):
    model, params, batch = setup
    rep = section_report(model, params, batch,
                         preprocess=batch_standardize)
    assert rep["probe_matches_model_apply"]
    assert first_nonfinite(rep) is None
    assert np.isfinite(rep["loss"])
    names = [s[0] for s in rep["stages"]]
    assert names[0] == "feat_conv" and "logits" in names
    assert all(f for _, f, _ in rep["stages"])
    assert len(rep["per_cycle_max_out"]) == len(model.layers)  # unrolled


def test_section_report_scan_path(setup):
    # a uniformly-cyclic stack hits the lax.scan path: per-CYCLE maxima
    from wavenet_speech_tpu.models import RawCTCNet

    layers = tuple((24, 24, 2, d) for d in (1, 2, 4)) * 3
    model = RawCTCNet(32, 3, 5, layers, 24, positions=False,
                      softmax=False, causal=False)
    params = model.init(jax.random.PRNGKey(1))
    _, _, batch = setup
    rep = section_report(model, params, batch,
                         preprocess=batch_standardize)
    assert rep["probe_matches_model_apply"]
    assert first_nonfinite(rep) is None
    assert "cycles_out" in [s[0] for s in rep["stages"]]
    assert len(rep["per_cycle_max_out"]) == 3  # 3 cycle repeats
    assert len(rep["per_cycle_max_skips"]) == len(rep["per_cycle_max_out"])


def test_section_report_bf16_runs(setup):
    model, params, batch = setup
    rep = section_report(model, params, batch, compute_dtype=jnp.bfloat16,
                         preprocess=batch_standardize)
    assert rep["probe_matches_model_apply"]
    assert first_nonfinite(rep) is None


def test_localizes_poisoned_stage(setup):
    model, params, batch = setup
    bad = jax.tree_util.tree_map(lambda x: x, params)
    bad = dict(bad, out1={"w": params["out1"]["w"] * 1e30,
                          "b": params["out1"]["b"]})
    rep = section_report(model, bad, batch, compute_dtype=jnp.bfloat16,
                        preprocess=batch_standardize)
    site = first_nonfinite(rep)
    # 1e30-scaled out1 weights overflow at/after out1, never before
    stages = [s[0] for s in rep["stages"]]
    # with 1e30 weights the activations (~1e31) still FIT in bf16/f32;
    # what overflows first is the f32 sum-of-squares inside global_norm
    # ((1e31)^2 = inf) — the exact guard-trip mechanism the tool exists
    # to name. Any at/after-out1 site is a correct localization.
    assert site in ("out1", "logits", "ctc_per_seq", "loss",
                    "global_norm_sumsq") or site.startswith("grad:"), site
    for name, finite, _ in rep["stages"]:
        if stages.index(name) < stages.index("out1"):
            assert finite, f"{name} should be finite"


def test_dump_load_roundtrip(setup, tmp_path):
    model, params, batch = setup

    class B:  # the host Batch shape gaussian_eval passes
        signal = batch["signal"]
        labels = batch["labels"]
        label_lengths = batch["label_lengths"]
        signal_lengths = batch["signal_lengths"]

    p = dump_anomaly(str(tmp_path), B, params, 123, "nonfinite",
                     {"ctc_loss": float("inf"), "grad_norm": 1e9})
    assert p and p.endswith("step_123_nonfinite")
    # second dump of the same step: refused (re-exec dedupe)
    assert dump_anomaly(str(tmp_path), B, params, 123, "nonfinite") is None
    b2, p2 = load_anomaly(p, params)
    np.testing.assert_array_equal(b2["signal"], batch["signal"])
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        params, p2))
    assert chex_equal
    # max_dumps cap
    for s in (124, 125, 126):
        dump_anomaly(str(tmp_path), B, params, s, "spike", max_dumps=3)
    import os
    assert len([d for d in os.listdir(tmp_path)
                if d.startswith("step_")]) == 3
