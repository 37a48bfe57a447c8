"""Basecaller inference API + CLI basecall subcommand."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_speech_tpu.inference import Basecaller
from wavenet_speech_tpu.models import RawCTCNet


def _net():
    F = 8
    return RawCTCNet(F, 3, 5, tuple((F, F, 3, d) for d in (1, 2)), F,
                     softmax=False)


def test_basecaller_beam_and_greedy(rng):
    net = _net()
    params = net.init(jax.random.PRNGKey(0))
    sig = rng.standard_normal((3, 50, 1)).astype(np.float32)
    beam = Basecaller(model=net, params=params, beam_width=4,
                      pad_to_multiple=32)
    seqs, scores = beam(sig)
    assert len(seqs) == 3 and len(scores) == 3
    assert all(set(s) <= set("AGCT") for s in seqs)

    greedy = Basecaller(model=net, params=params, beam_width=0,
                        pad_to_multiple=32)
    gseqs, gscores = greedy(sig)
    assert len(gseqs) == 3 and gscores == [0.0] * 3


def test_basecaller_bucketing_compiles_once(rng):
    net = _net()
    params = net.init(jax.random.PRNGKey(1))
    caller = Basecaller(model=net, params=params, beam_width=2,
                        pad_to_multiple=64, max_label_len=32)
    for L in [40, 50, 63]:  # all bucket to 64 -> one compilation signature
        seqs, _ = caller(rng.standard_normal((2, L, 1)).astype(np.float32))
        assert len(seqs) == 2


def test_basecaller_padding_excluded_from_decode(rng):
    """The bucket padding the caller adds must be excluded from decoding:
    L=50 input (zero-padded to 64 internally) decodes identically to the
    same pre-padded tensor with explicit lengths=50 — and differently from
    treating all 64 frames as real signal (the pre-fix behavior)."""
    net = _net()
    params = net.init(jax.random.PRNGKey(2))
    fk = 3  # feature_kwidth -> logit length L + fk - 1
    caller = Basecaller(model=net, params=params, beam_width=4,
                        pad_to_multiple=64,
                        logit_length_fn=lambda sl: sl + fk - 1)
    sig = rng.standard_normal((2, 50, 1)).astype(np.float32)
    seqs_a, _ = caller(sig)                        # default lengths = 50
    padded = np.pad(sig, ((0, 0), (0, 14), (0, 0)))
    seqs_b, _ = caller(padded, lengths=np.full((2,), 50))
    assert seqs_a == seqs_b
    # decoding the pad frames as real signal changes the output
    seqs_full, _ = caller(padded)                  # default lengths = 64
    assert seqs_full != seqs_a
    # greedy path honors lengths the same way
    g = Basecaller(model=net, params=params, beam_width=0,
                   pad_to_multiple=64, logit_length_fn=lambda sl: sl + fk - 1)
    ga, _ = g(sig)
    gb, _ = g(padded, lengths=np.full((2,), 50))
    assert ga == gb


def test_cli_basecall_roundtrip(tmp_path, rng):
    from wavenet_speech_tpu.cli import main
    from wavenet_speech_tpu.utils.config import json_to_config

    cfg = json_to_config(os.path.join(os.path.dirname(__file__), "..",
                                      "configs", "overfit_pore.json"))
    run_dir = str(tmp_path / "run")
    cfg["training"].update(save_dir=run_dir, max_iters=10, print_every=5,
                           save_every=10)
    cfg["training"].pop("early_stop_vloss", None)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert main(["train", cfg_path]) == 0

    # quantized int signals -> one-hot to signal_dim (32)
    sig = rng.integers(0, 32, size=(2, 40)).astype(np.int64)
    np.savez(tmp_path / "sigs.npz", signal=sig)
    out = tmp_path / "calls.fasta"
    assert main(["basecall", cfg_path, "--signals", str(tmp_path / "sigs.npz"),
                 "--out", str(out)]) == 0
    text = out.read_text().splitlines()
    assert text[0].startswith(">read_0 score=")
    assert len(text) == 4
    assert set(text[1]) <= set("AGCT")
