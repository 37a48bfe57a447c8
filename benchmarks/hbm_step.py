"""Whole-step achieved HBM bandwidth of the bench training step
(VERDICT r2 #1b: the step is memory-bound — block matmuls measure 98% of
memory roofline in benchmarks/roofline.py — so the honest way to close the
strict-MFU gap is to show the STEP is already near the memory roofline,
or to beat it with the fused backward kernel).

Method: compile the exact bench.py train step, take XLA's own post-fusion
`cost_analysis()["bytes accessed"]` (operand+output bytes of each fused
HLO — the compiler's accounting of HBM traffic), divide by the measured
step time, and compare against the chip's 819 GB/s HBM peak.

Prints one JSON line per configuration.

Usage:
  python benchmarks/hbm_step.py                  # TPU
  python benchmarks/hbm_step.py --platform cpu --smoke
"""
from __future__ import annotations

import argparse
import json
import time

HBM_PEAK_GBPS = 819.0  # v5e


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model (CPU CI)")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--fused-bwd", action="store_true")
    args = ap.parse_args(argv)

    if args.fused_bwd:
        import os

        os.environ["WAVENET_FUSED_BWD"] = "1"
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.models import WaveNet, WaveNetClassifier
    from wavenet_speech_tpu.training import (JointLoss, TrainState,
                                             build_optimizer,
                                             make_joint_train_step)

    if args.smoke:
        B, L, C = 2, 512, 16
        wavenet_dils = [1, 2, 4, 8]
        classifier_dils = [1, 2]
    else:  # the bench.py workload
        B, L, C = 8, 4505, 256
        wavenet_dils = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512] * 3
        classifier_dils = [1, 2, 4, 8, 16, 32] * 3
    remat = not args.no_remat
    base = WaveNet(C, 2, tuple((C, C, 2, d) for d in wavenet_dils), C,
                   softmax=False, remat=remat, use_pallas=args.fused_bwd)
    clf = WaveNetClassifier(C, 5,
                            tuple((C, C, 2, d) for d in classifier_dils),
                            256 if not args.smoke else C,
                            pool_kernel_size=4, softmax=False, remat=remat)
    params = {"base": base.init(jax.random.PRNGKey(0)),
              "ctc": clf.init(jax.random.PRNGKey(1))}
    tx = build_optimizer("adagrad", 3e-5)
    state = TrainState.create(params, tx)
    step = make_joint_train_step(base, clf, tx, JointLoss("joint"),
                                 compute_dtype=jnp.bfloat16, donate=False)

    rng = np.random.default_rng(0)
    levels = rng.integers(0, C, size=(B, L))
    signal = np.zeros((B, L, C), np.float32)
    signal[np.arange(B)[:, None], np.arange(L)[None, :], levels] = 1.0
    S = 429 if not args.smoke else 32
    batch = {
        "signal": jnp.asarray(signal),
        "labels": jnp.asarray(rng.integers(1, 5, size=(B, S)), jnp.int32),
        "label_lengths": jnp.full((B,), S, jnp.int32),
        "signal_lengths": jnp.full((B,), L, jnp.int32),
    }

    compiled = step.lower(state, batch).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))

    state2, metrics = step(state, batch)
    float(metrics["total_loss"])  # sync
    t0 = time.perf_counter()
    s = state
    for _ in range(args.steps):
        s, metrics = step(s, batch)
    final = float(metrics["total_loss"])  # full-chain readback sync
    dt = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(final)

    achieved_gbps = bytes_accessed / dt / 1e9
    print(json.dumps({
        "metric": "whole-step achieved HBM bandwidth (XLA bytes-accessed "
                  "/ measured step time)",
        "bytes_accessed_gb": round(bytes_accessed / 1e9, 3),
        "step_ms": round(dt * 1e3, 2),
        "achieved_gbps": round(achieved_gbps, 1),
        "pct_hbm_roofline": round(100 * achieved_gbps / HBM_PEAK_GBPS, 1),
        "xla_flops_per_step_t": round(flops / 1e12, 3),
        "remat": remat, "fused_bwd": args.fused_bwd,
        "config": f"B={B} L={L} C={C} blocks={len(wavenet_dils)}+"
                  f"{len(classifier_dils)}",
    }))


if __name__ == "__main__":
    main()
