"""Scaling-efficiency benchmark harness (BASELINE north star: >=85%
efficiency from 1 host to 2 hosts; measured at 1 chip / 1 host / N hosts).

Measures audio-samples/sec of the DP train step at increasing data-axis
sizes on whatever devices are available (real chips on hardware; virtual
CPU devices for plumbing validation via --force-cpu-devices N).

Per-device batch is held constant (weak scaling), so perfect scaling is
linear samples/sec; efficiency = (rate_N / rate_1) / N.

Multi-host usage: launch one process per host with JAX_COORDINATOR_ADDRESS
etc. set (parallel/distributed.initialize_multihost runs first), and the
mesh spans all hosts' chips automatically.
"""
from __future__ import annotations

import argparse
import json
import time


def run(data_sizes, batch_per_device: int, seq_len: int, channels: int,
        blocks: int, steps: int, bf16: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.models import RawCTCNet
    from wavenet_speech_tpu.parallel import make_mesh, shard_batch, shard_params
    from wavenet_speech_tpu.training import (TrainState, build_optimizer,
                                             make_ctc_train_step)

    F = channels
    dils = tuple(2 ** i for i in range(5))
    layers = tuple((F, F, 3, d) for d in dils) * max(blocks // 5, 1)
    net = RawCTCNet(F, 9, 5, layers, F, softmax=False, remat=True)
    params = net.init(jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-4)
    step = make_ctc_train_step(net, tx, donate=False,
                               compute_dtype=jnp.bfloat16 if bf16 else None)

    results = {}
    for n in data_sizes:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(data=n)
        B = batch_per_device * n
        rng = np.random.default_rng(0)
        batch = {
            "signal": rng.standard_normal((B, seq_len, 1)).astype(np.float32),
            "labels": rng.integers(1, 5, size=(B, 64)).astype(np.int32),
            "label_lengths": np.full((B,), 64, np.int32),
            "signal_lengths": np.full((B,), seq_len, np.int32),
        }
        sp = shard_params(mesh, params)
        state = TrainState.create(sp, tx)
        dev_batch = shard_batch(mesh, batch)
        state, m = step(state, dev_batch)          # compile + warmup
        float(m["ctc_loss"])
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, dev_batch)
        float(m["ctc_loss"])                        # sync
        dt = (time.perf_counter() - t0) / steps
        rate = B * seq_len / dt
        results[n] = rate
        base = results[min(results)]
        n0 = min(results)
        eff = (rate / base) / (n / n0)
        print(json.dumps({"data_axis": n, "samples_per_sec": round(rate, 1),
                          "step_ms": round(dt * 1e3, 2),
                          "efficiency_vs_smallest": round(eff, 3)}))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=10)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--force-cpu-devices", type=int, default=0,
                    help="validate plumbing on N virtual CPU devices")
    args = ap.parse_args(argv)

    if args.force_cpu_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    from wavenet_speech_tpu.parallel.distributed import initialize_multihost

    initialize_multihost()
    return run(args.data_sizes, args.batch_per_device, args.seq_len,
               args.channels, args.blocks, args.steps, args.bf16)


if __name__ == "__main__":
    main()
