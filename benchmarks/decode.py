"""Beam-decode throughput benchmark (BASELINE north star: beam-decode
sequences/sec).

The reference delegates true CTC prefix beam search to the native
`ctcdecode.CTCBeamDecoder` C++ library on host (pretrain_rnn.py:23, eval
notebooks: beam_width 7, blank 0) and publishes no throughput number; this
harness measures our three engines on the same workload so decode
throughput is tracked alongside training throughput (bench.py):

  device : RawCTCNet forward + on-device prefix beam, one jitted program
  native : forward on device, C++ multithreaded prefix beam on host
  greedy : forward + argmax collapse (throughput ceiling)

Usage:
  python benchmarks/decode.py                 # TPU (or default backend)
  python benchmarks/decode.py --platform cpu --scale 0.0625 --steps 3
"""
from __future__ import annotations

import argparse
import json
import time
from functools import partial


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--signal-len", type=int, default=2048)
    ap.add_argument("--scale", type=float, default=0.25,
                    help="model scale vs the 2048-feat eval config")
    ap.add_argument("--beam-width", type=int, default=7)
    ap.add_argument("--max-label-len", type=int, default=256)
    ap.add_argument("--labels", type=int, default=5,
                    help="alphabet size incl. blank (5 = DNA; ~30 = speech "
                         "characters — substantiates ctc_beam_device.py's "
                         "speech-alphabet claim, VERDICT r2 #7)")
    ap.add_argument("--prune-labels", type=int, default=None,
                    help="per-frame top-K label pre-prune (cutoff_top_n)")
    ap.add_argument("--beam-impl", default=None, choices=["xla", "pallas"],
                    help="beam engine for device/beam-only: xla scan or "
                         "the fused Pallas kernel (ops/pallas/attic/beam.py)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--engines", nargs="+",
                    default=["device", "native", "greedy"],
                    help="device | native | greedy | beam-only (beam scan "
                         "on precomputed log-probs, no model forward)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 forward (beam/argmax stay f32 on logits)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from wavenet_speech_tpu.decoding import ctc_beam_search_jax
    from wavenet_speech_tpu.decoding.greedy import argmax_decode, ctc_collapse
    from wavenet_speech_tpu.models import RawCTCNet

    nfeats = max(int(2048 * args.scale), 16)
    cycle = tuple((nfeats, nfeats, 2, d) for d in (1, 2, 4, 8, 16)) \
        + tuple((nfeats, nfeats, 3, d) for d in (1, 2, 4, 8, 16))
    net = RawCTCNet(nfeats, 3, args.labels, cycle,
                    max(int(512 * args.scale), 16),
                    positions=False, softmax=False, causal=False)
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    signal = rng.standard_normal(
        (args.batch_size, args.signal_len, 1)).astype(np.float32)
    if args.bf16:
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        signal = signal.astype(jnp.bfloat16)

    def fwd(p, x):
        return net.apply(p, x)

    def device_pipeline(p, x):
        logits = fwd(p, x)
        return ctc_beam_search_jax(logits, beam_width=args.beam_width,
                                   max_label_len=args.max_label_len,
                                   prune=args.prune_labels,
                                   impl=args.beam_impl)

    def greedy_pipeline(p, x):
        return argmax_decode(fwd(p, x))

    fwd_j = jax.jit(fwd)
    results = {}
    for engine in args.engines:
        if engine == "device":
            f = jax.jit(device_pipeline)

            def run():
                out = f(params, signal)
                return float(out[2][0, 0])  # value readback = full sync
        elif engine == "greedy":
            f = jax.jit(greedy_pipeline)

            def run():
                out = ctc_collapse(np.asarray(f(params, signal)))
                return len(out)
        elif engine == "beam-only":
            # isolate the beam from the model forward: precomputed
            # log-probs straight into the scan (where the O(W^2*S) merge
            # cost shows undiluted)
            import jax.numpy as jnp

            lp_only = jnp.asarray(jax.nn.log_softmax(jnp.asarray(
                rng.standard_normal(
                    (args.batch_size, args.signal_len + 2, args.labels)
                ).astype(np.float32) * 3.0), axis=-1))
            f = jax.jit(partial(
                ctc_beam_search_jax, beam_width=args.beam_width,
                max_label_len=args.max_label_len, log_input=True,
                prune=args.prune_labels, impl=args.beam_impl))

            def run():
                out = f(lp_only)
                return float(out[2][0, 0])
        elif engine == "native":
            from wavenet_speech_tpu.native.ctc_beam import (
                ctc_beam_search_native, native_available)

            if not native_available():
                print(json.dumps({"engine": "native",
                                  "skipped": "native lib unavailable"}))
                continue

            def run():
                logits = np.asarray(fwd_j(params, signal))
                out = ctc_beam_search_native(
                    logits, beam_width=args.beam_width,
                    max_label_len=args.max_label_len)
                return float(out[2][0])
        else:
            raise ValueError(engine)

        run()  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(args.steps):
            run()
        dt = (time.perf_counter() - t0) / args.steps
        seq_per_sec = args.batch_size / dt
        results[engine] = seq_per_sec
        print(json.dumps({
            "engine": engine,
            "sequences_per_sec": round(seq_per_sec, 2),
            "audio_samples_per_sec": round(seq_per_sec * args.signal_len, 1),
            "step_ms": round(dt * 1e3, 2),
            "batch": args.batch_size, "L": args.signal_len,
            "beam_width": args.beam_width, "nfeats": nfeats,
            "labels": args.labels, "prune": args.prune_labels,
            "beam_impl": args.beam_impl or "xla",
        }))
    return results


if __name__ == "__main__":
    main()
