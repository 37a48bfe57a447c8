"""Long-read basecalling throughput: chunked forward + STREAMING beam
(VERDICT r2 #5's measured row — beam decode at the 10^5-10^6-sample read
lengths inference.py cites, where the monolithic beam's (W, L_out) state
and O(W^2 * L_out)-per-frame merge are intractable).

Prints one JSON line per engine (beam = streaming bounded-window beam;
greedy = argmax collapse over the stitched logits).

Usage:
  python benchmarks/long_read.py                    # TPU, 131072 samples
  python benchmarks/long_read.py --platform cpu --read-len 20000 --scale 0.0625
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--read-len", type=int, default=131072)
    ap.add_argument("--scale", type=float, default=0.25,
                    help="model scale vs the 2048-feat eval config")
    ap.add_argument("--beam-width", type=int, default=7)
    ap.add_argument("--chunk-len", type=int, default=16384)
    ap.add_argument("--beam-chunk-frames", type=int, default=4096)
    ap.add_argument("--label-window", type=int, default=4096)
    ap.add_argument("--cutoff-top-n", type=int, default=None,
                    help="per-frame label pre-prune for the beam engines "
                         "(ctcdecode's cutoff_top_n)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=0,
                    help="also measure the batched serving path "
                         "(basecall_long_batch) at this many reads")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.inference import Basecaller
    from wavenet_speech_tpu.models import RawCTCNet

    nfeats = max(int(2048 * args.scale), 16)
    cycle = tuple((nfeats, nfeats, 2, d) for d in (1, 2, 4, 8, 16)) \
        + tuple((nfeats, nfeats, 3, d) for d in (1, 2, 4, 8, 16))
    net = RawCTCNet(nfeats, 3, 5, cycle, max(int(512 * args.scale), 16),
                    positions=False, softmax=False, causal=False)
    params = net.init(jax.random.PRNGKey(0))
    # blank-dominant, well-separated head (an untrained eye-init net emits
    # pathological near-tie labels every frame; see test_streaming_beam.py)
    params["out2"]["b"] = params["out2"]["b"] + jnp.asarray(
        [1.2, 0.9, -0.3, 0.1, -0.7], jnp.float32)
    rng = np.random.default_rng(0)
    signal = rng.standard_normal((args.read_len, 1)).astype(np.float32)

    for engine, W in (("streaming-beam", args.beam_width), ("greedy", 0)):
        caller = Basecaller(model=net, params=params, beam_width=W,
                            cutoff_top_n=args.cutoff_top_n)
        seq, score = caller.basecall_long(     # compile warmup
            signal, chunk_len=args.chunk_len,
            beam_chunk_frames=args.beam_chunk_frames,
            label_window=args.label_window)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            seq, score = caller.basecall_long(
                signal, chunk_len=args.chunk_len,
                beam_chunk_frames=args.beam_chunk_frames,
                label_window=args.label_window)
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "engine": engine,
            "read_len": args.read_len,
            "seconds_per_read": round(dt, 3),
            "audio_samples_per_sec": round(args.read_len / dt, 1),
            "decoded_labels": len(seq),
            "beam_width": W, "label_window": args.label_window,
            "cutoff_top_n": args.cutoff_top_n,
            "nfeats": nfeats,
        }))

    if args.batch:
        B = args.batch
        sigs = rng.standard_normal((B, args.read_len, 1)).astype(np.float32)
        caller = Basecaller(model=net, params=params,
                            beam_width=args.beam_width,
                            cutoff_top_n=args.cutoff_top_n)
        seqs, _ = caller.basecall_long_batch(   # warmup
            sigs, chunk_len=args.chunk_len,
            beam_chunk_frames=args.beam_chunk_frames,
            label_window=args.label_window)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            seqs, _ = caller.basecall_long_batch(
                sigs, chunk_len=args.chunk_len,
                beam_chunk_frames=args.beam_chunk_frames,
                label_window=args.label_window)
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({
            "engine": "streaming-beam-batched",
            "read_len": args.read_len, "batch": B,
            "seconds_per_batch": round(dt, 3),
            "reads_per_sec": round(B / dt, 3),
            "audio_samples_per_sec": round(B * args.read_len / dt, 1),
            "beam_width": args.beam_width,
            "cutoff_top_n": args.cutoff_top_n,
            "label_window": args.label_window, "nfeats": nfeats,
        }))


if __name__ == "__main__":
    main()
