"""Data-generator throughput benchmark (reference
tests/pore_model_loader_bench.py:9-19, which timeit's one PoreModelLoader
fetch and records no number).

Measures batches/sec and audio-samples/sec of every host-side generator at a
training-realistic configuration, so input-pipeline headroom over the device
step rate is visible (at 202k device samples/sec the generators must sustain
the same rate or the chip starves — SURVEY.md §7 hard part 6).

Usage: python benchmarks/data_throughput.py [--batch-size 8] [--iters 50]
"""
from __future__ import annotations

import argparse
import json
import tempfile
import time


def _bench(name, loader, iters, samples_of):
    loader.fetch()  # warm caches
    t0 = time.perf_counter()
    samples = 0
    for _ in range(iters):
        samples += samples_of(loader.fetch())
    dt = time.perf_counter() - t0
    print(json.dumps({
        "generator": name,
        "batches_per_sec": round(iters / dt, 1),
        "audio_samples_per_sec": round(samples / dt, 1),
        "ms_per_fetch": round(dt / iters * 1e3, 3),
    }))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)

    import h5py
    import numpy as np

    from wavenet_speech_tpu.data import (
        GaussianModelLoader,
        PoreModelLoader,
        RawGaussianModelLoader,
        RawSignalGenerator,
    )

    big = 10 ** 9
    onehot_samples = lambda b: int(np.prod(b.signal.shape[:2]))  # noqa: E731

    _bench("pore_model (one-hot 256)",
           PoreModelLoader(big, big, 1000, batch_size=args.batch_size,
                           lengths=(90, 100), seed=0),
           args.iters, onehot_samples)
    _bench("gaussian_5mer (one-hot 256)",
           GaussianModelLoader(big, big, 1000, batch_size=args.batch_size,
                               upsampling=4, lengths=(90, 100), seed=0),
           args.iters, onehot_samples)
    _bench("raw_gaussian_5mer (float)",
           RawGaussianModelLoader(big, big, 1000, batch_size=args.batch_size,
                                  upsampling=6, random_upsample=True,
                                  lengths=(80, 90), seed=0),
           args.iters, onehot_samples)

    with tempfile.NamedTemporaryFile(suffix=".hdf5") as f:
        rng = np.random.default_rng(0)
        with h5py.File(f.name, "w") as h5:
            h5.create_group("contig_0").create_dataset(
                "contig", data=rng.integers(1, 5, size=200_000).astype(np.int32))
        gen = RawSignalGenerator(kmer_model=None, reference_hdf=f.name,
                                 read_length_model=(80, 90),
                                 sample_rate=800.0,
                                 batch_size=args.batch_size, seed=0)
        _bench("raw_signal_generator (HDF5 genome, Gamma durations)",
               gen, args.iters, onehot_samples)
        gen.close()


if __name__ == "__main__":
    main()
