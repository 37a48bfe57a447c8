"""Generate a realistic-scale E.coli-style reads HDF5 in the exact layout
the reference pipeline consumes (reference utils/worker_fns.py:13-64 reads
it; the dump_distributions tooling documents it):

  /read_<i>/quantized        vlen int64 — per-EVENT chunks of quantized
                             (0..num_levels-1) raw samples
  /read_<i>/raw/positions    int64 — per-event genomic position index
  /read_<i>/reference        int32 — base ids 1..4 (A,G,C,T) covering the
                             read's positions span (+4 for the 5-mer tail)

Signals are synthesized from the SAME physics as the quality experiments:
each event's 5-mer drawn through the r9.4 Gaussian current table
(data/r9.4_450bps.5mer.template.npz), a random 4..11-sample dwell per
event, then the whole read mu-law quantized with the reference's law
(data/common.MuLawQuantizer == utils/pore_model.py:58-85).

Usage:
  python tools/make_synthetic_reads.py out.hdf5 --reads 24 --events 20000
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wavenet_speech_tpu.data.common import MuLawQuantizer  # noqa: E402
from wavenet_speech_tpu.data.gaussian_kmer import (  # noqa: E402
    DEFAULT_KMER_MODEL, kmer_ids)


def make_read(rng, n_events: int, means, stdvs, num_levels: int,
              dwell=(4, 12)):
    """Returns (reference bases, positions, list of per-event quantized
    chunks)."""
    bases = rng.integers(1, 5, size=n_events + 8).astype(np.int32)
    ks = kmer_ids(bases, trim=0)[:n_events]          # 5-mer per event
    dwells = rng.integers(dwell[0], dwell[1], size=n_events)
    mu = np.repeat(means[ks], dwells)
    sd = np.repeat(stdvs[ks], dwells)
    picoamps = rng.normal(mu, sd)
    quant = MuLawQuantizer(num_levels)(picoamps).astype(np.int64)
    bounds = np.cumsum(dwells)[:-1]
    chunks = np.split(quant, bounds)
    positions = np.arange(n_events, dtype=np.int64)
    return bases, positions, chunks


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--reads", type=int, default=24)
    ap.add_argument("--events", type=int, default=20000)
    ap.add_argument("--num-levels", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import h5py

    npz = np.load(DEFAULT_KMER_MODEL)
    means, stdvs = npz["means"], npz["stdvs"]
    rng = np.random.default_rng(args.seed)
    dt = h5py.vlen_dtype(np.dtype("int64"))
    total = 0
    with h5py.File(args.out, "w") as f:
        for r in range(args.reads):
            bases, positions, chunks = make_read(
                rng, args.events, means, stdvs, args.num_levels)
            g = f.create_group(f"read_{r}")
            ds = g.create_dataset("quantized", (len(chunks),), dtype=dt)
            # h5py vlen assignment is per-row; chunked slice writes batch it
            for s in range(0, len(chunks), 4096):
                ds[s: s + 4096] = chunks[s: s + 4096]
            g.create_group("raw").create_dataset("positions", data=positions)
            g.create_dataset("reference", data=bases)
            total += sum(len(c) for c in chunks)
    print(f"wrote {args.reads} reads x {args.events} events "
          f"({total} raw samples) -> {args.out} "
          f"({os.path.getsize(args.out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
