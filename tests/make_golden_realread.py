"""Regenerate the REAL-READ overfit golden fixture (run manually:
`python tests/make_golden_realread.py`).

The reference's canonical convergence demo overfits joint WaveNet-CTC on
ONE real read to per-char CTC < 0.3 (reference ipynbs/CTC Overfit.ipynb
cell 19; tests/wavenet_overfit_test.py:16-63). Its fixture blob is not in
the repo, so the anchor here is an equivalent read built from the SAME
pipeline the real-data path trains on: r9.4 Gaussian 5-mer physics +
mu-law quantization (tools/make_synthetic_reads.make_read) written in the
reference utils/worker_fns.py HDF5 layout, windowed through the actual
ecoli_worker_fn. Fixed seeds everywhere; the paired test regenerates the
windows through the live pipeline and asserts bit-equality with this
fixture before overfitting on it (tests/test_realread_overfit.py)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root (tools/ imports)
OUT = os.path.join(HERE, "golden", "realread_window.npz")

READ_SEED = 123
WORKER_SEED = 5
N_EVENTS = 400
SAMPLE_LENGTHS = (16, 20)
BATCH = 2
NUM_LEVELS = 256


def build(tmpdir=None):
    """Returns the fixture dict: one worker_fn window batch (quantized
    LEVELS signal + reference-base labels) from a single physics read."""
    import tempfile

    import h5py

    from tools.make_synthetic_reads import make_read
    from wavenet_speech_tpu.data.gaussian_kmer import DEFAULT_KMER_MODEL
    from wavenet_speech_tpu.data.hdf5 import ecoli_worker_fn

    npz = np.load(DEFAULT_KMER_MODEL)
    rng = np.random.default_rng(READ_SEED)
    bases, positions, chunks = make_read(rng, N_EVENTS, npz["means"],
                                         npz["stdvs"], NUM_LEVELS)
    tmpdir = tmpdir or tempfile.mkdtemp()
    path = os.path.join(str(tmpdir), "one_read.hdf5")
    dt = h5py.vlen_dtype(np.dtype("int64"))
    with h5py.File(path, "w") as f:
        g = f.create_group("read_0")
        ds = g.create_dataset("quantized", (len(chunks),), dtype=dt)
        ds[:] = chunks
        g.create_group("raw").create_dataset("positions", data=positions)
        g.create_dataset("reference", data=bases)

    with h5py.File(path, "r") as f:
        read, subintervals, batch = ecoli_worker_fn(
            f, ["read_0"], np.random.default_rng(WORKER_SEED),
            batch_size=BATCH, sample_lengths=SAMPLE_LENGTHS,
            num_levels=NUM_LEVELS, debug_mode=True, device_onehot=True)
    return {
        "signal": batch.signal,              # (B, L) quantized levels
        "labels": batch.labels,
        "label_lengths": batch.label_lengths,
        "signal_lengths": batch.signal_lengths,
        "subintervals": np.asarray(subintervals, np.int64),
    }


if __name__ == "__main__":
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **build())
    print("wrote", OUT)
