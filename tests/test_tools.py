"""Offline tools: FASTA->HDF5 reference dump round-trips into
RawSignalGenerator; Gamma duration fitter recovers known parameters."""
import numpy as np

from wavenet_speech_tpu.tools.dump_distributions import (
    dump_reference,
    main as dump_main,
    read_fasta,
    string_to_array,
)
from wavenet_speech_tpu.tools.fit_durations import (
    DEFAULT_RATE,
    DEFAULT_SHAPE,
    fit_from_tsv,
    idx2str,
    str2idx,
)


def test_fasta_parse_and_labels(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1 description\nACGT\nNNAC\n>chr2\nggttaa\n")
    recs = dict(read_fasta(str(fa)))
    assert recs == {"chr1": "ACGTNNAC", "chr2": "ggttaa"}
    np.testing.assert_array_equal(string_to_array("ACGTN"), [1, 3, 2, 4])


def test_dump_reference_feeds_raw_signal_generator(tmp_path):
    fa = tmp_path / "ref.fa"
    rng = np.random.default_rng(0)
    seq = "".join("AGCT"[i] for i in rng.integers(0, 4, size=2000))
    fa.write_text(f">contig_0\n{seq}\n")
    out = tmp_path / "reference.hdf5"
    dump_reference(str(fa), str(out))

    from wavenet_speech_tpu.data import RawSignalGenerator

    gen = RawSignalGenerator(kmer_model=None, reference_hdf=str(out),
                             read_length_model=(20, 30), sample_rate=50.0,
                             batch_size=2, seed=1)
    b = gen.fetch()
    assert b.signal.shape[0] == 2
    assert (b.labels[b.labels > 0] <= 4).all()
    gen.close()


def test_dump_cli(tmp_path):
    fa = tmp_path / "ref.fa"
    fa.write_text(">c\nACGTACGTACGT\n")
    assert dump_main(["--reference", str(fa), "--outdir", str(tmp_path)]) == 0
    import h5py

    with h5py.File(tmp_path / "reference.hdf5") as f:
        assert f["c"]["contig"].shape == (12,)


def test_kmer_index_roundtrip():
    for idx in [0, 1, 255, 1023, 511]:
        assert str2idx(idx2str(idx)) == idx
    assert str2idx("AAAAA") == 0 and str2idx("TTTTT") == 1023


def _make_tsv(path, kmer, durations, rng):
    rows = ["\t".join(["contig", "position", "reference_kmer", "read_index",
                       "strand", "event_index", "event_level_mean",
                       "event_stdv", "event_length", "event_start_time",
                       "model_kmer", "model_mean", "model_stdv",
                       "standardized_level"])]
    pos, evt = 0, 0
    for d in durations:
        pos += 1
        evt += 1
        rows.append("\t".join(map(str, [
            "ctg", pos, kmer, 0, "t", evt, 80.0, 1.0, d, 0.0,
            kmer, 80.0, 1.0, 0.0])))
    path.write_text("\n".join(rows) + "\n")


def test_duration_fitter_recovers_gamma(tmp_path):
    rng = np.random.default_rng(2)
    true_shape, true_rate = 3.0, 0.002  # scale parameter in the fit
    durations = rng.gamma(true_shape, true_rate, size=4000)
    kmer = "AGCTA"
    tsv = tmp_path / "ea.tsv"
    _make_tsv(tsv, kmer, durations, rng)
    arr = fit_from_tsv(str(tsv), str(tmp_path / "dur.npy"))
    assert arr.shape == (1024, 2)
    k = str2idx(kmer)
    # fitted kmer deviates from the prior and is near the truth
    assert abs(arr[k, 0] - true_shape) / true_shape < 0.5
    # untouched kmers keep the prior
    other = (k + 1) % 1024
    np.testing.assert_allclose(arr[other], [DEFAULT_SHAPE, DEFAULT_RATE],
                               rtol=1e-5)


def test_duration_filters(tmp_path):
    """Rows with unchanged positions / event indices / N-kmers are dropped."""
    tsv = tmp_path / "ea.tsv"
    header = "\t".join(["h"] * 14)
    def row(pos, evt, kmer, dur):
        return "\t".join(map(str, ["c", pos, kmer, 0, "t", evt, 0, 0, dur,
                                   0, kmer, 0, 0, 0]))
    lines = [header,
             row(1, 1, "AAAAA", 0.5),
             row(1, 2, "AAAAA", 0.5),   # middle: position unchanged -> drop
             row(2, 3, "AAAAA", 0.5),
             row(3, 3, "NAAAA", 0.5),   # N kmer -> drop
             row(4, 4, "AAAAA", 0.5)]
    tsv.write_text("\n".join(lines) + "\n")
    arr = fit_from_tsv(str(tsv), str(tmp_path / "d.npy"))
    # nothing admissible -> everything stays at the prior
    np.testing.assert_allclose(arr[:, 0], DEFAULT_SHAPE, rtol=1e-5)


def test_make_synthetic_reads_feeds_queue_loader(tmp_path):
    """tools/make_synthetic_reads.py writes the exact reference HDF5 layout
    (utils/worker_fns.py:13-64): the QueueLoader must train-batch from it
    with correct event->signal/label alignment."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import make_synthetic_reads

    from wavenet_speech_tpu.data.hdf5 import QueueLoader

    path = str(tmp_path / "reads.hdf5")
    make_synthetic_reads.main([path, "--reads", "3", "--events", "500"])
    ld = QueueLoader(path, num_workers=1, batch_size=4,
                     sample_lengths=(20, 30), num_levels=256, seed=1,
                     max_iters=50, queue_size=4, pad_to=360,
                     labels_pad_to=40)
    for split in ("train", "valid"):
        b = ld.dequeue(from_queue=split, timeout=10.0)
        assert b.signal.shape == (4, 360, 256)
        assert b.labels.shape[0] == 4 and b.labels.shape[1] == 40
        # labels = event span + 4 (5-mer adjustment)
        assert (b.label_lengths >= 24).all() and (b.label_lengths <= 34).all()
        # one-hot levels
        assert b.signal.sum(axis=-1).max() == 1.0
        # dwell 4..11 per event: signal lengths in [20*4, 30*11]
        assert (b.signal_lengths >= 80).all() and (b.signal_lengths <= 330).all()
    ld.close()
