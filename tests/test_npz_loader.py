"""NPZ shard loader: round-trip through real worker processes."""
import numpy as np
import pytest

from wavenet_speech_tpu.data.npz_loader import NPZQueueLoader


def _make_shards(tmp_path, n_shards=2, per_shard=12, seed=0):
    rng = np.random.default_rng(seed)
    for s in range(n_shards):
        signals = np.array(
            [rng.integers(0, 64, size=rng.integers(30, 50)) for _ in range(per_shard)],
            dtype=object)
        reads = np.array(
            [rng.integers(1, 5, size=rng.integers(5, 10)) for _ in range(per_shard)],
            dtype=object)
        np.savez(tmp_path / f"shard_{s}.npz", signals=signals, reads=reads,
                 allow_pickle=True)


def test_npz_loader_roundtrip(tmp_path):
    _make_shards(tmp_path)
    ld = NPZQueueLoader(str(tmp_path / "shard_*.npz"), batch_size=4,
                        num_levels=64, num_workers=2, max_iters=6, seed=1)
    n = 0
    try:
        while True:
            b = ld.dequeue(timeout=20.0)
            assert b.signal.shape[0] == 4 and b.signal.shape[2] == 64
            np.testing.assert_allclose(
                b.signal[0, : b.signal_lengths[0]].sum(-1), 1.0)
            assert (b.labels >= 0).all() and (b.labels <= 4).all()
            n += 1
    except StopIteration:
        pass
    finally:
        ld.close()
    assert n == 6


def test_npz_loader_missing_glob(tmp_path):
    with pytest.raises(FileNotFoundError):
        NPZQueueLoader(str(tmp_path / "nope_*.npz"))
