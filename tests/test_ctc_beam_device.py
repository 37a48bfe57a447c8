"""On-device CTC prefix beam search vs the exhaustively-validated host
reference (decoding/prefix_beam.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_speech_tpu.decoding.ctc_beam_device import ctc_beam_search_jax
from wavenet_speech_tpu.decoding.prefix_beam import prefix_beam_search


def _host_hyps(logits, beam_width, length=None):
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return prefix_beam_search(lp.astype(np.float64), beam_width,
                              length=length)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("W", [4, 7])
def test_device_beam_matches_host(seed, W):
    rng = np.random.default_rng(seed)
    T, C = 14, 5
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    prefixes, plens, scores = ctc_beam_search_jax(logits, beam_width=W)
    host = _host_hyps(logits[0], W)

    dev_best = tuple(int(x) for x in np.asarray(prefixes[0, 0])[: int(plens[0, 0])])
    assert dev_best == tuple(host[0][0]), (dev_best, host[0][0])
    np.testing.assert_allclose(float(scores[0, 0]), host[0][1], rtol=1e-4)

    # the full surviving beam should agree on prefix ranking (modulo exact
    # ties); compare the top-3 sets
    dev_set = {tuple(int(x) for x in np.asarray(prefixes[0, k])[: int(plens[0, k])])
               for k in range(3)}
    host_set = {tuple(h[0]) for h in host[:3]}
    assert dev_set == host_set


def test_batched_and_lengths():
    rng = np.random.default_rng(9)
    B, T, C, W = 3, 10, 4, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lengths = np.array([10, 6, 3], dtype=np.int32)
    prefixes, plens, scores = ctc_beam_search_jax(logits, lengths,
                                                  beam_width=W)
    for b in range(B):
        host = _host_hyps(logits[b], W, length=int(lengths[b]))
        dev_best = tuple(int(x) for x in
                         np.asarray(prefixes[b, 0])[: int(plens[b, 0])])
        assert dev_best == tuple(host[0][0])
        np.testing.assert_allclose(float(scores[b, 0]), host[0][1], rtol=1e-4)


def test_jit_and_repeat_collapse():
    """'aa' needs a blank gap; peaked repeated logits must decode to one 'a'."""
    T, C = 8, 3
    logits = np.full((1, T, C), -5.0, np.float32)
    logits[0, :, 1] = 3.0
    f = jax.jit(lambda lg: ctc_beam_search_jax(lg, beam_width=4))
    prefixes, plens, scores = f(jnp.asarray(logits))
    assert int(plens[0, 0]) == 1 and int(prefixes[0, 0, 0]) == 1


def test_max_label_len_cap():
    rng = np.random.default_rng(11)
    logits = rng.standard_normal((1, 12, 5)).astype(np.float32)
    prefixes, plens, scores = ctc_beam_search_jax(logits, beam_width=4,
                                                  max_label_len=2)
    assert int(plens.max()) <= 2


def test_wide_alphabet_matches_host():
    """The O(W^2 S) parent-match merge must stay exact for alphabets much
    larger than DNA (the regime the old all-pairs merge couldn't afford)."""
    rng = np.random.default_rng(21)
    T, C, W = 12, 12, 6
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    prefixes, plens, scores = ctc_beam_search_jax(logits, beam_width=W)
    host = _host_hyps(logits[0], W)
    dev_best = tuple(int(x) for x in np.asarray(prefixes[0, 0])[: int(plens[0, 0])])
    assert dev_best == tuple(host[0][0])
    np.testing.assert_allclose(float(scores[0, 0]), host[0][1], rtol=1e-4)


def test_emission_times():
    """ctcdecode `times` parity: each label's emission frame (eval notebook
    cells 19-22). Peaked logits A at frames 2-3, blank gap, G at frame 6."""
    T, C = 8, 3
    logits = np.full((1, T, C), -8.0, np.float32)
    logits[0, :, 0] = 0.0          # blank elsewhere
    logits[0, 2:4, 1] = 8.0        # 'A' held frames 2-3 (collapses)
    logits[0, 6, 2] = 8.0          # 'G' at frame 6
    prefixes, plens, scores, times = ctc_beam_search_jax(
        logits, beam_width=4, return_times=True)
    assert int(plens[0, 0]) == 2
    assert tuple(int(x) for x in np.asarray(prefixes[0, 0, :2])) == (1, 2)
    assert int(times[0, 0, 0]) == 2  # 'A' first emitted at frame 2
    assert int(times[0, 0, 1]) == 6  # 'G' emitted at frame 6


def test_seq_sharded_beam_matches_single_device():
    """North-star distributed beam: logits time-sharded over a 4-way "seq"
    axis, hypothesis state ppermuted between shards; must equal the
    single-device decode exactly (same fixed-shape algorithm, same frames)."""
    from wavenet_speech_tpu.decoding.distributed import seq_sharded_beam_decode
    from wavenet_speech_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    B, T, C, W, S = 4, 32, 5, 7, 16
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lengths = np.array([32, 29, 17, 7], np.int32)  # cross shard boundaries

    p1, l1, s1, t1 = ctc_beam_search_jax(
        logits, lengths, beam_width=W, max_label_len=S, return_times=True)

    mesh = make_mesh(data=2, model=1, seq=4)
    pd, ld, sd, td = seq_sharded_beam_decode(
        mesh, logits, lengths, beam_width=W, max_label_len=S,
        data_sharded=True)

    np.testing.assert_array_equal(np.asarray(ld), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(s1), rtol=1e-5)
    for b in range(B):
        for w in range(W):
            n = int(l1[b, w])
            np.testing.assert_array_equal(np.asarray(pd[b, w, :n]),
                                          np.asarray(p1[b, w, :n]))
            np.testing.assert_array_equal(np.asarray(td[b, w, :n]),
                                          np.asarray(t1[b, w, :n]))


def test_seq_sharded_beam_replicated_batch():
    """data_sharded=False path: batch replicated, only time sharded."""
    from wavenet_speech_tpu.decoding.distributed import seq_sharded_beam_decode
    from wavenet_speech_tpu.parallel import make_mesh

    rng = np.random.default_rng(8)
    B, T, C, W, S = 2, 16, 4, 5, 8
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    p1, l1, s1 = ctc_beam_search_jax(logits, beam_width=W, max_label_len=S)
    mesh = make_mesh(data=1, model=1, seq=8)
    pd, ld, sd, _ = seq_sharded_beam_decode(mesh, logits, beam_width=W,
                                            max_label_len=S)
    np.testing.assert_array_equal(np.asarray(ld), np.asarray(l1))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(s1), rtol=1e-5)


def test_prune_noop_when_k_equals_c():
    """prune=C must reproduce the exact (unpruned) search bit-for-bit in
    labels/lengths and to fp tolerance in scores."""
    rng = np.random.default_rng(21)
    B, T, C, W, S = 3, 40, 5, 7, 20
    logits = (2.0 * rng.standard_normal((B, T, C))).astype(np.float32)
    p0, l0, s0 = ctc_beam_search_jax(logits, beam_width=W, max_label_len=S)
    p1, l1, s1 = ctc_beam_search_jax(logits, beam_width=W, max_label_len=S,
                                     prune=C)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l0))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-6)
    for b in range(B):
        for w in range(W):
            n = int(np.asarray(l0)[b, w])
            np.testing.assert_array_equal(np.asarray(p1)[b, w, :n],
                                          np.asarray(p0)[b, w, :n])


def test_prune_speech_alphabet_matches_exact():
    """cutoff_top_n at K=2W on a 30-label (speech-character) alphabet with
    realistic peaked logits: the pruned search finds the same best
    hypothesis as the exact search (labels that survive the top-W cut are
    inside the frame's top-K)."""
    rng = np.random.default_rng(22)
    B, T, C, W, S = 3, 60, 30, 16, 30
    logits = (3.0 * rng.standard_normal((B, T, C))).astype(np.float32)
    logits[:, rng.random(T) < 0.7, 0] += 5.0  # blank-dominant frames
    p0, l0, s0 = ctc_beam_search_jax(logits, beam_width=W, max_label_len=S)
    p1, l1, s1 = ctc_beam_search_jax(logits, beam_width=W, max_label_len=S,
                                     prune=2 * W)
    for b in range(B):
        n = int(np.asarray(l0)[b, 0])
        assert int(np.asarray(l1)[b, 0]) == n
        np.testing.assert_array_equal(np.asarray(p1)[b, 0, :n],
                                      np.asarray(p0)[b, 0, :n])
    np.testing.assert_allclose(np.asarray(s1)[:, 0], np.asarray(s0)[:, 0],
                               rtol=1e-4)
