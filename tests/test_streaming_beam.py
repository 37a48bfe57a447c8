"""Streaming bounded-memory beam (decoding/streaming.py): exact parity
with the monolithic on-device beam while carrying only a (W, window)
state — VERDICT r2 item #5 (long-read beam decoding)."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.decoding import ctc_beam_search_jax
from wavenet_speech_tpu.decoding.streaming import (StreamingBeam,
                                                   streaming_beam_decode)


def _peaked_logits(T, C=5, seed=0, sharp=3.0, blank_frac=0.8):
    """Random logits shaped like trained CTC output: sharp, and blank-
    dominant on ~blank_frac of frames (nanopore rates are ~1 label per 6
    frames; uniform random logits emit ~0.6 labels/frame, which no bounded
    window — and no real acoustic model — sustains)."""
    rng = np.random.default_rng(seed)
    logits = (sharp * rng.standard_normal((T, C))).astype(np.float32)
    blank_frames = rng.random(T) < blank_frac
    logits[blank_frames, 0] += 2 * sharp
    return logits


def _monolithic(lp_logits, W=7):
    prefixes, plens, scores = ctc_beam_search_jax(
        jnp.asarray(lp_logits)[None], beam_width=W,
        max_label_len=lp_logits.shape[0])
    n = int(np.asarray(plens)[0, 0])
    return (np.asarray(prefixes)[0, 0, :n], float(np.asarray(scores)[0, 0]))


def test_streaming_matches_monolithic():
    for seed in (0, 1, 2):
        logits = _peaked_logits(1500, seed=seed)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        ref_labels, ref_score = _monolithic(logits)
        labels, score, times = streaming_beam_decode(
            lp, beam_width=7, label_window=512, chunk_frames=256)
        np.testing.assert_array_equal(labels, ref_labels)
        assert abs(score - ref_score) < 1e-3
        assert len(times) == len(labels)
        assert np.all(np.diff(times) >= 0)  # emission frames monotone


def test_streaming_ragged_tail_chunk():
    logits = _peaked_logits(1000, seed=3)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    ref_labels, _ = _monolithic(logits)
    # 1000 % 384 != 0: exercises the padded carry-through tail chunk
    labels, _, _ = streaming_beam_decode(lp, beam_width=7,
                                         label_window=512, chunk_frames=384)
    np.testing.assert_array_equal(labels, ref_labels)


def test_commits_bound_window_occupancy():
    """The window must stay far below the total decoded length — the whole
    point of streaming (state is (W, window), not (W, L_out))."""
    logits = _peaked_logits(2000, seed=4)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    sb = StreamingBeam(beam_width=7, label_window=256)
    for s in range(0, 2000, 250):
        sb.feed(lp[s: s + 250])
    labels, _, _ = sb.finalize()
    assert sb.saturated_chunks == 0
    occupancy = int(sb.state[1].max())
    assert len(sb.committed) > 0
    assert occupancy < 256
    assert len(labels) == len(sb.committed) + int(
        np.asarray(sb.state[1])[np.argmax(np.logaddexp(sb.state[2],
                                                       sb.state[3]))])
    ref_labels, _ = _monolithic(logits)
    np.testing.assert_array_equal(labels, ref_labels)


def test_basecall_long_beam_on_20k_read():
    """End-to-end: a ~20k-sample read through chunked forward + streaming
    beam equals the monolithic beam over the same stitched logits."""
    from wavenet_speech_tpu.inference import Basecaller, chunked_logits
    from wavenet_speech_tpu.models import RawCTCNet
    from wavenet_speech_tpu.decoding import labels2strings

    F = 8
    net = RawCTCNet(num_features=F, feature_kwidth=3, num_labels=5,
                    layers=((F, F, 2, 1), (F, F, 2, 2)), out_dim=F,
                    positions=False, softmax=False)
    params = net.init(jax.random.PRNGKey(0))
    # shape the untrained head like a trained CTC model: blank-dominant
    # (~1 label / 6 frames at nanopore rates) with well-separated classes.
    # The raw eye-init net emits fp-noise-scale A/C ties on every frame, so
    # ANY reassociation (vmap vs direct lowering) flips beam choices —
    # a degeneracy no trained model exhibits and no beam parity survives.
    bias = jnp.asarray([0.6, 0.9, -0.3, 0.1, -0.7], jnp.float32)
    params["out2"]["b"] = params["out2"]["b"] + bias
    params["out2"]["w"] = params["out2"]["w"] * 3.0
    rng = np.random.default_rng(5)
    signal = rng.standard_normal((20000, 1)).astype(np.float32)

    caller = Basecaller(model=net, params=params, beam_width=5)
    seq, score = caller.basecall_long(signal, chunk_len=4096,
                                      beam_chunk_frames=1024,
                                      label_window=2048)

    logits = chunked_logits(net, params, jnp.asarray(signal), 4096)
    ref_labels, ref_score = _monolithic(np.asarray(logits), W=5)
    assert seq == labels2strings([ref_labels])[0]
    assert abs(score - ref_score) < 1e-2


def test_batched_streaming_matches_per_sequence():
    """StreamingBeamBatch (vmapped chunk scans, per-read host commits) must
    equal the single-sequence streaming decoder per read, including ragged
    per-read lengths on a shared chunk grid."""
    from wavenet_speech_tpu.decoding.streaming import StreamingBeamBatch

    B, T, C = 3, 900, 5
    lengths = np.asarray([900, 700, 512], np.int32)
    lps = []
    for b in range(B):
        logits = _peaked_logits(T, C=C, seed=40 + b)
        lps.append(np.asarray(jax.nn.log_softmax(jnp.asarray(logits),
                                                 axis=-1)))
    lp = np.stack(lps)

    sbb = StreamingBeamBatch(B, lengths, beam_width=7, label_window=256)
    for s in range(0, T, 300):
        sbb.feed(lp[:, s: s + 300])
    batch_out = sbb.finalize()
    assert sbb.saturated_chunks == 0

    for b in range(B):
        ref_labels, ref_score, _ = streaming_beam_decode(
            lp[b, : lengths[b]], beam_width=7, label_window=256,
            chunk_frames=300)
        labels, score, tms = batch_out[b]
        np.testing.assert_array_equal(labels, ref_labels)
        assert abs(score - ref_score) < 1e-3
        assert len(tms) == len(labels)


def test_streaming_cutoff_top_n_matches_monolithic_pruned():
    """cutoff_top_n threaded through the streaming path (VERDICT r4 #5)
    must reproduce the monolithic beam run with the same per-frame label
    pre-prune — on a speech-sized alphabet where the prune actually bites
    (C=30, prune 8; the 1.75x lever of RESULTS.md round 3)."""
    for seed in (0, 1):
        logits = _peaked_logits(1200, C=30, seed=seed)
        # with C=30 the generator's +2*sharp blank boost no longer
        # dominates the max of 30 sharp gaussians — push blank frames
        # properly dominant so emission stays at nanopore-like rates and
        # the bounded window never saturates (saturation is tested
        # elsewhere; this test is about prune parity)
        blank_frames = logits[:, 0] > logits[:, 1:].max(axis=1) - 3.0
        logits[blank_frames, 0] += 12.0
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
        prefixes, plens, scores = ctc_beam_search_jax(
            jnp.asarray(logits)[None], beam_width=7,
            max_label_len=logits.shape[0], prune=8)
        n = int(np.asarray(plens)[0, 0])
        ref_labels = np.asarray(prefixes)[0, 0, :n]
        ref_score = float(np.asarray(scores)[0, 0])
        labels, score, _ = streaming_beam_decode(
            lp, beam_width=7, label_window=512, chunk_frames=256,
            cutoff_top_n=8)
        np.testing.assert_array_equal(labels, ref_labels)
        assert abs(score - ref_score) < 1e-3


def test_batched_streaming_cutoff_matches_single():
    """The batched serving path with cutoff_top_n equals per-sequence
    streaming decodes with the same prune."""
    from wavenet_speech_tpu.decoding.streaming import StreamingBeamBatch

    B, T, C = 3, 768, 30
    lps = []
    for b in range(B):
        logits = _peaked_logits(T, C=C, seed=10 + b)
        blank_frames = logits[:, 0] > logits[:, 1:].max(axis=1) - 3.0
        logits[blank_frames, 0] += 12.0  # see prune-parity test above
        lps.append(np.asarray(jax.nn.log_softmax(jnp.asarray(logits),
                                                 axis=-1)))
    lp = np.stack(lps)
    sbb = StreamingBeamBatch(B, np.full((B,), T, np.int32), beam_width=7,
                             label_window=512, cutoff_top_n=8)
    for s in range(0, T, 256):
        sbb.feed(lp[:, s: s + 256])
    outs = sbb.finalize()
    for b in range(B):
        labels, score, _ = streaming_beam_decode(
            lp[b], beam_width=7, label_window=512, chunk_frames=256,
            cutoff_top_n=8)
        np.testing.assert_array_equal(outs[b][0], labels)
        assert abs(outs[b][1] - score) < 1e-3
