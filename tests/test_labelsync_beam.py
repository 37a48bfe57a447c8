"""Label-sync beam decoder vs a direct numpy transcription of the reference
Beam.advance math (modules/beam.py:98-126), plus distributed beam decode."""
import numpy as np
import jax.numpy as jnp
import pytest

from wavenet_speech_tpu.decoding.labelsync import Beam, BeamSearchDecoder


def numpy_reference_beam(probs, beam_width, mapping):
    """Faithful numpy restatement of reference Beam (additive scores over
    softmax probabilities, first-step beam-0 only, stop at top-beam </s>)."""
    T, C = probs.shape
    W = beam_width
    scores = np.zeros(W)
    prev_ks, next_ys = [], []
    done = False
    for t in range(T):
        if done:
            break
        if t == 0:
            beam_dist = probs[t].copy()  # (C,) from beam 0 only
            flat = beam_dist
        else:
            flat = (probs[t][None, :] + scores[:, None]).reshape(-1)
        ids = np.argsort(-flat)[:W]
        best = flat[ids]
        scores = best
        prev_k = ids // C if t > 0 else np.zeros(W, int)
        next_y = ids % C if t > 0 else ids
        prev_ks.append(prev_k)
        next_ys.append(next_y)
        if next_y[0] == mapping["</s>"]:
            done = True
    # hyp walk for top beam
    k = 0
    hyp = []
    for j in range(len(prev_ks) - 1, -1, -1):
        hyp.append(int(next_ys[j][k]))
        k = int(prev_ks[j][k])
    return scores, hyp[::-1], done


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_labelsync_matches_reference_math(seed):
    rng = np.random.default_rng(seed)
    B, C, L, W = 2, 7, 9, 4
    logits = rng.standard_normal((B, C, L)).astype(np.float32)
    dec = BeamSearchDecoder(B, C, beam_width=W)
    probas, hyps = dec.decode(logits)

    for b in range(B):
        x = logits[b].T  # (L, C)
        p = np.exp(x) / np.exp(x).sum(-1, keepdims=True)
        ref_scores, ref_hyp, _ = numpy_reference_beam(
            p.astype(np.float64), W, dec.symbol_dict)
        assert hyps[b] == ref_hyp
        np.testing.assert_allclose(probas[b], ref_scores.max(), rtol=1e-4)


def test_labelsync_stops_at_eos():
    """A distribution that strongly prefers </s> at step 3 must stop there."""
    C, L, W = 7, 8, 3
    logits = np.full((1, C, L), 0.0, np.float32)
    logits[0, 1, :] = 2.0          # prefer label 1
    logits[0, 6, 3] = 10.0         # </s> spike at t=3
    dec = BeamSearchDecoder(1, C, beam_width=W)
    _, hyps = dec.decode(logits)
    assert len(hyps[0]) == 4       # t=0..3 inclusive
    assert hyps[0][-1] == 6


def test_distributed_beam_decode_matches_local():
    from wavenet_speech_tpu.decoding.ctc_beam_device import ctc_beam_search_jax
    from wavenet_speech_tpu.decoding.distributed import distributed_beam_decode
    from wavenet_speech_tpu.parallel import make_mesh

    rng = np.random.default_rng(5)
    B, T, C, W = 8, 10, 5, 4
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    mesh = make_mesh(data=8)
    pfx_d, pl_d, sc_d = distributed_beam_decode(mesh, logits, beam_width=W,
                                                max_label_len=T)
    pfx, pl, sc = ctc_beam_search_jax(logits, beam_width=W, max_label_len=T)
    np.testing.assert_allclose(np.asarray(sc_d), np.asarray(sc), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(pl_d), np.asarray(pl))
    np.testing.assert_array_equal(np.asarray(pfx_d), np.asarray(pfx))
