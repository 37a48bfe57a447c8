"""Chunked long-read basecalling: stitched chunk logits must equal the
monolithic forward (interior trims remove all edge contamination)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_speech_tpu.inference import chunked_logits, _default_margin
from wavenet_speech_tpu.models import RawCTCNet, WaveNet


def _rawctc(F=12):
    layers = tuple((F, F, 3, d) for d in (1, 2, 4))
    return RawCTCNet(F, 3, 5, layers, F, positions=False, softmax=False,
                     causal=False)


@pytest.mark.parametrize("L,chunk_len", [(300, 96), (257, 100), (96, 200)])
def test_chunked_matches_full_rawctcnet(L, chunk_len):
    net = _rawctc()
    params = net.init(jax.random.PRNGKey(0))
    sig = jnp.asarray(
        np.random.default_rng(1).standard_normal((L, 1)), jnp.float32)
    full = net.apply(params, sig[None])[0]
    got = chunked_logits(net, params, sig, chunk_len=chunk_len,
                         chunk_batch=3)
    assert got.shape == full.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_chunked_matches_full_causal_wavenet():
    C = 8
    net = WaveNet(C, 2, ((C, C, 2, 1), (C, C, 2, 4)), C, softmax=False)
    params = net.init(jax.random.PRNGKey(2))
    sig = jnp.asarray(np.eye(C, dtype=np.float32)[
        np.random.default_rng(3).integers(0, C, size=160)])
    full = net.apply(params, sig[None])[0]
    got = chunked_logits(net, params, sig, chunk_len=64, chunk_batch=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_margin_and_guards():
    net = _rawctc()
    assert _default_margin(net) == (3 - 1) + (2 * 1 + 2 * 2 + 2 * 4)
    params = net.init(jax.random.PRNGKey(0))
    sig = jnp.zeros((64, 1), jnp.float32)
    with pytest.raises(ValueError):
        chunked_logits(net, params, sig, chunk_len=2 * _default_margin(net))


def test_basecall_long_end_to_end():
    from wavenet_speech_tpu.inference import Basecaller

    net = _rawctc()
    params = net.init(jax.random.PRNGKey(4))
    caller = Basecaller(model=net, params=params, beam_width=4,
                        max_label_len=64)
    sig = np.random.default_rng(5).standard_normal((400, 1)).astype(np.float32)
    seq_long, score = caller.basecall_long(sig, chunk_len=128, chunk_batch=2)
    # must agree with the monolithic pipeline on a read that still fits
    seqs, scores = caller(sig[None])
    assert seq_long == seqs[0]
    # scores differ slightly: the monolithic path bucket-pads to 512 raw
    # samples, contaminating the last receptive field of logits; the
    # chunked path forwards the exact read
    np.testing.assert_allclose(score, scores[0], rtol=0.02)


def test_chunked_batch_matches_per_read():
    """chunked_logits_batch == per-read chunked_logits == monolithic
    forward, long- and short-read branches."""
    from wavenet_speech_tpu.inference import chunked_logits_batch

    net = _rawctc()
    params = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    for B, L, chunk_len in [(3, 300, 96), (2, 257, 100), (4, 96, 200)]:
        sigs = rng.standard_normal((B, L, 1)).astype(np.float32)
        got = chunked_logits_batch(net, params, sigs, chunk_len=chunk_len,
                                   chunk_batch=3)
        full = np.asarray(net.apply(params, jnp.asarray(sigs)))
        assert got.shape == full.shape
        np.testing.assert_allclose(got, full, rtol=1e-5, atol=1e-5)
        for b in range(B):
            per_read = chunked_logits(net, params, jnp.asarray(sigs[b]),
                                      chunk_len=chunk_len, chunk_batch=3)
            np.testing.assert_allclose(got[b], np.asarray(per_read),
                                       rtol=1e-6, atol=1e-6)


def test_basecall_long_batch_matches_single():
    """The batched serving path decodes each read identically to the
    single-read path (same grid, same kernels, same beam)."""
    from wavenet_speech_tpu.inference import Basecaller

    net = _rawctc()
    params = net.init(jax.random.PRNGKey(4))
    # bias the head away from ties (untrained eye-init nets emit
    # degenerate near-tie labels; see test_streaming_beam.py)
    params["out2"]["b"] = params["out2"]["b"] + jnp.asarray(
        [1.0, 0.6, -0.3, 0.1, -0.6], jnp.float32)
    caller = Basecaller(model=net, params=params, beam_width=4)
    rng = np.random.default_rng(11)
    sigs = rng.standard_normal((3, 700, 1)).astype(np.float32)
    seqs, scores = caller.basecall_long_batch(
        sigs, chunk_len=256, beam_chunk_frames=128, label_window=256)
    assert len(seqs) == 3
    for b in range(3):
        seq1, _ = caller.basecall_long(
            sigs[b], chunk_len=256, beam_chunk_frames=128, label_window=256)
        assert seqs[b] == seq1, (b, seqs[b][:40], seq1[:40])
