"""Attentional conv decoder: shape contract, causality of the conv path,
and the reference's sum-normalized attention semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.models.conv_decoder import AttnConvolutionalDecoder, glu
from wavenet_speech_tpu.ops.fns import compute_receptive_field, one_hot_encoding


def _dec(norm=False, T=12):
    return AttnConvolutionalDecoder(
        num_labels=7, embed_dim=8, layers=((3, 8, 8), (3, 8, 8)),
        encoding_dim=6, max_time=T, norm=norm)


def test_shapes_and_norm_variant(rng):
    for norm in [False, True]:
        dec = _dec(norm)
        params = dec.init(jax.random.PRNGKey(0))
        targets = jnp.asarray(rng.integers(0, 7, size=(2, 12)))
        enc = jnp.asarray(rng.standard_normal((2, 9, 6)).astype(np.float32))
        out = dec.apply(params, enc, targets)
        assert out.shape == (2, 12, 7)
        assert np.isfinite(np.asarray(out)).all()


def test_glu():
    x = jnp.asarray([1.0, -2.0])
    y = jnp.asarray([0.0, 10.0])
    np.testing.assert_allclose(np.asarray(glu(x, y)),
                               [0.5, -2.0 * (1 / (1 + np.exp(-10)))],
                               rtol=1e-5)


def test_attention_is_sum_normalized(rng):
    """Attention weights sum to 1 along the encoder axis by construction
    (raw / sum), even though they are not softmaxed."""
    dec = _dec()
    params = dec.init(jax.random.PRNGKey(1))
    in_seq = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    enc = jnp.asarray(rng.standard_normal((2, 9, 6)).astype(np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 5, 8)).astype(np.float32))
    p = params["layer0"]["attn"]
    d = (in_seq @ p["in2enc"]["w"].T + p["in2enc"]["b"]
         + emb @ p["lab2enc"]["w"].T + p["lab2enc"]["b"])
    raw = jnp.einsum("bte,ble->btl", d, enc)
    attns = raw / jnp.sum(raw, axis=2, keepdims=True)
    np.testing.assert_allclose(np.asarray(jnp.sum(attns, 2)), 1.0, rtol=1e-4)


def test_conv_path_causality(rng):
    """With attention contributions removed (zero enc2in), outputs at t
    must not depend on targets after t."""
    dec = _dec()
    params = dec.init(jax.random.PRNGKey(2))
    for i in range(2):
        a = params[f"layer{i}"]["attn"]
        a["enc2in"]["w"] = jnp.zeros_like(a["enc2in"]["w"])
        a["enc2in"]["b"] = jnp.zeros_like(a["enc2in"]["b"])
    targets = jnp.asarray(rng.integers(0, 7, size=(1, 12)))
    enc = jnp.asarray(rng.standard_normal((1, 9, 6)).astype(np.float32))
    y0 = dec.apply(params, enc, targets)
    y1 = dec.apply(params, enc, targets.at[0, 8].set((targets[0, 8] + 1) % 7))
    np.testing.assert_allclose(np.asarray(y0[:, :8]), np.asarray(y1[:, :8]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(y0[:, 8:]), np.asarray(y1[:, 8:]))


def test_fns_helpers():
    oh = one_hot_encoding(jnp.asarray([[1, 0, 3]]), 4)
    assert oh.shape == (1, 3, 4)
    np.testing.assert_array_equal(np.asarray(oh[0, 0]), [0, 1, 0, 0])
    oh_ncl = one_hot_encoding(jnp.asarray([[1, 0, 3]]), 4, axis=1)
    assert oh_ncl.shape == (1, 4, 3)
    # receptive field: depth 3 ([1,2,4,8]), 2 stacks, k=2 -> 2*15+1 = 31
    assert compute_receptive_field(3, 2) == 31
