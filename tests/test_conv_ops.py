"""Conv op parity tests, modeled on reference tests/test_conv_ops.py but
with numeric asserts against torch.nn.functional (the reference's backend)
instead of human-judged printouts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from wavenet_speech_tpu.ops import (
    causal_conv1d,
    noncausal_conv1d,
    autopad,
    receptive_field,
    CausalConv1d,
    NonCausalConv1d,
)


def torch_causal(x_ncl, w_oik, b, dilation):
    """Reference CausalConv1d semantics (conv_ops.py:28-44): pad both sides
    by (k-1)*d, slice [0:L]."""
    k = w_oik.shape[2]
    pad = (k - 1) * dilation
    out = F.conv1d(x_ncl, w_oik, b, padding=pad, dilation=dilation)
    return out[:, :, : x_ncl.shape[2]]


def torch_noncausal(x_ncl, w_oik, b, dilation):
    """Reference NonCausalConv1d semantics (conv_ops.py:62-79,104-116)."""
    k = w_oik.shape[2]
    pad = autopad(k, dilation)
    out = F.conv1d(x_ncl, w_oik, b, padding=pad, dilation=dilation)
    return out[:, :, : x_ncl.shape[2]]


@pytest.mark.parametrize("k,d", [(2, 1), (2, 4), (3, 1), (3, 2), (5, 3), (2, 64)])
def test_causal_conv_matches_torch(rng, k, d):
    B, L, Cin, Cout = 2, 200, 8, 16
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    w = rng.standard_normal((k, Cin, Cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((Cout,)).astype(np.float32)

    ours = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=d)
    # torch layout: x (B, C, L), w (out, in, k)
    theirs = torch_causal(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w.transpose(2, 1, 0)),
        torch.from_numpy(b),
        d,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,d", [(3, 1), (3, 2), (5, 3), (3, 64), (2, 2)])
def test_noncausal_conv_matches_torch(rng, k, d):
    B, L, Cin, Cout = 2, 200, 8, 16
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    w = rng.standard_normal((k, Cin, Cout)).astype(np.float32) * 0.1
    b = rng.standard_normal((Cout,)).astype(np.float32)

    ours = noncausal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), dilation=d)
    theirs = torch_noncausal(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w.transpose(2, 1, 0)),
        torch.from_numpy(b),
        d,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def test_causality():
    """Changing inputs at time t must not change causal outputs before t."""
    key = jax.random.PRNGKey(0)
    mod = CausalConv1d(4, 4, kernel_width=2, dilation=4)
    params = mod.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 4))
    y0 = mod.apply(params, x)
    x2 = x.at[:, 40, :].set(99.0)
    y1 = mod.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y0[:, :40]), np.asarray(y1[:, :40]),
                               rtol=1e-6)
    assert not np.allclose(np.asarray(y0[:, 40:]), np.asarray(y1[:, 40:]))


def test_length_preservation_and_receptive_field():
    for k, d in [(2, 1), (3, 5), (4, 2), (2, 512)]:
        assert receptive_field(k, d) == k + (d - 1) * (k - 1)
        x = jnp.zeros((1, 100, 3))
        w = jnp.zeros((k, 3, 3))
        assert causal_conv1d(x, w, dilation=d).shape == (1, 100, 3)
        assert noncausal_conv1d(x, w, dilation=d).shape == (1, 100, 3)


def test_module_shapes():
    key = jax.random.PRNGKey(0)
    for mod in [CausalConv1d(6, 12, 3, 2), NonCausalConv1d(6, 12, 3, 2)]:
        p = mod.init(key)
        assert p["w"].shape == (3, 6, 12)
        y = mod.apply(p, jnp.ones((2, 50, 6)))
        assert y.shape == (2, 50, 12)


def test_matmul_conv_impl_matches_xla_conv(monkeypatch):
    """WAVENET_CONV_IMPL=matmul (K shifted einsums — the round-4 MXU
    lowering, RESULTS.md) must equal lax.conv_general_dilated for every
    padding/dilation combination the models use."""
    import numpy as np
    import jax.numpy as jnp

    from wavenet_speech_tpu.ops.conv import _conv1d

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 29, 10)), jnp.float32)
    cases = [(2, 8, 8, 0),   # causal gate conv
             (3, 4, 6, 6),   # featurizer both-sides pad
             (1, 1, 0, 0),   # 1x1
             (2, 1, 1, 0),   # entry conv
             (3, 2, 3, 3)]   # noncausal autopad k=3
    for (k, d, pl, pr) in cases:
        w = jnp.asarray(rng.standard_normal((k, 10, 5)), jnp.float32)
        ref = _conv1d(x, w, dilation=d, pad_left=pl, pad_right=pr)
        monkeypatch.setenv("WAVENET_CONV_IMPL", "matmul")
        got = _conv1d(x, w, dilation=d, pad_left=pl, pad_right=pr)
        monkeypatch.delenv("WAVENET_CONV_IMPL")
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_matmul_conv_impl_block_grads_match(monkeypatch):
    """Gradient parity of the matmul lowering through a full gated block."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from wavenet_speech_tpu.models.blocks import ResidualBlock

    blk = ResidualBlock(6, 6, 2, 4, causal=True)
    params = blk.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 24, 6)),
                    jnp.float32)

    def loss(p, x):
        r, s = blk.apply(p, x)
        return jnp.sum(r) + 2.0 * jnp.sum(s)

    ref = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setenv("WAVENET_CONV_IMPL", "matmul")
    got = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.delenv("WAVENET_CONV_IMPL")
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_conv_impl_resolution(monkeypatch):
    """conv_impl(): env always wins; unset, matmul is the TPU default only
    for k <= 4 (the measured round-4 champion regime) and lax.conv
    elsewhere (CPU tests therefore keep the XLA lowering)."""
    import jax

    from wavenet_speech_tpu.ops.conv import conv_impl

    monkeypatch.setenv("WAVENET_CONV_IMPL", "conv")
    assert conv_impl(2) == "conv"
    monkeypatch.setenv("WAVENET_CONV_IMPL", "matmul")
    assert conv_impl(9) == "matmul"
    # a typo'd override must fail loudly, not fall through to lax.conv
    # (advisor r4 finding #2)
    monkeypatch.setenv("WAVENET_CONV_IMPL", "matmull")
    with pytest.raises(ValueError, match="WAVENET_CONV_IMPL"):
        conv_impl(2)
    monkeypatch.delenv("WAVENET_CONV_IMPL")
    if jax.default_backend() == "tpu":  # pragma: no cover (CPU suite)
        assert conv_impl(2) == "matmul"
        assert conv_impl(9) == "conv"
    else:
        assert conv_impl(2) == "conv"
