"""Residual block tests (shape contracts + parity of the gated block against
a torch re-statement of the reference math, modules/block.py:54-82)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wavenet_speech_tpu.models import (
    ResidualBlock,
    ResidualMUBlock,
    ResidualReLUBlock,
    MultiplicativeUnit,
)
from wavenet_speech_tpu.ops.conv import autopad


def _torch_residual_block(x_ncl, p, k, d, causal):
    """Reference ResidualBlock.forward in torch, fed with OUR params.

    Our fused layouts: gate w (K, Cin, 2C) -> torch (2C, Cin, K);
    out1x1 w (1, C, 2C); residual_proj (Cin, C)."""
    C = p["residual_proj"]["w"].shape[1]
    gw = torch.from_numpy(np.asarray(p["gate"]["w"]).transpose(2, 1, 0))
    gb = torch.from_numpy(np.asarray(p["gate"]["b"]))
    pad = (k - 1) * d if causal else autopad(k, d)
    g = F.conv1d(x_ncl, gw, gb, padding=pad, dilation=d)[:, :, : x_ncl.shape[2]]
    act = torch.tanh(g[:, :C]) * torch.sigmoid(g[:, C:])
    ow = torch.from_numpy(np.asarray(p["out1x1"]["w"]).transpose(2, 1, 0))
    ob = torch.from_numpy(np.asarray(p["out1x1"]["b"]))
    o = F.conv1d(act, ow, ob)
    rw = torch.from_numpy(np.asarray(p["residual_proj"]["w"]))
    rb = torch.from_numpy(np.asarray(p["residual_proj"]["b"]))
    resid = torch.einsum("bcl,cd->bdl", x_ncl, rw) + rb[None, :, None]
    return o[:, :C] + resid, o[:, C:]


def test_residual_block_parity_with_reference_math():
    for causal in [True, False]:
        B, L, Cin, C, k, d = 2, 64, 6, 10, 3, 4
        mod = ResidualBlock(Cin, C, k, d, causal=causal)
        params = mod.init(jax.random.PRNGKey(0))
        x = np.random.default_rng(1).standard_normal((B, L, Cin)).astype(np.float32)
        res, skip = mod.apply(params, jnp.asarray(x))
        t_res, t_skip = _torch_residual_block(
            torch.from_numpy(x.transpose(0, 2, 1)), params, k, d, causal)
        np.testing.assert_allclose(np.asarray(res), t_res.numpy().transpose(0, 2, 1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(skip), t_skip.numpy().transpose(0, 2, 1),
                                   rtol=1e-4, atol=1e-5)


def test_block_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 40, 16))
    blk = ResidualBlock(16, 24, 2, 8)
    res, skip = blk.apply(blk.init(key), x)
    assert res.shape == (2, 40, 24) and skip.shape == (2, 40, 24)

    for mod in [ResidualMUBlock(16, 3, 2), ResidualReLUBlock(16, 3, 2)]:
        y = mod.apply(mod.init(key), x)
        assert y.shape == x.shape

    mu = MultiplicativeUnit(16, 3, 2)
    y = mu.apply(mu.init(key), x)
    assert y.shape == x.shape


def test_mu_block_causality():
    """ByteNet decoder blocks must be causal end-to-end."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 32, 8))
    for mod in [ResidualMUBlock(8, 3, 2), ResidualReLUBlock(8, 3, 2),
                MultiplicativeUnit(8, 3, 2)]:
        p = mod.init(jax.random.PRNGKey(3))
        y0 = mod.apply(p, x)
        y1 = mod.apply(p, x.at[:, 20, :].set(5.0))
        np.testing.assert_allclose(np.asarray(y0[:, :20]), np.asarray(y1[:, :20]),
                                   rtol=1e-5, atol=1e-6)
