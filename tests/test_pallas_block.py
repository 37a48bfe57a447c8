"""Fused gated block: CPU tests exercise the XLA fallback + custom-vjp
gradient path (the Pallas lowering itself is TPU-only; its correctness vs
the XLA composite is covered by the on-hardware drive in
.claude/skills/verify and by construction shares the same VJP)."""
import numpy as np
import jax
import jax.numpy as jnp

from wavenet_speech_tpu.models.blocks import ResidualBlock
from wavenet_speech_tpu.ops.pallas.residual_block import (
    fused_gated_block,
    _xla_reference,
    pallas_available,
)


def _args(rng, B=2, L=50, C=8, k=2):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    return (mk(B, L, C), mk(k, C, 2 * C), mk(2 * C), mk(C, 2 * C), mk(2 * C),
            mk(C, C), mk(C))


def test_fallback_matches_xla_composite(rng):
    assert not pallas_available()  # CPU test env
    args = _args(rng)
    r1, s1 = fused_gated_block(*args, 4, 512)
    r2, s2 = _xla_reference(*args, dilation=4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_custom_vjp_matches_composite_grads(rng):
    args = _args(rng)

    def f_fused(*a):
        r, s = fused_gated_block(*a, 2, 512)
        return jnp.sum(r ** 2) + jnp.sum(s ** 2)

    def f_ref(*a):
        r, s = _xla_reference(*a, dilation=2)
        return jnp.sum(r ** 2) + jnp.sum(s ** 2)

    g1 = jax.grad(f_fused, argnums=tuple(range(7)))(*args)
    g2 = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_residual_block_pallas_flag_cpu_fallback(rng):
    """use_pallas=True must be a no-op (fallback) off-TPU and bit-match the
    plain block."""
    blk = ResidualBlock(8, 8, 2, 4, use_pallas=True)
    ref = ResidualBlock(8, 8, 2, 4, use_pallas=False)
    params = blk.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 40, 8)).astype(np.float32))
    r1, s1 = blk.apply(params, x)
    r2, s2 = ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_mixed_precision_step(rng):
    """bf16 compute_dtype path produces finite metrics and f32 params stay
    f32."""
    from wavenet_speech_tpu.models import RawCTCNet
    from wavenet_speech_tpu.training import (TrainState, build_optimizer,
                                             make_ctc_train_step)

    F = 16
    net = RawCTCNet(F, 3, 5, tuple((F, F, 3, d) for d in (1, 2)), F,
                    softmax=False)
    params = net.init(jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    state = TrainState.create(params, tx)
    step = make_ctc_train_step(net, tx, donate=False,
                               compute_dtype=jnp.bfloat16)
    batch = {
        "signal": jnp.asarray(rng.standard_normal((2, 32, 1)).astype(np.float32)),
        "labels": jnp.ones((2, 4), jnp.int32),
        "label_lengths": jnp.full((2,), 4, jnp.int32),
        "signal_lengths": jnp.full((2,), 32, jnp.int32),
    }
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["ctc_loss"]))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))


def test_fused_backward_kernel_matches_xla_vjp():
    """The hand-written fused BACKWARD kernel (remat-in-VMEM, VERDICT r2
    #1b) vs the XLA composite's VJP, in interpret mode (pure-JAX kernel
    semantics; the TPU lowering is hardware-verified via bench.py
    --fused-bwd and the verify skill)."""
    from wavenet_speech_tpu.ops.pallas.residual_block import _pallas_bwd

    rng = np.random.default_rng(7)
    for (B, L, C, k, d, tl) in ((2, 100, 8, 2, 4, 32), (1, 64, 16, 3, 8, 64),
                                (2, 50, 8, 2, 16, 16)):
        mk = lambda *s: jnp.asarray(
            rng.standard_normal(s).astype(np.float32) * 0.3)
        x, gw, gb = mk(B, L, C), mk(k, C, 2 * C), mk(2 * C)
        ow, ob, rw, rb = mk(C, 2 * C), mk(2 * C), mk(C, C), mk(C)
        dr, dsk = mk(B, L, C), mk(B, L, C)
        _, vjp = jax.vjp(lambda *a: _xla_reference(*a, dilation=d),
                         x, gw, gb, ow, ob, rw, rb)
        ref = vjp((dr, dsk))
        got = _pallas_bwd(x, gw, ow, rw, dr, dsk, dilation=d, tile_l=tl,
                          gate_b=gb, interpret=True)
        for name, a, b in zip(("dx", "dWg", "dbg", "dWo", "dbo", "dWr",
                               "dbr"), ref, got):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
                err_msg=f"{name} (B={B} L={L} C={C} k={k} d={d} tl={tl})")
