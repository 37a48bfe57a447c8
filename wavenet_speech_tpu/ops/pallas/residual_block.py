"""Fused gated residual block as a Pallas TPU kernel.

The WaveNet hot op (reference modules/block.py:54-82; SURVEY §3 "HOT LOOP")
is four chained ops — dilated gate conv (fused tanh|sigmoid pair), gated
activation, fused residual|skip 1x1, dense residual projection.  The
unfused XLA path materializes three (B, L, 2C) intermediates in HBM per
block; this kernel keeps everything for a sequence tile in VMEM:

  per grid cell (b, tile):
    DMA x[b, t0 : t0 + TL + halo] (of the left-halo-padded input) from HBM
    into a VMEM scratch — overlapping windows are not expressible with
    blocked index maps, so the window is fetched explicitly — then
    gate  = sum_k  x_shift(k) @ gate_w[k]      (K MXU matmuls, f32 accum)
    act   = tanh(gate[:, :C]) * sigmoid(gate[:, C:])
    o     = act @ out_w + out_b                 (residual|skip 1x1 pair)
    resid = o[:, :C] + x_center @ res_w + res_b
    skip  = o[:, C:]

Forward-only kernel: the op is wrapped in jax.custom_vjp whose backward
runs the XLA composite's VJP (identical math), so training works with the
Pallas forward and an XLA-fused backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import can fail on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def pallas_available() -> bool:
    return _PALLAS_OK and jax.default_backend() == "tpu"


def _xla_reference(x, gate_w, gate_b, out_w, out_b, res_w, res_b, *,
                   dilation: int):
    """The unfused XLA composite (same math as ResidualBlock.apply)."""
    from wavenet_speech_tpu.ops.conv import causal_conv1d
    from wavenet_speech_tpu.ops.activations import gated_activation

    C = res_w.shape[1]
    g = causal_conv1d(x, gate_w, gate_b, dilation=dilation)
    act = gated_activation(g[..., :C], g[..., C:])
    o = jnp.einsum("blc,cd->bld", act, out_w) + out_b
    resid = o[..., :C] + x @ res_w + res_b
    return resid, o[..., C:]


def _kernel(x_hbm, gate_w_ref, gate_b_ref, out_w_ref, out_b_ref,
            res_w_ref, res_b_ref, resid_ref, skip_ref, x_vmem, sem, *,
            k: int, dilation: int, tile_l: int, c_out: int, halo_eff: int):
    """Grid: (B, num_tiles). x_hbm: full halo-padded input in HBM/ANY;
    x_vmem scratch: (tile_l + halo_eff, C_in) — halo_eff is the true halo
    rounded up to the sublane tile (DMA'd VMEM row counts must be
    tile-aligned)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    halo = (k - 1) * dilation
    t0 = t * tile_l

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t0, tile_l + halo_eff), :], x_vmem, sem)
    dma.start()
    dma.wait()

    x = x_vmem[:]                     # (tile_l + halo_eff, C_in)
    x_center = x[halo_eff:, :]

    acc = jnp.zeros((tile_l, 2 * c_out), jnp.float32)
    for tap in range(k):
        # tap k-1 aligns with the current frame at offset halo_eff
        off = halo_eff - halo + tap * dilation
        window = x[off: off + tile_l, :]  # static slice (off is Python int)
        acc += jnp.dot(window, gate_w_ref[tap],
                       preferred_element_type=jnp.float32)
    g = acc + gate_b_ref[:]

    act = jnp.tanh(g[:, :c_out]) * jax.nn.sigmoid(g[:, c_out:])
    o = jnp.dot(act.astype(x.dtype), out_w_ref[:],
                preferred_element_type=jnp.float32) + out_b_ref[:]
    resid = o[:, :c_out] + jnp.dot(x_center, res_w_ref[:],
                                   preferred_element_type=jnp.float32) \
        + res_b_ref[:]
    resid_ref[0] = resid.astype(resid_ref.dtype)
    skip_ref[0] = o[:, c_out:].astype(skip_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_gated_block(x, gate_w, gate_b, out_w, out_b, res_w, res_b,
                      dilation: int = 1, tile_l: int = 512):
    """Fused causal gated residual block.

    Args:
      x: (B, L, C_in); gate_w: (K, C_in, 2C); gate_b: (2C,); out_w: (C, 2C);
      out_b: (2C,); res_w: (C_in, C); res_b: (C,).
    Returns (residual_out (B, L, C), skip_out (B, L, C)).
    """
    return _forward(x, gate_w, gate_b, out_w, out_b, res_w, res_b,
                    dilation, tile_l)


def _forward(x, gate_w, gate_b, out_w, out_b, res_w, res_b, dilation,
             tile_l):
    from wavenet_speech_tpu.parallel.halo import current_seq_axis

    # Under a sequence-sharded shard_map the causal left context must come
    # from the neighbor shard (halo exchange in causal_conv1d); this kernel
    # zero-pads, which is only correct for unsharded sequences — fall back
    # to the XLA composite (whose convs do the ppermute halo exchange).
    if not pallas_available() or current_seq_axis() is not None:
        return _xla_reference(x, gate_w, gate_b, out_w, out_b, res_w, res_b,
                              dilation=dilation)
    B, L, C_in = x.shape
    k = gate_w.shape[0]
    C = res_w.shape[1]
    halo = (k - 1) * dilation
    # DMA'd VMEM buffers need sublane-tile-aligned row counts
    sublane = {jnp.bfloat16.dtype: 16, jnp.int8.dtype: 32}.get(x.dtype, 8)
    halo_eff = max(sublane, int(np.ceil(halo / sublane)) * sublane)

    tl = min(tile_l, max(sublane, int(np.ceil(L / sublane)) * sublane))
    L_pad = int(np.ceil(L / tl)) * tl
    # left halo zeros give causal padding; right pad completes the last tile
    xp = jnp.pad(x, ((0, 0), (halo_eff, L_pad - L), (0, 0)))
    num_tiles = L_pad // tl

    resid, skip = pl.pallas_call(
        functools.partial(_kernel, k=k, dilation=dilation, tile_l=tl,
                          c_out=C, halo_eff=halo_eff),
        out_shape=(
            jax.ShapeDtypeStruct((B, L_pad, C), x.dtype),
            jax.ShapeDtypeStruct((B, L_pad, C), x.dtype),
        ),
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x (halo-padded), in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # out_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # out_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # res_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # res_b
        ],
        out_specs=(
            pl.BlockSpec((1, tl, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tl, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tl + halo_eff, C_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, gate_w, gate_b, out_w, out_b, res_w, res_b)
    return resid[:, :L], skip[:, :L]


def _fwd(x, gate_w, gate_b, out_w, out_b, res_w, res_b, dilation, tile_l):
    out = _forward(x, gate_w, gate_b, out_w, out_b, res_w, res_b, dilation,
                   tile_l)
    return out, (x, gate_w, gate_b, out_w, out_b, res_w, res_b)


def _bwd(dilation, tile_l, residuals, grads):
    x, gate_w, gate_b, out_w, out_b, res_w, res_b = residuals
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, dilation=dilation),
        x, gate_w, gate_b, out_w, out_b, res_w, res_b)
    return vjp(grads)


fused_gated_block.defvjp(_fwd, _bwd)
