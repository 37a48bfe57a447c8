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


def fused_bwd_enabled() -> bool:
    """Opt-in switch for the fused Pallas BACKWARD kernel (the remaining
    HBM-traffic frontier: the XLA remat backward round-trips (B, L, 2C)
    intermediates through HBM; the kernel recomputes them in VMEM).
    Round 2's one attempt to compile the forward kernel under jax.grad
    wedged the remote Pallas compiler for ~2h (CLAUDE.md) — this path never
    differentiates through pallas_call (the backward is its own
    hand-written kernel), but stays opt-in until hardware-proven."""
    import os

    return os.environ.get("WAVENET_FUSED_BWD", "0") == "1"


def _bwd(dilation, tile_l, residuals, grads):
    x, gate_w, gate_b, out_w, out_b, res_w, res_b = residuals
    halo = (gate_w.shape[0] - 1) * dilation
    if (fused_bwd_enabled() and pallas_available() and halo <= tile_l):
        return _pallas_bwd(x, gate_w, out_w, res_w, grads[0], grads[1],
                           dilation=dilation, tile_l=tile_l, gate_b=gate_b)
    _, vjp = jax.vjp(
        lambda *a: _xla_reference(*a, dilation=dilation),
        x, gate_w, gate_b, out_w, out_b, res_w, res_b)
    return vjp(grads)


fused_gated_block.defvjp(_fwd, _bwd)


def _bwd_kernel(x_hbm, dr_hbm, ds_hbm, gate_w_ref, gate_b_ref, out_w_ref,
                res_w_ref,
                dx_ref, dwg_ref, dbg_ref, dwo_ref, dbo_ref, dwr_ref, dbr_ref,
                x_vmem, dr_vmem, ds_vmem, sem_x, sem_r, sem_s,
                awg, abg, awo, abo, awr, abr, *,
                k: int, dilation: int, tile_l: int, c_out: int,
                halo_eff: int, ext_eff: int, nb: int, nt: int):
    """Fused backward of the gated residual block for one (batch, tile)
    grid cell: recompute the forward intermediates for the tile IN VMEM
    (remat-in-VMEM — nothing but x, dresid, dskip is read from HBM and
    nothing but dx is written per cell), produce the input gradient, and
    accumulate all weight/bias gradients in f32 VMEM scratch across the
    sequential TPU grid; the last cell writes them out.

    dx needs dg over [t0, t0 + tile + halo) (the conv transpose pulls from
    future frames), so the recompute window extends `ext_eff` frames right;
    the weight-gradient accumulation slices the tile's own frames only.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    halo = (k - 1) * dilation
    t0 = t * tile_l
    Te = tile_l + ext_eff  # extended frame count (recompute window)

    # x rows [t0 - halo_eff, t0 + Te) of the halo-padded input; dresid/
    # dskip rows [t0, t0 + Te) of the right-padded cotangents
    cp_x = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(t0, tile_l + halo_eff + ext_eff), :], x_vmem, sem_x)
    cp_r = pltpu.make_async_copy(
        dr_hbm.at[b, pl.ds(t0, Te), :], dr_vmem, sem_r)
    cp_s = pltpu.make_async_copy(
        ds_hbm.at[b, pl.ds(t0, Te), :], ds_vmem, sem_s)
    cp_x.start(); cp_r.start(); cp_s.start()
    cp_x.wait(); cp_r.wait(); cp_s.wait()

    @pl.when((b == 0) & (t == 0))
    def _():
        awg[...] = jnp.zeros_like(awg)
        abg[...] = jnp.zeros_like(abg)
        awo[...] = jnp.zeros_like(awo)
        abo[...] = jnp.zeros_like(abo)
        awr[...] = jnp.zeros_like(awr)
        abr[...] = jnp.zeros_like(abr)

    x = x_vmem[:]                      # (tile + halo_eff + ext_eff, C_in)
    dr = dr_vmem[:].astype(jnp.float32)   # (Te, C)
    ds = ds_vmem[:].astype(jnp.float32)   # (Te, C)

    # --- recompute gate/activation over the extended window ---
    g = jnp.zeros((Te, 2 * c_out), jnp.float32)
    for tap in range(k):
        off = halo_eff - halo + tap * dilation
        g += jnp.dot(x[off: off + Te, :], gate_w_ref[tap],
                     preferred_element_type=jnp.float32)
    g = g + gate_b_ref[:].astype(jnp.float32)
    th = jnp.tanh(g[:, :c_out])
    sg = jax.nn.sigmoid(g[:, c_out:])
    act = th * sg                       # (Te, C)

    do = jnp.concatenate([dr, ds], axis=1)          # (Te, 2C)
    da = jnp.dot(do, out_w_ref[:].astype(jnp.float32).T,
                 preferred_element_type=jnp.float32)  # (Te, C)
    dg = jnp.concatenate(
        [da * sg * (1.0 - th * th), da * th * sg * (1.0 - sg)], axis=1)

    # --- input gradient for the tile ---
    # dx[u] = sum_tap dg[u + halo - tap*d] @ Wg[tap]^T  +  dresid[u] @ Wr^T
    dx = jnp.dot(dr[:tile_l], res_w_ref[:].astype(jnp.float32).T,
                 preferred_element_type=jnp.float32)
    for tap in range(k):
        off = halo - tap * dilation     # in [0, halo]
        dx += jnp.dot(dg[off: off + tile_l],
                      gate_w_ref[tap].astype(jnp.float32).T,
                      preferred_element_type=jnp.float32)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    # --- weight/bias gradient accumulation (tile's own frames only) ---
    dg_t = dg[:tile_l]
    do_t = do[:tile_l]
    x_c = x[halo_eff: halo_eff + tile_l, :].astype(jnp.float32)
    for tap in range(k):
        off = halo_eff - halo + tap * dilation
        awg[tap] += jnp.dot(x[off: off + tile_l, :].astype(jnp.float32).T,
                            dg_t, preferred_element_type=jnp.float32)
    abg[...] += jnp.sum(dg_t, axis=0, keepdims=True)
    awo[...] += jnp.dot(act[:tile_l].T, do_t,
                        preferred_element_type=jnp.float32)
    abo[...] += jnp.sum(do_t, axis=0, keepdims=True)
    awr[...] += jnp.dot(x_c.T, dr[:tile_l],
                        preferred_element_type=jnp.float32)
    abr[...] += jnp.sum(dr[:tile_l], axis=0, keepdims=True)

    @pl.when((b == nb - 1) & (t == nt - 1))
    def _():
        dwg_ref[...] = awg[...]
        dbg_ref[...] = abg[...]
        dwo_ref[...] = awo[...]
        dbo_ref[...] = abo[...]
        dwr_ref[...] = awr[...]
        dbr_ref[...] = abr[...]


def _pallas_bwd(x, gate_w, out_w, res_w, dresid, dskip, *, dilation: int,
                tile_l: int, gate_b=None, interpret: bool = False):
    """Run the fused backward kernel; returns gradients in
    fused_gated_block's argument order (dx, dWg, dbg, dWo, dbo, dWr, dbr)."""
    B, L, C_in = x.shape
    k = gate_w.shape[0]
    C = res_w.shape[1]
    halo = (k - 1) * dilation
    sublane = {jnp.bfloat16.dtype: 16, jnp.int8.dtype: 32}.get(x.dtype, 8)
    halo_eff = max(sublane, int(np.ceil(halo / sublane)) * sublane)
    ext_eff = halo_eff  # right recompute window, tile-aligned

    tl = min(tile_l, max(sublane, int(np.ceil(L / sublane)) * sublane))
    L_pad = int(np.ceil(L / tl)) * tl
    num_tiles = L_pad // tl
    # x: left halo zeros (causal padding) + right (tile completion + ext)
    xp = jnp.pad(x, ((0, 0), (halo_eff, L_pad - L + ext_eff), (0, 0)))
    # cotangents: zero right-pad (padded frames contribute nothing)
    drp = jnp.pad(dresid, ((0, 0), (0, L_pad - L + ext_eff), (0, 0)))
    dsp = jnp.pad(dskip, ((0, 0), (0, L_pad - L + ext_eff), (0, 0)))
    if gate_b is None:
        gate_b = jnp.zeros((2 * C,), x.dtype)

    f32 = jnp.float32
    dx, dwg, dbg, dwo, dbo, dwr, dbr = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, dilation=dilation, tile_l=tl,
                          c_out=C, halo_eff=halo_eff, ext_eff=ext_eff,
                          nb=B, nt=num_tiles),
        out_shape=(
            jax.ShapeDtypeStruct((B, L_pad, C_in), x.dtype),   # dx
            jax.ShapeDtypeStruct((k, C_in, 2 * C), f32),       # dWg
            jax.ShapeDtypeStruct((1, 2 * C), f32),             # dbg
            jax.ShapeDtypeStruct((C, 2 * C), f32),             # dWo
            jax.ShapeDtypeStruct((1, 2 * C), f32),             # dbo
            jax.ShapeDtypeStruct((C_in, C), f32),              # dWr
            jax.ShapeDtypeStruct((1, C), f32),                 # dbr
        ),
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x (padded), HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # dresid (padded), HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # dskip (padded), HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gate_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # out_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # res_w
        ],
        out_specs=(
            pl.BlockSpec((1, tl, C_in), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C_in, 2 * C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_in, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tl + halo_eff + ext_eff, C_in), x.dtype),  # x win
            pltpu.VMEM((tl + ext_eff, C), dresid.dtype),           # dr win
            pltpu.VMEM((tl + ext_eff, C), dskip.dtype),            # ds win
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((k, C_in, 2 * C), f32),                     # awg
            pltpu.VMEM((1, 2 * C), f32),                           # abg
            pltpu.VMEM((C, 2 * C), f32),                           # awo
            pltpu.VMEM((1, 2 * C), f32),                           # abo
            pltpu.VMEM((C_in, C), f32),                            # awr
            pltpu.VMEM((1, C), f32),                               # abr
        ],
        interpret=interpret,
    )(xp, drp, dsp, gate_w, gate_b, out_w, res_w)
    return (dx[:, :L], dwg.astype(gate_w.dtype), dbg[0].astype(gate_w.dtype),
            dwo.astype(out_w.dtype), dbo[0].astype(out_w.dtype),
            dwr.astype(res_w.dtype), dbr[0].astype(res_w.dtype))
