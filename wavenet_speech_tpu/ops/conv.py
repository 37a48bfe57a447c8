"""Length-preserving dilated 1-D convolutions (causal and auto-padded),
built on ``lax.conv_general_dilated`` so XLA tiles them onto the MXU.

Semantics match the reference exactly (cited into /root/reference/):

  * CausalConv1d (modules/conv_ops.py:8-44): torch pads both sides by
    P=(k-1)*d then slices out[:, :, 0:L].  Equivalent here to asymmetric
    padding (left=P, right=0) — same values, no wasted compute.
  * NonCausalConv1d (modules/conv_ops.py:47-79) with autopad
    (modules/conv_ops.py:104-116): torch pads both sides by
    p = ceil((k-1)*d / 2) and slices [0:L].  Equivalent to asymmetric
    padding (left=p, right=(k-1)*d - p): for odd total padding the slice
    drops the final element, i.e. one less pad on the right.
  * receptive_field = k + (d-1)(k-1) (modules/conv_ops.py:37).

Layout: NLC (batch, length, channels); kernels are (K, C_in, C_out)
("WIO").  Channel dims map to TPU lanes; K*C_in contractions run on the
MXU.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from wavenet_speech_tpu.nn.core import Module, Params
from wavenet_speech_tpu.nn import initializers as init

_DN = ("NWC", "WIO", "NWC")


def receptive_field(kernel_width: int, dilation: int) -> int:
    """k + (d-1)(k-1), as in reference modules/conv_ops.py:37."""
    return kernel_width + (dilation - 1) * (kernel_width - 1)


def autopad(kernel_width: int, dilation: int) -> int:
    """Left-side padding for the length-preserving non-causal conv
    (reference modules/conv_ops.py:104-116)."""
    total = (kernel_width - 1) * dilation
    if total % 2 == 1:
        return (total - 1) // 2 + 1
    return total // 2


_MATMUL_MAX_K = 4  # matmul lowering is the measured win for tiny-K convs


def conv_impl(k: int) -> str:
    """Resolved conv lowering for a kernel width: "matmul" (K shifted
    einsums) or "conv" (lax.conv_general_dilated).

    WAVENET_CONV_IMPL={matmul,conv} forces one lowering everywhere. Unset,
    the TPU backend defaults to the matmul lowering for k <= 4 — the
    round-4 end-to-end champion (852k -> 895k samples/s from this lever
    alone on the k=2 bench workload; 79.9% -> 89.5% of compute peak on the
    isolated block fwd+bwd, RESULTS.md round 4) — and keeps lax.conv for
    wide kernels (the k=9 featurizer already runs at 84% of peak through
    XLA's own lowering, and K einsum shifts re-read the input K times).
    Non-TPU backends default to lax.conv (tests pin the two lowerings
    equal, tests/test_conv_ops.py).

    Resolution happens once per TRACE (like WAVENET_CTC_IMPL): a cached
    jit does not retrace if the env var or default backend changes later
    in-process, and the backend keyed on is jax.default_backend(), not
    the device a particular jit targets."""
    import os

    impl = os.environ.get("WAVENET_CONV_IMPL")
    if impl:
        if impl not in ("matmul", "conv"):
            raise ValueError(
                f"WAVENET_CONV_IMPL={impl!r}: expected 'matmul' or 'conv'")
        return impl
    if k <= _MATMUL_MAX_K and jax.default_backend() == "tpu":
        return "matmul"
    return "conv"


def _conv1d(x, w, *, dilation: int, pad_left: int, pad_right: int,
            precision=None):
    """Core dilated conv over NLC input with explicit asymmetric padding.

    Two value-equal lowerings, resolved at trace time by conv_impl():
    lax.conv_general_dilated, or K shifted einsums (stride 1; tested in
    test_conv_ops.py) — the round-4 hardware roofline showed XLA's conv
    lowering leaves MXU throughput on the table for tiny-K dilated
    shapes, so "matmul" is the TPU default for k <= 4."""
    if conv_impl(int(w.shape[0])) == "matmul":
        k = w.shape[0]
        L_out = x.shape[1] + pad_left + pad_right - (k - 1) * dilation
        xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
        out = None
        for j in range(k):
            term = jnp.einsum(
                "blc,cd->bld",
                lax.slice_in_dim(xp, j * dilation, j * dilation + L_out,
                                 axis=1),
                w[j], precision=precision)
            out = term if out is None else out + term
        return out
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad_left, pad_right)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        precision=precision,
    )


def causal_conv1d(x, w, b=None, *, dilation: int = 1, precision=None):
    """Length-preserving causal dilated conv. x: (B, L, C_in),
    w: (K, C_in, C_out), b: (C_out,).

    Under a sequence-sharded shard_map (parallel/halo.seq_axis), the left
    padding is replaced by a (k-1)*d halo pulled from the neighbor shard."""
    from wavenet_speech_tpu.parallel.halo import current_seq_axis, halo_pad

    k = w.shape[0]
    pad = (k - 1) * dilation
    axis = current_seq_axis()
    if axis is not None and pad > 0:
        x = halo_pad(x, pad, 0, axis)
        pad = 0
    out = _conv1d(x, w, dilation=dilation, pad_left=pad, pad_right=0,
                  precision=precision)
    if b is not None:
        out = out + b
    return out


def noncausal_conv1d(x, w, b=None, *, dilation: int = 1, precision=None):
    """Length-preserving auto-padded (non-causal) dilated conv; halo
    exchange on both sides under a sequence-sharded shard_map."""
    from wavenet_speech_tpu.parallel.halo import current_seq_axis, halo_pad

    k = w.shape[0]
    total = (k - 1) * dilation
    left = autopad(k, dilation)
    right = total - left
    axis = current_seq_axis()
    if axis is not None and total > 0:
        x = halo_pad(x, left, right, axis)
        left = right = 0
    out = _conv1d(x, w, dilation=dilation, pad_left=left, pad_right=right,
                  precision=precision)
    if b is not None:
        out = out + b
    return out


@dataclasses.dataclass(frozen=True)
class CausalConv1d(Module):
    """Module wrapper for causal dilated conv (reference
    modules/conv_ops.py:8-44)."""

    in_channels: int
    out_channels: int
    kernel_width: int
    dilation: int = 1
    w_init: object = staticmethod(init.kaiming_uniform)
    b_init: object = staticmethod(init.zeros)

    @property
    def receptive_field(self) -> int:
        return receptive_field(self.kernel_width, self.dilation)

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        return {
            "w": self.w_init(kw, (self.kernel_width, self.in_channels, self.out_channels)),
            "b": self.b_init(kb, (self.out_channels,)),
        }

    def apply(self, params: Params, x):
        return causal_conv1d(x, params["w"], params["b"], dilation=self.dilation)


@dataclasses.dataclass(frozen=True)
class NonCausalConv1d(Module):
    """Module wrapper for the auto-padded conv (reference
    modules/conv_ops.py:47-79)."""

    in_channels: int
    out_channels: int
    kernel_width: int
    dilation: int = 1
    w_init: object = staticmethod(init.kaiming_uniform)
    b_init: object = staticmethod(init.zeros)

    @property
    def receptive_field(self) -> int:
        return receptive_field(self.kernel_width, self.dilation)

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        return {
            "w": self.w_init(kw, (self.kernel_width, self.in_channels, self.out_channels)),
            "b": self.b_init(kb, (self.out_channels,)),
        }

    def apply(self, params: Params, x):
        return noncausal_conv1d(x, params["w"], params["b"], dilation=self.dilation)


@dataclasses.dataclass(frozen=True)
class Conv1x1(Module):
    """1x1 conv == per-timestep dense; lowered to a single (B*L, C_in) x
    (C_in, C_out) matmul on the MXU."""

    in_channels: int
    out_channels: int
    w_init: object = staticmethod(init.kaiming_uniform)
    b_init: object = staticmethod(init.zeros)

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        return {
            "w": self.w_init(kw, (self.in_channels, self.out_channels)),
            "b": self.b_init(kb, (self.out_channels,)),
        }

    def apply(self, params: Params, x):
        return jnp.einsum("blc,cd->bld", x, params["w"]) + params["b"]


@dataclasses.dataclass(frozen=True)
class Dense(Module):
    """Plain dense layer on the trailing axis (reference uses nn.Linear for
    the residual projection, modules/block.py:48)."""

    in_features: int
    out_features: int
    w_init: object = staticmethod(init.kaiming_uniform)
    b_init: object = staticmethod(init.zeros)

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        return {
            "w": self.w_init(kw, (self.in_features, self.out_features)),
            "b": self.b_init(kb, (self.out_features,)),
        }

    def apply(self, params: Params, x):
        return x @ params["w"] + params["b"]
