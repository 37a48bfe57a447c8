"""Fused CTC forward-backward as Pallas TPU kernels.

Why: the XLA lax.scan CTC (ops/ctc.py) runs the alpha recursion as T
sequential fused VPU kernels on a tiny (B, 2S+1) lattice; each step costs
~35 us of fixed per-kernel latency regardless of unrolling (measured in
benchmarks/roofline.py — 19.9 ms forward / 31 ms backward at the quality-run
shape, making warp-ctc's replacement the dominant cost of the whole train
step). Inside one Pallas kernel the recursion runs as a register/VMEM
fori_loop with no kernel-launch boundaries.

Design (SURVEY §7 step 9: "fused CTC alpha kernel if XLA scan is the
bottleneck"):

  forward   — grid over time chunks (TPU grid steps run sequentially, so a
              VMEM scratch carries alpha across chunks); each grid step
              DMAs a (CT, B, J) block of extended-label log-probs, runs CT
              lattice updates in-register, writes the alphas block (saved
              for backward), and on the last step reduces the terminal
              states to per-sequence log-likelihoods.
  backward  — reverse-ordered grid (index_map nc-1-i) running the beta
              recursion; the VMEM scratch carries lp_ext[t+1] + beta[t+1]
              across chunks and the gradient is the posterior occupancy
              exp(alpha + beta - ll) * cotangent, written blockwise.

The custom_vjp boundary is the recursion over the already-gathered
(T, B, 2S+1) extended-label log-probs: the label gather, log_softmax and
their transposes stay in XLA where they are single parallel ops.

Semantics and the -1e30 neg-infinity convention match ops/ctc.py exactly;
equality is tested against the XLA path (and through it against torch and
the two reference known-answer values) in tests/test_pallas_ctc.py.
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas import can fail on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

NEG = -1e30


def _float0(x):
    return np.zeros(x.shape, jax.dtypes.float0)


def _iota_j(B, J):
    return jax.lax.broadcasted_iota(jnp.int32, (B, J), 1)


def _shift_right(x, n, fill):
    """x[:, j] <- x[:, j-n] with `fill` in the first n lanes."""
    B, J = x.shape
    rolled = jnp.roll(x, n, axis=1)
    return jnp.where(_iota_j(B, J) >= n, rolled, fill)


def _shift_left(x, n, fill):
    """x[:, j] <- x[:, j+n] with `fill` in the last n lanes."""
    B, J = x.shape
    rolled = jnp.roll(x, -n, axis=1)
    return jnp.where(_iota_j(B, J) < J - n, rolled, fill)


def _terminal_mask(B, J, lab2d):
    """(B, J) additive mask: 0 at the two terminal lattice states (final
    blank 2L and final label 2L-1), NEG elsewhere."""
    iota = _iota_j(B, J)
    ok = (iota == 2 * lab2d) | ((iota == 2 * lab2d - 1) & (lab2d > 0))
    return jnp.where(ok, 0.0, NEG)


def _fwd_kernel(lp_ref, skip_ref, len_ref, lab_ref, ain_ref, toff_ref,
                alphas_ref, ll_ref, aout_ref, alpha_s, *, ct: int, nc: int,
                tl_true: int):
    """Alpha recursion over one time SEGMENT.

    Segment generality (for the sequence-sharded CTC,
    parallel/ctc_sharded.py): the lattice state enters via ain_ref (the
    previous shard's final alpha; NEG for a whole-sequence call), frame
    indices are offset by toff_ref (global index = toff + local index) so
    init/length masking key on global time, rows past tl_true (the
    segment's unpadded length) are inert, and the final alpha leaves via
    aout_ref for the next shard. The whole-sequence path (ctc_scan) is the
    toff=0 / ain=NEG special case.
    """
    i = pl.program_id(0)
    B, J = alpha_s.shape
    skipadd = skip_ref[...]          # (B, J) additive skip mask (0 / NEG)
    lengths = len_ref[...]           # (B, 1) int32
    lab2d = lab_ref[...]             # (B, 1) int32
    toff = toff_ref[0, 0]            # scalar int32 global-frame offset
    iota = _iota_j(B, J)

    def frame(r, alpha):
        lt = i * ct + r              # segment-local frame index
        t = toff + lt                # global frame index
        lp_t = lp_ref[r]             # (B, J)
        # standard lattice update
        a1 = _shift_right(alpha, 1, NEG)
        a2 = _shift_right(alpha, 2, NEG)
        acc = jnp.logaddexp(alpha, a1)
        acc = jnp.logaddexp(acc, a2 + skipadd)
        upd = acc + lp_t
        # t == 0 initialization: alpha0 = lp at states 0 and (if labels) 1
        init = jnp.where(
            (iota == 0) | ((iota == 1) & (lab2d > 0)), lp_t, NEG)
        new = jnp.where(t == 0, init, upd)
        # frames past a sequence's length (or the segment's padded tail)
        # carry alpha through unchanged
        alpha = jnp.where((lt < tl_true) & (t < lengths), new, alpha)
        alphas_ref[r] = alpha
        return alpha

    @pl.when(i == 0)
    def _():
        alpha_s[...] = ain_ref[...]

    alpha = jax.lax.fori_loop(0, ct, frame, alpha_s[...])
    alpha_s[...] = alpha

    @pl.when(i == nc - 1)
    def _():
        aout_ref[...] = alpha
        term = _terminal_mask(B, J, lab2d)
        m = jnp.max(alpha + term, axis=1, keepdims=True)
        ll = m + jnp.log(jnp.sum(jnp.exp(alpha + term - m), axis=1,
                                 keepdims=True))
        ll_ref[...] = ll


def _bwd_kernel(lp_ref, alphas_ref, skip_ref, len_ref, lab_ref, ll_ref,
                cot_ref, bin_ref, toff_ref, grad_ref, bout_ref, lpb_s, *,
                ct: int, nc: int, tl_true: int):
    """Beta recursion + posterior-occupancy gradient over one SEGMENT,
    mirroring _fwd_kernel's segment generality: the carried lp+beta state
    enters via bin_ref (the NEXT shard's first-frame state; NEG for a
    whole-sequence call) and leaves via bout_ref for the previous shard;
    frame indices are offset by toff_ref; padded-tail rows write zero grad
    and pass the carry through."""
    i = pl.program_id(0)             # reversed grid: block nc-1-i
    B, J = lpb_s.shape
    skipadd = skip_ref[...]
    lengths = len_ref[...]
    lab2d = lab_ref[...]
    ll = ll_ref[...]                 # (B, 1)
    cot = cot_ref[...]               # (B, 1)
    toff = toff_ref[0, 0]
    term = _terminal_mask(B, J, lab2d)
    # transition j -> j+2 allowed iff skip into state j+2 is allowed
    sk2 = _shift_left(skipadd, 2, NEG)

    @pl.when(i == 0)
    def _():
        lpb_s[...] = bin_ref[...]

    def frame(r_, lpb):
        r = ct - 1 - r_
        lt = (nc - 1 - i) * ct + r
        t = toff + lt
        lp_t = lp_ref[r]
        alpha_t = alphas_ref[r]
        b1 = _shift_left(lpb, 1, NEG)
        b2 = _shift_left(lpb, 2, NEG)
        rec = jnp.logaddexp(jnp.logaddexp(lpb, b1), b2 + sk2)
        is_term = t == lengths - 1
        live = t < lengths
        beta_t = jnp.where(is_term, term, jnp.where(live, rec, NEG))
        valid = lt < tl_true
        grad_ref[r] = jnp.where(valid,
                                jnp.exp(alpha_t + beta_t - ll) * cot, 0.0)
        return jnp.where(valid, lp_t + beta_t, lpb)

    lpb = jax.lax.fori_loop(0, ct, frame, lpb_s[...])
    lpb_s[...] = lpb

    @pl.when(i == nc - 1)
    def _():
        bout_ref[...] = lpb


def _pad_T(x, ct):
    T = x.shape[0]
    Tp = ((T + ct - 1) // ct) * ct
    if Tp == T:
        return x, T
    return jnp.pad(x, ((0, Tp - T),) + ((0, 0),) * (x.ndim - 1)), T


def _pick_ct(T: int, B: int, J: int) -> int:
    """Time-chunk size: bound the (CT, B, J) f32 block to ~2 MB of VMEM."""
    budget = 2 * 1024 * 1024 // max(4 * B * J, 1)
    return max(8, min(128, budget, T))


@jax.custom_vjp
def ctc_scan(lp_ext_t, skipadd, logit_lengths, label_lengths):
    """Log-likelihoods (B,) from extended-label log-probs (T, B, 2S+1).

    skipadd: (B, 2S+1) additive skip-transition mask (0 allowed / NEG not).
    Differentiable in lp_ext_t (exact posterior-occupancy gradient).
    """
    ll, _ = _ctc_fwd_impl(lp_ext_t, skipadd, logit_lengths, label_lengths)
    return ll


def _interpret_default() -> bool:
    # interpret mode runs the kernels as pure JAX on any backend (CPU tests)
    return jax.default_backend() != "tpu"


def _ctc_fwd_impl(lp_ext_t, skipadd, logit_lengths, label_lengths,
                  interpret: bool | None = None, alpha_in=None, t_offset=None,
                  tl_true: int | None = None):
    interpret = _interpret_default() if interpret is None else interpret
    T, B, J = lp_ext_t.shape
    ct = _pick_ct(T, B, J)
    lp_pad, _ = _pad_T(lp_ext_t.astype(jnp.float32), ct)
    Tp = lp_pad.shape[0]
    nc = Tp // ct
    len2d = logit_lengths.astype(jnp.int32).reshape(B, 1)
    lab2d = label_lengths.astype(jnp.int32).reshape(B, 1)
    if alpha_in is None:
        alpha_in = jnp.full((B, J), NEG, jnp.float32)
    toff2d = (jnp.zeros((1, 1), jnp.int32) if t_offset is None
              else jnp.asarray(t_offset, jnp.int32).reshape(1, 1))
    tl_true = Tp if tl_true is None else tl_true

    alphas, ll, alpha_out = pl.pallas_call(
        partial(_fwd_kernel, ct=ct, nc=nc, tl_true=tl_true),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((ct, B, J), lambda i: (i, 0, 0)),   # lp_ext chunk
            pl.BlockSpec((B, J), lambda i: (0, 0)),          # skipadd
            pl.BlockSpec((B, 1), lambda i: (0, 0)),          # lengths
            pl.BlockSpec((B, 1), lambda i: (0, 0)),          # label lengths
            pl.BlockSpec((B, J), lambda i: (0, 0)),          # alpha_in
            pl.BlockSpec((1, 1), lambda i: (0, 0)),          # t offset
        ],
        out_specs=(
            pl.BlockSpec((ct, B, J), lambda i: (i, 0, 0)),   # alphas
            pl.BlockSpec((B, 1), lambda i: (0, 0)),          # ll
            pl.BlockSpec((B, J), lambda i: (0, 0)),          # alpha_out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, B, J), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, J), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, J), jnp.float32)],
        interpret=interpret,
    )(lp_pad, skipadd.astype(jnp.float32), len2d, lab2d,
      alpha_in.astype(jnp.float32), toff2d)
    return ll[:, 0], (lp_pad, alphas, alpha_out)


def _ctc_bwd_impl(lp_pad, alphas, skipadd, logit_lengths, label_lengths,
                  ll, cot, T: int, interpret: bool | None = None,
                  lpb_in=None, t_offset=None, tl_true: int | None = None):
    interpret = _interpret_default() if interpret is None else interpret
    Tp, B, J = lp_pad.shape
    ct = _pick_ct(Tp, B, J)
    nc = Tp // ct
    len2d = logit_lengths.astype(jnp.int32).reshape(B, 1)
    lab2d = label_lengths.astype(jnp.int32).reshape(B, 1)
    if lpb_in is None:
        lpb_in = jnp.full((B, J), NEG, jnp.float32)
    toff2d = (jnp.zeros((1, 1), jnp.int32) if t_offset is None
              else jnp.asarray(t_offset, jnp.int32).reshape(1, 1))
    tl_true = Tp if tl_true is None else tl_true

    rev = lambda i: (nc - 1 - i, 0, 0)
    grad, lpb_out = pl.pallas_call(
        partial(_bwd_kernel, ct=ct, nc=nc, tl_true=tl_true),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((ct, B, J), rev),                   # lp_ext chunk
            pl.BlockSpec((ct, B, J), rev),                   # alphas chunk
            pl.BlockSpec((B, J), lambda i: (0, 0)),          # skipadd
            pl.BlockSpec((B, 1), lambda i: (0, 0)),          # lengths
            pl.BlockSpec((B, 1), lambda i: (0, 0)),          # label lengths
            pl.BlockSpec((B, 1), lambda i: (0, 0)),          # ll
            pl.BlockSpec((B, 1), lambda i: (0, 0)),          # cotangent
            pl.BlockSpec((B, J), lambda i: (0, 0)),          # lpb_in carry
            pl.BlockSpec((1, 1), lambda i: (0, 0)),          # t offset
        ],
        out_specs=(
            pl.BlockSpec((ct, B, J), rev),
            pl.BlockSpec((B, J), lambda i: (0, 0)),          # lpb_out carry
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, B, J), jnp.float32),
            jax.ShapeDtypeStruct((B, J), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((B, J), jnp.float32)],
        interpret=interpret,
    )(lp_pad, alphas, skipadd.astype(jnp.float32), len2d, lab2d,
      ll.reshape(B, 1), cot.reshape(B, 1).astype(jnp.float32),
      lpb_in.astype(jnp.float32), toff2d)
    return grad[:T], lpb_out


def _ctc_scan_fwd(lp_ext_t, skipadd, logit_lengths, label_lengths):
    ll, (lp_pad, alphas, _) = _ctc_fwd_impl(lp_ext_t, skipadd, logit_lengths,
                                            label_lengths)
    return ll, (lp_pad, alphas, skipadd, logit_lengths, label_lengths, ll,
                lp_ext_t.shape[0])


def _ctc_scan_bwd(res, cot):
    lp_pad, alphas, skipadd, logit_lengths, label_lengths, ll, T = res
    grad, _ = _ctc_bwd_impl(lp_pad, alphas, skipadd, logit_lengths,
                            label_lengths, ll, cot, T)
    return (grad, jnp.zeros_like(skipadd), _float0(logit_lengths),
            _float0(label_lengths))


ctc_scan.defvjp(_ctc_scan_fwd, _ctc_scan_bwd)


def pallas_ctc_available() -> bool:
    return _PALLAS_OK and jax.default_backend() == "tpu"


def ctc_fwd_segment(lp_ext_t, skipadd, logit_lengths, label_lengths,
                    alpha_in, t_offset, interpret: bool | None = None):
    """Advance the alpha lattice over ONE time segment (the per-shard piece
    of the sequence-sharded CTC, parallel/ctc_sharded.py).

    Args: lp_ext_t (Tl, B, J) local extended-label log-probs; alpha_in
    (B, J) the previous shard's final alpha (NEG matrix on shard 0);
    t_offset scalar int32 global index of local frame 0.
    Returns (ll, alphas_pad, alpha_out): ll (B,) terminal log-likelihoods
    AS IF this were the last segment (only meaningful on the last shard),
    alphas_pad (Tp, B, J) saved for the backward segment, alpha_out (B, J)
    the carry for the next shard.
    """
    ll, (_, alphas, alpha_out) = _ctc_fwd_impl(
        lp_ext_t, skipadd, logit_lengths, label_lengths,
        interpret=interpret, alpha_in=alpha_in, t_offset=t_offset,
        tl_true=lp_ext_t.shape[0])
    return ll, alphas, alpha_out


def ctc_bwd_segment(lp_ext_t, alphas_pad, skipadd, logit_lengths,
                    label_lengths, ll, cot, lpb_in, t_offset,
                    interpret: bool | None = None):
    """Beta recursion + posterior-occupancy gradient over ONE segment.

    lpb_in (B, J): the next shard's first-frame lp+beta state (NEG matrix
    on the last shard); ll (B,) the GLOBAL terminal log-likelihoods.
    Returns (grad, lpb_out): grad (Tl, B, J) = d(ll)/d(lp_ext_t) * cot,
    lpb_out (B, J) the carry for the previous shard.
    """
    T = lp_ext_t.shape[0]
    Tp = alphas_pad.shape[0]
    lp_pad = jnp.pad(lp_ext_t.astype(jnp.float32), ((0, Tp - T), (0, 0), (0, 0)))
    return _ctc_bwd_impl(lp_pad, alphas_pad, skipadd, logit_lengths,
                         label_lengths, ll, cot, T, interpret=interpret,
                         lpb_in=lpb_in, t_offset=t_offset, tl_true=T)


def ctc_forward_logprob_pallas(log_probs, logit_lengths, labels,
                               label_lengths, blank: int = 0):
    """Drop-in for ops.ctc.ctc_forward_logprob running the recursion as the
    fused Pallas kernels (same gather/extend preamble in XLA)."""
    from wavenet_speech_tpu.ops.ctc import _extend_labels, _gather_ext

    log_probs = log_probs.astype(jnp.float32)
    B, T, C = log_probs.shape
    S = labels.shape[1]
    ext, allow_skip = _extend_labels(labels, blank)
    lp_ext = _gather_ext(log_probs, ext)  # gather-free one-hot einsum
    lp_ext_t = jnp.transpose(lp_ext, (1, 0, 2))
    skipadd = jnp.where(allow_skip, 0.0, NEG)
    return ctc_scan(lp_ext_t, skipadd, logit_lengths, label_lengths)
