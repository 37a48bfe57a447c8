"""Section-level roofline measurement on real TPU hardware.

Times jitted subsections of the two flagship workloads and reports achieved
FLOP/s and HBM bandwidth vs chip peaks, to locate each section on the
roofline (VERDICT round-1: "you can't claim speed-of-light without printing
the roofline number").

Sections:
  feat     — RawCTCNet featurizer (wide conv 1->F, k=fk + 1x1 F->F + leaky
             pair; reference modules/raw_ctcnet.py:57-61 — the named FLOPs
             hot spot)
  block    — one causal gated residual block (the WaveNet hot op,
             reference modules/block.py:54-82), XLA vs Pallas forward
  ctc      — the CTC loss alpha recursion (lax.scan over frames)
  step     — the full bench.py joint train step (see bench.py for MFU)

A tunneled dispatch+readback costs ~20+ ms per CALL (measured in this
image), so every section is a single jitted program scanning `iters`
internal repetitions (data dependence on the carry stops XLA from eliding
work), timed at two different iteration counts with the per-call constant
cancelled by the slope (_timed_slope).

Usage: python benchmarks/roofline.py [--section all|feat|block|ctc]
"""
from __future__ import annotations

import argparse
import json
import time


def _timed_call(fn, *args, reps: int = 3):
    """Compile, warm up, then best-of-reps wall time for one dispatch."""
    import jax
    import numpy as np

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])  # warmup + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def _timed_slope(make_fn, args, iters: int):
    """Per-iteration device time via a two-point slope: the tunneled
    dispatch+readback costs ~20+ ms per CALL (measured in this image), so a
    single-call measurement at small `iters` is dominated by call overhead.
    Timing the same program at `iters` and `5*iters` and taking the slope
    cancels every per-call constant."""
    t1 = _timed_call(make_fn(iters), *args)
    t5 = _timed_call(make_fn(5 * iters), *args)
    return max((t5 - t1) / (4 * iters), 1e-9)


def _report(name: str, seconds: float, flops: float, hbm_bytes: float,
            bf16: bool = True, extra=None):
    from wavenet_speech_tpu.utils.profiling import TPU_PEAK_TFLOPS

    peak = TPU_PEAK_TFLOPS["bf16" if bf16 else "f32"] * 1e12
    hbm_peak = 819e9  # v5e HBM bandwidth
    rec = {
        "section": name,
        "ms": round(seconds * 1e3, 3),
        "tflops_per_s": round(flops / seconds / 1e12, 2),
        "pct_compute_roofline": round(100 * flops / seconds / peak, 1),
        "hbm_gb_per_s": round(hbm_bytes / seconds / 1e9, 1),
        "pct_hbm_roofline": round(100 * hbm_bytes / seconds / hbm_peak, 1),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def run_feat(iters: int = 20, B: int = 16, L: int = 567, F: int = 2048,
             fk: int = 3, bf16: bool = True):
    """The RawCTCNet featurizer at the reference eval config shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.ops.activations import leaky_relu
    from wavenet_speech_tpu.ops.conv import _conv1d

    dt = jnp.bfloat16 if bf16 else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, 1)), dt)
    w1 = jnp.asarray(rng.standard_normal((fk, 1, F)) * 0.1, dt)
    b1 = jnp.zeros((F,), dt)
    w2 = jnp.asarray(rng.standard_normal((1, F, F)) * 0.02, dt)
    b2 = jnp.zeros((F,), dt)

    def one(x):
        h = _conv1d(x, w1, dilation=1, pad_left=fk - 1, pad_right=fk - 1) + b1
        h = leaky_relu(h)
        h = _conv1d(h, w2, dilation=1, pad_left=0, pad_right=0) + b2
        return leaky_relu(h)

    def make(n):
        @jax.jit
        def many(x):
            def body(c, _):
                y = one(x + c)      # data dependence on the carry
                return jnp.mean(y).astype(x.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=n)
            return c
        return many

    sec = _timed_slope(make, (x,), iters)
    Lo = L + fk - 1
    flops = 2 * B * (L * fk * 1 * F + Lo * F * F)
    esz = 2 if bf16 else 4
    hbm = B * esz * (L * 1 + Lo * F * 2) + esz * (fk * F + F * F)
    return _report(f"feat F={F} fk={fk} B={B} L={L}", sec, flops, hbm, bf16)


def run_block(iters: int = 20, B: int = 8, L: int = 4505, C: int = 256,
              dilation: int = 64, bf16: bool = True, pallas: bool = False):
    """One causal gated residual block forward (bench.py workload shape)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.models.blocks import ResidualBlock

    blk = ResidualBlock(C, C, 2, dilation, causal=True, use_pallas=pallas)
    params = blk.init(jax.random.PRNGKey(0))
    dt = jnp.bfloat16 if bf16 else jnp.float32
    params = jax.tree_util.tree_map(lambda a: a.astype(dt), params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, C)), dt)

    def make(n):
        @jax.jit
        def many(x):
            def body(c, _):
                r, s = blk.apply(params, x + c)
                return jnp.mean(r + s).astype(x.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=n)
            return c
        return many

    sec = _timed_slope(make, (x,), iters)
    flops = 2 * B * L * (2 * C * 2 * C + C * 2 * C + C * C)
    esz = 2 if bf16 else 4
    # x read (gate conv + residual proj can share), resid+skip written,
    # act/gate intermediates HBM round-trip only in the unfused path
    hbm = B * L * C * esz * (1 + 2) + esz * (2 * C * 2 * C + C * 2 * C + C * C)
    return _report(
        f"block C={C} d={dilation} {'pallas' if pallas else 'xla'}",
        sec, flops, hbm, bf16)


def run_block_bwd(iters: int = 20, B: int = 8, L: int = 4505, C: int = 256,
                  dilation: int = 64, bf16: bool = True,
                  pallas: bool = False, fused_bwd: bool = False):
    """One causal gated residual block FORWARD+BACKWARD (jax.grad wrt x and
    params) — locates the backward, the 2/3 of the train step the forward
    sections can't see. Variants: XLA composite VJP (default), Pallas
    forward + XLA VJP, Pallas forward + fused Pallas backward kernel
    (WAVENET_FUSED_BWD; ops/pallas/residual_block._pallas_bwd)."""
    import os

    prev_fused = os.environ.pop("WAVENET_FUSED_BWD", None)
    if fused_bwd:
        os.environ["WAVENET_FUSED_BWD"] = "1"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.models.blocks import ResidualBlock

    blk = ResidualBlock(C, C, 2, dilation, causal=True, use_pallas=pallas)
    params = blk.init(jax.random.PRNGKey(0))
    dt = jnp.bfloat16 if bf16 else jnp.float32
    params = jax.tree_util.tree_map(lambda a: a.astype(dt), params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, C)), dt)

    def loss(params, x):
        r, s = blk.apply(params, x)
        return (jnp.sum(r.astype(jnp.float32)) +
                jnp.sum(s.astype(jnp.float32)))

    def make(n):
        @jax.jit
        def many(params, x):
            def body(c, _):
                _, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                    params, x + c)
                # consume EVERY grad leaf or XLA dead-code-eliminates the
                # whole param-gradient half of the backward
                acc = jnp.mean(gx).astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(gp):
                    acc = acc + jnp.mean(leaf).astype(jnp.float32)
                return acc.astype(x.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=n)
            return c
        return many

    try:
        sec = _timed_slope(make, (params, x), iters)
    finally:
        # don't leak the flag into later sections of the same process
        if prev_fused is None:
            os.environ.pop("WAVENET_FUSED_BWD", None)
        else:
            os.environ["WAVENET_FUSED_BWD"] = prev_fused
    flops = 3 * 2 * B * L * (2 * C * 2 * C + C * 2 * C + C * C)  # fwd+bwd
    esz = 2 if bf16 else 4
    # fwd traffic + grad-x/grad-w passes re-reading x and intermediates
    hbm = B * L * C * esz * (1 + 2) * 3 + 3 * esz * (
        2 * C * 2 * C + C * 2 * C + C * C)
    tag = ("pallas+fusedbwd" if fused_bwd else
           ("pallas+xlavjp" if pallas else "xla"))
    return _report(f"block fwd+bwd C={C} d={dilation} {tag}",
                   sec, flops, hbm, bf16)


def run_block_bwd_matmul(iters: int = 20, B: int = 8, L: int = 4505,
                         C: int = 256, dilation: int = 64,
                         bf16: bool = True):
    """The SAME gated residual block fwd+bwd as run_block_bwd, but with
    the k=2 dilated conv expressed as two shifted EINSUMS instead of
    lax.conv_general_dilated — tests whether XLA's conv lowering (the
    round-4 trace shows backward convs at 90-120 TF/s vs 197 peak) leaves
    matmul throughput on the table for this degenerate-K shape. Math is
    identical (asserted against ResidualBlock.apply at setup)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.models.blocks import ResidualBlock
    from wavenet_speech_tpu.ops.activations import gated_activation

    blk = ResidualBlock(C, C, 2, dilation, causal=True)
    params0 = blk.init(jax.random.PRNGKey(0))
    dt = jnp.bfloat16 if bf16 else jnp.float32
    params = jax.tree_util.tree_map(lambda a: a.astype(dt), params0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, C)), dt)
    d = dilation

    def apply_matmul(p, x):
        gw, gb = p["gate"]["w"], p["gate"]["b"]        # (2, C, 2C), (2C,)
        xp = jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :x.shape[1]]
        g = (jnp.einsum("blc,cd->bld", xp, gw[0])
             + jnp.einsum("blc,cd->bld", x, gw[1]) + gb)
        act = gated_activation(g[..., :C], g[..., C:])
        ow, ob = p["out1x1"]["w"][0], p["out1x1"]["b"]  # (C, 2C)
        o = jnp.einsum("blc,cd->bld", act, ow) + ob
        rp = p["residual_proj"]
        return o[..., :C] + (x @ rp["w"] + rp["b"]), o[..., C:]

    # value identity vs the production block (f32, small slice)
    r_ref, s_ref = blk.apply(params0, np.asarray(x[:1, :256], np.float32))
    r_mm, s_mm = apply_matmul(params0, jnp.asarray(
        np.asarray(x[:1, :256], np.float32)))
    np.testing.assert_allclose(np.asarray(r_mm), np.asarray(r_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_mm), np.asarray(s_ref),
                               rtol=2e-5, atol=2e-5)

    def loss(params, x):
        r, s = apply_matmul(params, x)
        return (jnp.sum(r.astype(jnp.float32))
                + jnp.sum(s.astype(jnp.float32)))

    def make(n):
        @jax.jit
        def many(params, x):
            def body(c, _):
                _, (gp, gx) = jax.value_and_grad(loss, argnums=(0, 1))(
                    params, x + c)
                acc = jnp.mean(gx).astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(gp):
                    acc = acc + jnp.mean(leaf).astype(jnp.float32)
                return acc.astype(x.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=n)
            return c
        return many

    sec = _timed_slope(make, (params, x), iters)
    flops = 3 * 2 * B * L * (2 * C * 2 * C + C * 2 * C + C * C)
    esz = 2 if bf16 else 4
    hbm = B * L * C * esz * (1 + 2) * 3 + 3 * esz * (
        2 * C * 2 * C + C * 2 * C + C * C)
    return _report(f"block fwd+bwd C={C} d={dilation} matmul-form",
                   sec, flops, hbm, bf16)


def run_ctc(iters: int = 20, B: int = 16, T: int = 567, S: int = 89,
            C: int = 5):
    """CTC loss (f32 alpha recursion) at the quality-run shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, C, size=(B, S)), jnp.int32)
    ll = jnp.full((B,), S, jnp.int32)
    tl = jnp.full((B,), T, jnp.int32)

    def make(n):
        @jax.jit
        def many(logits):
            def body(c, _):
                v = jnp.sum(ctc_loss_per_seq(logits + c, tl, labels, ll))
                return (v * 0).astype(logits.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), logits.dtype), None,
                                length=n)
            return c
        return many

    sec = _timed_slope(make, (logits,), iters)
    # alpha lattice: T x (2S+1) per sequence, ~6 flops/cell
    flops = 6.0 * B * T * (2 * S + 1)
    hbm = 4.0 * B * T * C
    return _report(f"ctc B={B} T={T} S={S}", sec, flops, hbm, bf16=False,
                   extra={"note": "latency-bound scan; roofline n/a"})


def run_matmul(iters: int = 20, M: int = 8192, K: int = 2048, N: int = 2048,
               bf16: bool = True):
    """Pure MXU calibration: the achievable matmul peak through this stack
    (jit + tunnel + scan harness) — the denominator every other section
    should be judged against."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dt = jnp.bfloat16 if bf16 else jnp.float32
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)) * 0.1, dt)
    b = jnp.asarray(rng.standard_normal((K, N)) * 0.1, dt)

    def make(n):
        @jax.jit
        def many(a, b):
            def body(c, _):
                y = (a + c) @ b
                return jnp.mean(y).astype(a.dtype), None
            c, _ = jax.lax.scan(body, jnp.zeros((), a.dtype), None, length=n)
            return c
        return many

    sec = _timed_slope(make, (a, b), iters)
    flops = 2.0 * M * K * N
    esz = 2 if bf16 else 4
    hbm = esz * (M * K + K * N + M * N)
    return _report(f"matmul {M}x{K}x{N} {'bf16' if bf16 else 'f32'}",
                   sec, flops, hbm, bf16)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["all", "feat", "block", "block_bwd",
                             "block_bwd_matmul", "ctc", "matmul"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args(argv)
    bf16 = not args.f32

    if args.section in ("all", "matmul"):
        run_matmul(args.iters, bf16=bf16)
        run_matmul(args.iters, M=36040, K=256, N=512, bf16=bf16)  # block shape
    if args.section in ("all", "feat"):
        run_feat(args.iters, bf16=bf16)
    if args.section in ("all", "block"):
        run_block(args.iters, bf16=bf16, pallas=False)
        run_block(args.iters, bf16=bf16, pallas=True)
        run_block(args.iters, dilation=1, bf16=bf16, pallas=False)
        run_block(args.iters, dilation=1, bf16=bf16, pallas=True)
    if args.section in ("all", "block_bwd"):
        run_block_bwd(args.iters, bf16=bf16, pallas=False)
        run_block_bwd(args.iters, bf16=bf16, pallas=True, fused_bwd=False)
        run_block_bwd(args.iters, bf16=bf16, pallas=True, fused_bwd=True)
    if args.section in ("all", "block_bwd_matmul"):
        run_block_bwd_matmul(args.iters, bf16=bf16)
    if args.section in ("all", "ctc"):
        run_ctc(args.iters)


if __name__ == "__main__":
    main()
