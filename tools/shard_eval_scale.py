"""Shard the ACTUAL flagship eval config (2048-feat featurizer, 100-block
512-wide stack — reference raw_ctcnet.py:13 constructor as instantiated in
the 0.6-eval notebook cell 8) over a virtual 8-device TP x SP (x DP) mesh
and prove it: loss + every gradient leaf equal to the single-device step,
plus per-device vs unsharded memory numbers (VERDICT r3 #5 — the first
direct evidence for SURVEY §2.7's "when the stack exceeds one chip's HBM"
motivation).

Run: python tools/shard_eval_scale.py [--l 1024] [--batch 2] [--out f.json]
(forces CPU + 8 virtual devices; safe alongside TPU jobs.)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def tree_bytes(tree) -> int:
    import jax

    return sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(tree))


def max_shard_bytes(tree) -> int:
    """Largest per-device footprint of a sharded pytree's param shards."""
    import collections

    import jax

    per_dev = collections.defaultdict(int)
    for leaf in jax.tree_util.tree_leaves(tree):
        for s in leaf.addressable_shards:
            per_dev[s.device.id] += s.data.size * s.data.dtype.itemsize
    return max(per_dev.values())


def mem_stats(compiled):
    try:
        m = compiled.memory_analysis()
        if m is None:
            return None
        return {"output_bytes": int(m.output_size_in_bytes),
                "temp_bytes": int(m.temp_size_in_bytes),
                "argument_bytes": int(m.argument_size_in_bytes),
                "peak_like_bytes": int(m.temp_size_in_bytes
                                       + m.output_size_in_bytes)}
    except Exception as e:
        return {"unavailable": repr(e)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--skip-ref", action="store_true",
                    help="skip the unsharded reference (just compile the "
                         "sharded step and report memory)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from examples.gaussian_eval import build_model
    from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq
    from wavenet_speech_tpu.parallel import (make_mesh, seq_sharded_apply,
                                             shard_batch, shard_params)

    t0 = time.time()
    # THE eval config: nfeats=2048, nhid=512, 100 blocks (50 k=2 + 50 k=3)
    net = build_model(1.0, remat=False, nhid=512)
    assert net.num_features == 2048 and len(net.layers) == 100
    params = net.init(jax.random.PRNGKey(0))
    pbytes = tree_bytes(params)
    print(f"[{time.time()-t0:.0f}s] params built: {pbytes/1e9:.3f} GB "
          f"({sum(l.size for l in jax.tree_util.tree_leaves(params))/1e6:.1f}M params)",
          flush=True)

    B, L = args.batch, args.l
    mesh = make_mesh(data=2, model=2, seq=2)
    rng = np.random.default_rng(0)
    batch = {
        "signal": rng.standard_normal((B, L, 1)).astype(np.float32),
        "labels": rng.integers(1, 5, size=(B, 96)).astype(np.int32),
        "label_lengths": np.full((B,), 96, np.int32),
    }

    def loss_fn(p, bt, sharded: bool):
        if sharded:
            logits = seq_sharded_apply(net.apply, mesh, p, bt["signal"],
                                       data_sharded=True)
        else:
            logits = net.apply(p, bt["signal"])
        T = logits.shape[1]
        per_seq = ctc_loss_per_seq(logits,
                                   jnp.full((logits.shape[0],), T,
                                            jnp.int32),
                                   bt["labels"], bt["label_lengths"])
        return jnp.sum(per_seq) / T

    sp = shard_params(mesh, params, model_parallel=True)
    shard_pb = max_shard_bytes(sp)
    dev_batch = shard_batch(mesh, batch)
    print(f"[{time.time()-t0:.0f}s] sharded: max per-device param bytes "
          f"{shard_pb/1e9:.3f} GB (vs {pbytes/1e9:.3f} unsharded)",
          flush=True)

    vg_sharded = jax.jit(jax.value_and_grad(
        lambda p, bt: loss_fn(p, bt, True)))
    lowered_s = vg_sharded.lower(sp, dev_batch)
    compiled_s = lowered_s.compile()
    mem_s = mem_stats(compiled_s)
    print(f"[{time.time()-t0:.0f}s] sharded compile done: {mem_s}",
          flush=True)
    l_sp, g_sp = compiled_s(sp, dev_batch)
    l_sp = float(l_sp)
    print(f"[{time.time()-t0:.0f}s] sharded step: loss {l_sp:.6f}",
          flush=True)

    result = {
        "config": {"nfeats": 2048, "blocks": 100, "nhid": 512,
                   "B": B, "L": L, "mesh": "data=2 x model=2 x seq=2"},
        "param_bytes_unsharded": pbytes,
        "param_bytes_max_per_device": shard_pb,
        "param_shard_factor": round(pbytes / shard_pb, 2),
        "sharded_loss": l_sp,
        "mem_sharded_per_device": mem_s,
    }

    if not args.skip_ref:
        vg_ref = jax.jit(jax.value_and_grad(
            lambda p, bt: loss_fn(p, bt, False)))
        compiled_r = vg_ref.lower(params, batch).compile()
        mem_r = mem_stats(compiled_r)
        print(f"[{time.time()-t0:.0f}s] unsharded compile done: {mem_r}",
              flush=True)
        l_ref, g_ref = compiled_r(params, batch)
        l_ref = float(l_ref)
        print(f"[{time.time()-t0:.0f}s] unsharded step: loss {l_ref:.6f}",
              flush=True)
        np.testing.assert_allclose(l_sp, l_ref, rtol=1e-5)
        worst = 0.0
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_ref),
                jax.tree_util.tree_leaves_with_path(g_sp)):
            a, b = np.asarray(a), np.asarray(b)
            # relative error over NON-TINY elements only (near-zero
            # entries make max-relative-error meaningless)
            big = np.abs(a) > 1e-3
            if big.any():
                rel = float(np.max(np.abs(b[big] - a[big]) / np.abs(a[big])))
                worst = max(worst, rel)
            # atol 1e-4 vs grads O(10): f32 reduction-order noise through
            # a 100-block stack reaches ~1e-5 absolute on near-zero
            # elements (observed 1 element in 1M at abs diff 1.5e-5)
            np.testing.assert_allclose(
                b, a, rtol=1e-4, atol=1e-4,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")
        result.update(unsharded_loss=l_ref, mem_unsharded=mem_r,
                      grad_equality="every leaf rtol<=1e-4 atol<=1e-4",
                      worst_grad_rel_err=worst)
        print(f"[{time.time()-t0:.0f}s] loss/grad equality PROVED at the "
              f"eval scale (worst grad rel err {worst:.2e})", flush=True)

    result["wall_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
