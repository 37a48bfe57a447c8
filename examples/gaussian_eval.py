"""Reproduce the reference's headline quality experiment: RawCTCNet trained
on the Gaussian r9.4 5-mer generator, evaluated by average per-logit CTC
loss and pairwise-alignment basecall identity.

Reference anchors (RawCTCNet@AvgCTCLoss=0.6 eval notebook): best avg
per-logit CTC 0.5548; basecall identity 49.5%-78.0% over 6 samples; model
nfeats 2048 / 100 blocks, batch 6, upsample 6 random, lengths 80-90,
Adamax lr 2e-4.

Usage:
  python examples/gaussian_eval.py --scale 0.125 --steps 2000   # 256-feat
  python examples/gaussian_eval.py --smoke                      # tiny CPU run

Long TPU runs: pass --ckpt-dir to get periodic full-state checkpoints and
automatic resume; a stall watchdog re-execs the process if the flaky TPU
tunnel hangs (same mitigation as bench.py), so
`tools/run_with_retries.sh <secs> <n> python examples/gaussian_eval.py ...`
makes the whole run self-healing.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

_progress = {"t": time.time(), "armed": False}


def _tick():
    _progress["t"] = time.time()


def _watchdog(stall_seconds: float = None):
    if stall_seconds is None:
        # first jit of the full-scale (2048-feat) model can exceed the old
        # 420s default; configurable so big runs don't re-exec mid-compile
        stall_seconds = float(os.environ.get("GAUSS_STALL_SECS", 420.0))
    while True:
        time.sleep(10)
        if _progress["armed"] and time.time() - _progress["t"] > stall_seconds:
            print("[gaussian_eval] TPU transport stall; re-exec for resume",
                  file=sys.stderr, flush=True)
            os.execv(sys.executable, [sys.executable] + sys.argv)


def build_model(scale: float, remat: bool = True, nhid: int = 512):
    """The reference eval checkpoint's architecture (0.6-eval notebook cell
    8): featurizer width nfeats=2048, residual stack width nhid=512 (the
    stack is NOT featurizer-wide), 10 x [1,2,4,8,16] dilation cycles for
    each kwidth in {2,3} = 100 blocks, out_dim 512. `scale` scales the
    featurizer width; `nhid` is the stack width (512 = reference)."""
    from wavenet_speech_tpu.models import RawCTCNet

    nfeats = max(int(2048 * scale), 16)
    nhid = max(int(nhid * min(scale * 4, 1.0)), 16)
    out_dim = nhid
    reps = max(int(10 * min(scale * 8, 1.0)), 1)
    dils = (1, 2, 4, 8, 16) * reps
    layers = tuple((nhid, nhid, 2, d) for d in dils) \
        + tuple((nhid, nhid, 3, d) for d in dils)
    return RawCTCNet(nfeats, 3, 5, layers, out_dim, positions=False,
                     softmax=False, causal=False, remat=remat)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.125)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=6)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--eval-batches", type=int, default=4)
    ap.add_argument("--beam-width", type=int, default=7)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny fast run (CI/CPU)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--ckpt-dir", default=None,
                    help="checkpoint/resume dir (enables stall watchdog)")
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--async-ckpt", action="store_true",
                    help="overlap checkpoint writes with training "
                         "(training/checkpoint.py async_save; a sync "
                         "full-state save of the eval config costs ~89 s)")
    ap.add_argument("--out", default=None, help="write result JSON here")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate the latest checkpoint")
    ap.add_argument("--no-remat", action="store_true",
                    help="keep activations for backward (faster when the "
                         "model fits HBM without rematerialization)")
    ap.add_argument("--cosine", action="store_true",
                    help="warmup + cosine-decay LR schedule over --steps "
                         "(reference protocol is constant LR)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear warmup steps, then constant LR (keeps the "
                         "run length open-ended, unlike --cosine)")
    ap.add_argument("--nhid", type=int, default=512,
                    help="residual-stack width (reference: 512)")
    ap.add_argument("--max-grad-norm", type=float, default=None,
                    help="global-norm GRADIENT clipping (warning: raw grad "
                         "norms here are O(1e13); small thresholds destroy "
                         "adamax updates — prefer --max-update-norm)")
    ap.add_argument("--max-update-norm", type=float, default=None,
                    help="global-norm clipping of the post-optimizer UPDATE "
                         "(typical update norm ~3; e.g. 30 bounds "
                         "divergence spikes without touching normal steps)")
    args = ap.parse_args(argv)

    # arm the stall watchdog BEFORE the first backend touch: a fresh tunnel
    # connection can hang during jax backend init / checkpoint restore,
    # which is earlier than the training loop's ticks
    if args.ckpt_dir:
        threading.Thread(target=_watchdog, daemon=True).start()
        _tick()
        _progress["armed"] = True

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from wavenet_speech_tpu.data import RawGaussianModelLoader, batch_to_device
    from wavenet_speech_tpu.decoding import ctc_beam_search_jax, labels2strings
    from wavenet_speech_tpu.decoding.alignment import batch_identity
    from wavenet_speech_tpu.training import (TrainState, build_optimizer,
                                             make_ctc_train_step)
    from wavenet_speech_tpu.utils.run_logging import MovingAverageMeter

    if args.smoke:
        args.scale, args.batch_size, args.lr = 1 / 64, 4, 2e-3
        if args.steps == 2000:  # only override the untouched default
            args.steps = 150

    lengths = (80, 90) if not args.smoke else (15, 18)
    upsampling = 6
    loader = RawGaussianModelLoader(
        max_iters=10 ** 9, num_epochs=10 ** 6, epoch_size=1000,
        batch_size=args.batch_size, upsampling=upsampling,
        random_upsample=not args.smoke, lengths=lengths, seed=0,
        pad_to=(lengths[1] - 1 - 8) * (upsampling + (0 if args.smoke else 1)),
        labels_pad_to=lengths[1] - 1)

    model = build_model(args.scale, remat=not (args.smoke or args.no_remat),
                        nhid=args.nhid)
    params = model.init(jax.random.PRNGKey(0))
    lr = args.lr
    if args.cosine:
        import optax

        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_steps=min(500, args.steps // 10),
            decay_steps=args.steps, end_value=args.lr * 0.05)
    elif args.warmup:
        import optax

        lr = optax.linear_schedule(0.0, args.lr, args.warmup)
    tx = build_optimizer("adamax", lr, max_grad_norm=args.max_grad_norm,
                         max_update_norm=args.max_update_norm)
    state = TrainState.create(params, tx)
    # reference pipeline normalizes raw signal through BatchNorm1d(1)
    # (train notebook cell 11) before RawCTCNet; done in f32 pre-cast
    from wavenet_speech_tpu.ops.norm import batch_standardize

    # donate=True recycles the old state into the new one (state is used
    # linearly; forensic dumps and checkpoints read the NEW state, which
    # on a skipped step still holds the pre-step params)
    step = make_ctc_train_step(
        model, tx, donate=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        preprocess=batch_standardize)

    start = 0
    if args.ckpt_dir:
        from wavenet_speech_tpu.training.checkpoint import (
            latest_step, restore_checkpoint, save_checkpoint,
            wait_for_async_saves)

        _tick()
        if latest_step(args.ckpt_dir) is not None:
            state = restore_checkpoint(args.ckpt_dir, state)
            start = int(state.step)
            print(f"resumed from step {start}", flush=True)
        if args.eval_only:
            args.steps = start
        # the loader is deterministic given (seed, iteration); fast-forward
        # so resumed runs see fresh data instead of replaying batch 0
        if args.steps > start:
            for _ in range(start):
                loader.fetch()

    def _dump_forensics(batch, state, i, note, l, gn):
        # capture the exact (batch, params) pair for offline bisection
        # (tools/bisect_nonfinite.py; training/diagnostics.py). On a
        # SKIPPED step post-step params == pre-step params (the guard
        # carries them through), so the dump reproduces the overflow.
        if not args.ckpt_dir:
            return
        try:
            from wavenet_speech_tpu.training.diagnostics import dump_anomaly

            p = dump_anomaly(
                os.path.join(os.path.dirname(args.ckpt_dir.rstrip("/")),
                             "anomalies"),
                batch, state.params, i, note,
                {"ctc_loss": l, "grad_norm": gn})
            if p:
                print(f"[gaussian_eval] {note} at step {i} "
                      f"(loss {l:.3g}, gnorm {gn:.3g}); forensics -> {p}",
                      file=sys.stderr, flush=True)
        except Exception as e:  # forensics must never kill the run
            print(f"[gaussian_eval] forensic dump failed: {e!r}",
                  file=sys.stderr, flush=True)

    meter = MovingAverageMeter(25)
    t0 = time.time()
    skip_streak = 0
    for i in range(start, args.steps):
        _tick()
        batch = loader.fetch()
        state, metrics = step(state, batch_to_device(batch))
        l = float(metrics["ctc_loss"])
        if np.isfinite(l):
            # a finite but huge spike is the PRECURSOR of the anneal-leg
            # divergences (RESULTS.md): dump it too (params here are
            # post-step — noted in meta via the note string)
            if meter.values and l > max(25.0 * meter.value, 100.0):
                _dump_forensics(batch, state, i, "spike",
                                l, float(metrics["grad_norm"]))
            meter.add(l)
            skip_streak = 0
        else:
            # the train step SKIPS non-finite updates (trainer.py), so
            # params stay finite; a long streak means the model itself is
            # producing non-finite losses on every batch — abort for
            # restart from the last checkpoint
            skip_streak += 1
            if skip_streak == 1:
                _dump_forensics(batch, state, i, "nonfinite",
                                l, float(metrics["grad_norm"]))
            if skip_streak in (1, 10, 50) or skip_streak % 100 == 0:
                print(f"[gaussian_eval] non-finite loss at step {i}; "
                      f"update skipped (streak {skip_streak})",
                      file=sys.stderr, flush=True)
            if skip_streak >= 200:
                print("[gaussian_eval] 200 consecutive non-finite losses; "
                      "aborting for restart from the last checkpoint",
                      file=sys.stderr, flush=True)
                sys.exit(3)
        if i % 50 == 0:
            print(f"step {i}: per-logit CTC {meter.value:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if args.ckpt_dir and (i + 1) % args.save_every == 0:
            # never checkpoint a diverged state: a NaN save plus rotation
            # (max_to_keep) destroys the recoverable history (with the
            # skip-guard the meter stays finite and params are protected;
            # this remains as a backstop)
            if not np.isfinite(meter.value) or skip_streak > 0:
                print(f"[gaussian_eval] skipping checkpoint at step {i + 1} "
                      "(non-finite loss in window)", file=sys.stderr,
                      flush=True)
            else:
                save_checkpoint(args.ckpt_dir, state, step=i + 1,
                                max_to_keep=4, async_save=args.async_ckpt)
    if args.ckpt_dir and args.steps > start:
        if args.async_ckpt:
            wait_for_async_saves(args.ckpt_dir)
        save_checkpoint(args.ckpt_dir, state, step=args.steps, max_to_keep=2)
    _tick()

    # --- evaluation: per-logit CTC + basecall identity on fresh data ---
    # same static padded shapes as training: one compile for all eval batches
    eval_loader = RawGaussianModelLoader(
        max_iters=10 ** 9, num_epochs=10 ** 6, epoch_size=1000,
        batch_size=args.batch_size, upsampling=upsampling,
        random_upsample=not args.smoke, lengths=lengths, seed=777,
        pad_to=loader.pad_to, labels_pad_to=loader.labels_pad_to)
    ctc_vals, idents = [], []
    for _ in range(args.eval_batches):
        _tick()
        batch = eval_loader.fetch()
        dev = batch_to_device(batch)
        logits = model.apply(state.params, batch_standardize(dev["signal"]))
        from wavenet_speech_tpu.ops.ctc import ctc_loss_per_seq

        T = logits.shape[1]
        per_seq = ctc_loss_per_seq(
            logits, jnp.full((logits.shape[0],), T, jnp.int32),
            dev["labels"], dev["label_lengths"])
        ctc_vals.append(float(jnp.sum(per_seq)) / T)
        prefixes, plens, _ = ctc_beam_search_jax(
            logits, beam_width=args.beam_width,
            max_label_len=int(batch.label_lengths.max() * 2))
        prefixes, plens = np.asarray(prefixes), np.asarray(plens)
        preds = [prefixes[b, 0, : plens[b, 0]] for b in range(len(plens))]
        truths = [batch.labels[b, : batch.label_lengths[b]]
                  for b in range(len(plens))]
        mean_id, details = batch_identity(preds, truths)
        idents.extend(d[0] for d in details)
        for p, t in list(zip(preds, truths))[:2]:
            print("  pred:", labels2strings([p])[0])
            print("  true:", labels2strings([t])[0])

    result = {
        "avg_per_logit_ctc": float(np.mean(ctc_vals)),
        # the reference's "per-logit" divides the BATCH-SUMMED warp-ctc loss
        # by T only (eval notebook cell 12: ctc_loss / transcriptions.size(0)
        # at batch_size=6), so the metric scales with batch size; this is
        # our number re-expressed at the reference's batch 6
        "ref_convention_per_logit_ctc":
            float(np.mean(ctc_vals)) * 6.0 / args.batch_size,
        "mean_identity": float(np.mean(idents)),
        "identities": [round(float(x), 3) for x in idents],
        "reference_anchor": {"avg_per_logit_ctc": 0.5548, "batch_size": 6,
                             "identity_range": [0.495, 0.78]},
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
