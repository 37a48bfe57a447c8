"""The reference's three kmer research experiments (reference
tests/kmer_mapping.py, tests/kmer_stay_prediction.py,
tests/decode_nucleotides_from_kmer.py), rebuilt as jitted JAX training
loops.

  mapping   — can a pointwise MLP recover the 5-mer identity from a single
              Gaussian current sample?  (Reference result: no — it "fails to
              reproduce the kmer model after 2M loops", kmer_mapping.py:1-7;
              temporal context is essential. This port reproduces that
              negative result in minutes.)
  stay      — predict per-frame kmer-or-STAY labels from raw signal with a
              RawCTCNet under frame-aligned cross entropy. (The reference
              script is an unfinished skeleton — its generator `fetch()` is
              `pass`, kmer_stay_prediction.py:37-39 — this implements the
              documented intent.)
  decode    — ByteNetDecoder decodes the nucleotide sequence from embedded
              5-mer encodings, teacher-forced next-nt cross entropy.
              (Reference result: learns "extremely quickly",
              decode_nucleotides_from_kmer.py:4-5.)

Usage: python examples/kmer_experiments.py {mapping,stay,decode} [--steps N]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def _kmer_tables():
    from wavenet_speech_tpu.data.gaussian_kmer import DEFAULT_KMER_MODEL

    npz = np.load(DEFAULT_KMER_MODEL)
    return npz["means"].astype(np.float32), npz["stdvs"].astype(np.float32)


def _nts_to_kmers(nts: np.ndarray) -> np.ndarray:
    """Sliding 5-mer ids per batch row, the reference's base-4 positional
    encoding (decode_nucleotides_from_kmer.py:41-44) via the canonical
    kmer_ids helper (data/gaussian_kmer.py)."""
    from wavenet_speech_tpu.data.gaussian_kmer import kmer_ids

    return np.stack([kmer_ids(row, trim=0) for row in nts])


def run_mapping(steps: int, batch_size: int, nhid: int, lr: float, seed: int):
    """reference tests/kmer_mapping.py: Linear(1,1) -> 6x[Linear+LeakyReLU]
    -> Linear(nhid, 1024), CE against the kmer id, Adamax.

    Faithful quirks: the LeakyReLU negative slope is
    nn.init.calculate_gain('leaky_relu') ~= 1.4139 (kmer_mapping.py:39-51 —
    a near-linear activation), and weights use sparse init (sparsity 0.1,
    kmer_mapping.py:52). Honest divergence: the reference loop never calls
    loss.backward() (kmer_mapping.py:66-71), so its documented negative
    result came from an UNTRAINED model; this port actually trains and the
    task still sits at chance — a strictly stronger confirmation that a
    pointwise map cannot recover the 5-mer from one sample (25 gaussians
    with heavy overlap cover 1024 classes)."""
    import jax
    import jax.numpy as jnp
    import optax

    means, stdvs = _kmer_tables()
    rng = np.random.default_rng(seed)

    dims = [1, 1] + [nhid] * 6 + [1024]
    keys = jax.random.split(jax.random.PRNGKey(seed), len(dims))

    def sparse_init(key, shape, sparsity=0.1):
        # torch nn.init.sparse: normal(0, 0.01) with `sparsity` fraction of
        # each column zeroed
        w = jax.random.normal(key, shape, jnp.float32) * 0.01
        nz = jax.random.uniform(jax.random.fold_in(key, 1), shape) >= sparsity
        return w * nz

    params = [
        {"w": sparse_init(keys[i], (dims[i], dims[i + 1])),
         "b": jnp.full((dims[i + 1],), 1e-4)}
        for i in range(len(dims) - 1)
    ]
    slope = float(np.sqrt(2.0 / (1 + 0.01 ** 2)))  # calculate_gain ~ 1.4139

    def mlp(params, x):
        h = x @ params[0]["w"] + params[0]["b"]
        for lyr in params[1:-1]:
            h = jax.nn.leaky_relu(h @ lyr["w"] + lyr["b"],
                                  negative_slope=slope)
        return h @ params[-1]["w"] + params[-1]["b"]

    tx = optax.adamax(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, samples, kmers):
        def loss_fn(p):
            logits = mlp(p, samples)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, kmers).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for k in range(steps):
        kmers = rng.integers(0, 1024, size=batch_size)
        samples = rng.normal(means[kmers], stdvs[kmers])[:, None].astype(
            np.float32)
        params, opt_state, loss = step(params, opt_state, samples, kmers)
        if k % 100 == 0:
            print(f"step {k} | CE {float(loss):.4f} "
                  f"(chance {np.log(1024):.4f})", flush=True)
    print(f"final CE {float(loss):.4f} vs chance {np.log(1024):.4f} — the "
          "reference documents this experiment as a negative result")
    return float(loss)


def _stay_batch(rng, means, stdvs, batch_size, num_kmers, shape, rate,
                max_dur, pad_frames):
    """Random 5-mer runs with Gamma durations -> (signal (B,L,1),
    frame labels (B,L) where frame 0 of each run is the kmer id and
    subsequent frames are STAY=1024)."""
    B = batch_size
    kmers = rng.integers(0, 1024, size=(B, num_kmers))
    durs = np.clip(np.ceil(rng.gamma(shape, 1.0 / rate, size=(B, num_kmers))
                           ).astype(int), 1, max_dur)
    L = pad_frames
    sig = np.zeros((B, L, 1), np.float32)
    lab = np.full((B, L), 1024, np.int64)  # STAY everywhere by default
    valid = np.zeros((B, L), bool)  # true frames (not tail padding)
    for b in range(B):
        t = 0
        for i in range(num_kmers):
            d = min(int(durs[b, i]), L - t)
            if d <= 0:
                break
            k = int(kmers[b, i])
            sig[b, t : t + d, 0] = rng.normal(means[k], stdvs[k], size=d)
            lab[b, t] = k
            t += d
        valid[b, :t] = True
    return sig, lab, valid


def run_stay(steps: int, batch_size: int, num_features: int, lr: float,
             seed: int):
    """reference tests/kmer_stay_prediction.py intent: RawCTCNet over raw
    signal, 1025 labels (1024 kmers + STAY), frame-aligned CE."""
    import jax
    import jax.numpy as jnp
    import optax

    from wavenet_speech_tpu.models import RawCTCNet

    means, stdvs = _kmer_tables()
    rng = np.random.default_rng(seed)
    num_kmers, shape, rate, max_dur = 20, 2.0, 0.5, 8
    pad_frames = num_kmers * max_dur

    layers = tuple((num_features, num_features, 2, d)
                   for d in (1, 2, 4, 8, 16)) * 2
    net = RawCTCNet(num_features, 3, 1025, layers, num_features,
                    positions=True, softmax=False, causal=False)
    params = net.init(jax.random.PRNGKey(seed))
    tx = optax.adamax(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, sig, lab, valid):
        def loss_fn(p):
            logits = net.apply(p, sig)[:, : lab.shape[1]]
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, lab)
            # mask the zero-signal tail padding so the metric measures
            # kmer-vs-STAY prediction on real frames only
            return (ce * valid).sum() / jnp.maximum(valid.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for k in range(steps):
        sig, lab, valid = _stay_batch(rng, means, stdvs, batch_size,
                                      num_kmers, shape, rate, max_dur,
                                      pad_frames)
        params, opt_state, loss = step(params, opt_state, sig, lab, valid)
        if k % 20 == 0:
            print(f"step {k} | frame CE {float(loss):.4f} "
                  f"(chance {np.log(1025):.4f})", flush=True)
    print(f"final frame CE {float(loss):.4f}")
    return float(loss)


def run_decode(steps: int, batch_size: int, nt_length: int, channels: int,
               enc_dim: int, lr: float, seed: int):
    """reference tests/decode_nucleotides_from_kmer.py main_ce: embed the
    5-mer sequence, ByteNetDecoder predicts the next nucleotide, CE."""
    import jax
    import jax.numpy as jnp
    import optax

    from wavenet_speech_tpu.models import ByteNetDecoder

    rng = np.random.default_rng(seed)
    dec = ByteNetDecoder(num_labels=5, encoding_dim=enc_dim,
                         channels=channels, output_dim=2 * channels,
                         layers=((3, 1), (3, 2), (3, 4), (3, 8), (3, 16)),
                         block="mult")
    key = jax.random.PRNGKey(seed)
    params = dec.init(key)
    # the reference optimizes decoder.parameters() only — its
    # nn.Embedding(1024, enc_dim) stays frozen at random init
    # (decode_nucleotides_from_kmer.py:70,76)
    kmer_embed = jax.nn.initializers.normal(1.0)(
        jax.random.fold_in(key, 1), (1024, enc_dim), jnp.float32)
    tx = optax.adamax(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, nts, kmers):
        def loss_fn(p):
            enc = kmer_embed[kmers]                      # (B, L_enc, enc_dim)
            L = enc.shape[1]
            logits = dec.apply(p, nts[:, :L], enc)
            # next-timestep prediction (reference loss vs nt_var[:, t+1])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, nts[:, 1 : L + 1]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for k in range(steps):
        nts = rng.integers(1, 5, size=(batch_size, nt_length))
        kmers = _nts_to_kmers(nts)
        params, opt_state, loss = step(params, opt_state, nts, kmers)
        if k % 20 == 0:
            print(f"step {k} | next-nt CE {float(loss):.4f} "
                  f"(chance {np.log(4):.4f})", flush=True)
    print(f"final next-nt CE {float(loss):.4f} — the reference documents "
          "this decoding as learning 'extremely quickly'")
    return float(loss)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment", choices=("mapping", "stay", "decode"))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    t0 = time.time()
    if args.experiment == "mapping":
        out = run_mapping(args.steps or 2000, args.batch_size, nhid=512,
                          lr=args.lr, seed=args.seed)
    elif args.experiment == "stay":
        out = run_stay(args.steps or 300, args.batch_size, num_features=128,
                       lr=args.lr / 2, seed=args.seed)
    else:
        out = run_decode(args.steps or 300, args.batch_size, nt_length=100,
                         channels=128, enc_dim=256, lr=args.lr,
                         seed=args.seed)
    print(f"({time.time() - t0:.0f}s)")
    return out


if __name__ == "__main__":
    main()
