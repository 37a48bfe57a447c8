"""Streaming bounded-memory CTC prefix beam search for long reads.

The monolithic on-device beam (decoding/ctc_beam_device.py) carries
(W, S) prefix buffers with S = max_label_len and an O(W^2 * S) per-frame
merge — quadratic in read length when S tracks the read (production
nanopore reads run to 10^5-10^6 samples, inference.py). This module reuses
`beam_scan`'s resumable state (built for the sequence-sharded distributed
decoder, decoding/distributed.py) to decode chunked log-probs
incrementally with a BOUNDED label window:

  feed(chunk)  — advance the beam state over one chunk of frames on device
                 (one compiled program per chunk shape, reused for any
                 read length);
  commit       — between chunks, the longest common prefix of all live
                 beams is provably final (candidates only ever EXTEND
                 existing prefixes, so every future hypothesis inherits
                 its ancestor's first k labels); those labels move to a
                 host-side output buffer and the window shifts left;
  finalize     — best beam = committed labels + its window remainder.

Exact equivalence with the monolithic beam holds whenever the window never
saturates (all beam arithmetic is shift-invariant within the window);
saturation — the window filling faster than commits free it — degrades
gracefully into a length-capped beam (extensions masked, counted in
`saturated_chunks`). At nanopore rates (~1 label / 6 frames) a 2048-label
window over 4096-frame chunks has ~12x headroom.

Replaces: ctcdecode.CTCBeamDecoder's role in the reference eval notebooks
(cells 19-22) extended to read lengths the reference never reached.
"""
from __future__ import annotations

import functools
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_speech_tpu.decoding.ctc_beam_device import (
    NEG_INF,
    beam_finalize,
    beam_init,
    beam_scan,
)


@functools.lru_cache(maxsize=8)
def _jit_scan(blank: int, prune: Optional[int] = None):
    """Jitted beam_scan, cached per (blank, cutoff_top_n): a fresh jax.jit
    per StreamingBeam instance (= per READ in basecall_long) defeated jit's
    function-identity cache and recompiled the scan for every read.

    prune = ctcdecode's cutoff_top_n: only each frame's top-`prune` labels
    become extension candidates (decoding/ctc_beam_device._beam_step) —
    measured 1.75x on the monolithic beam at speech-alphabet scale
    (RESULTS.md round 3); VERDICT r4 #5 wires it through the streaming
    path too."""
    return jax.jit(partial(beam_scan, blank=blank, prune=prune))


@functools.lru_cache(maxsize=8)
def _jit_scan_batch(blank: int, prune: Optional[int] = None):
    return jax.jit(jax.vmap(partial(beam_scan, blank=blank, prune=prune),
                            in_axes=(0, 0, None, 0)))


@functools.lru_cache(maxsize=1)
def _jit_finalize_batch():
    return jax.jit(jax.vmap(beam_finalize))


class StreamingBeam:
    """Bounded-memory CTC prefix beam decoder for ONE sequence, fed
    chunk-by-chunk with (T_c, C) log-probs."""

    def __init__(self, beam_width: int = 7, label_window: int = 2048,
                 blank: int = 0, cutoff_top_n: Optional[int] = None):
        self.beam_width = int(beam_width)
        self.window = int(label_window)
        self.blank = int(blank)
        self.state = jax.tree_util.tree_map(
            np.asarray, beam_init(self.beam_width, self.window))
        self.committed: list[int] = []
        self.committed_times: list[int] = []
        self.frames_fed = 0
        self.saturated_chunks = 0
        self._scan = _jit_scan(self.blank, cutoff_top_n)

    def feed(self, log_probs: np.ndarray, valid: Optional[int] = None) -> None:
        """Advance over one chunk. log_probs: (T_c, C) log-softmax frames
        in global order; rows past `valid` (default: all T_c) are padding
        and carry the state through unchanged (so a fixed chunk shape —
        one compiled scan — serves any read length)."""
        T = log_probs.shape[0]
        valid = T if valid is None else int(valid)
        ts = jnp.arange(self.frames_fed, self.frames_fed + T, dtype=jnp.int32)
        self.state = jax.tree_util.tree_map(np.asarray, self._scan(
            self.state, jnp.asarray(log_probs, jnp.float32), ts,
            jnp.int32(self.frames_fed + valid)))
        self.frames_fed += valid
        self._commit()
        # occupancy at the cap means extensions were (or are about to be)
        # masked — the decode degrades to length-capped
        plens, pb, pnb = self.state[1], self.state[2], self.state[3]
        alive = np.logaddexp(pb, pnb) > NEG_INF / 2
        if alive.any() and int(plens[alive].max()) >= self.window:
            self.saturated_chunks += 1

    def _commit(self) -> int:
        """Move the live beams' longest common prefix to the host buffer
        and shift the window left by its length."""
        prefixes, plens, pb, pnb, times = self.state
        total = np.logaddexp(pb, pnb)
        alive = total > NEG_INF / 2
        if not alive.any():
            return 0
        live_p = prefixes[alive]
        live_t = times[alive]
        # keep >= 1 label in every live beam's window: a beam committed to
        # plens == 0 would read as a truly-EMPTY prefix in _beam_step
        # (last = -1), silently disabling repeat-collapse for its real last
        # label and mis-pricing same-label extensions
        k_max = int(plens[alive].min()) - 1
        if k_max <= 0:
            return 0
        agree = np.all(live_p[:, :k_max] == live_p[0:1, :k_max], axis=0)
        k = int(np.argmin(agree)) if not agree.all() else k_max
        if k <= 0:
            return 0
        self.committed.extend(int(x) for x in live_p[0, :k])
        self.committed_times.extend(int(x) for x in live_t[0, :k])
        self.state = (np.roll(prefixes, -k, axis=1), plens - k, pb, pnb,
                      np.roll(times, -k, axis=1))
        return k

    def finalize(self) -> Tuple[np.ndarray, float, np.ndarray]:
        """(labels, score, times) of the best hypothesis: committed prefix
        + the best beam's window remainder."""
        if self.saturated_chunks:
            import warnings

            warnings.warn(
                f"streaming beam label window ({self.window}) saturated in "
                f"{self.saturated_chunks} chunk(s): extensions were masked "
                "and the decode is length-capped, not monolithic-equal; "
                "raise label_window or feed shorter chunks")
        prefixes, plens, scores, times = jax.tree_util.tree_map(
            np.asarray,
            beam_finalize(jax.tree_util.tree_map(jnp.asarray, self.state)))
        n = int(plens[0])
        labels = np.concatenate(
            [np.asarray(self.committed, np.int32), prefixes[0, :n]])
        tms = np.concatenate(
            [np.asarray(self.committed_times, np.int32), times[0, :n]])
        return labels, float(scores[0]), tms


class StreamingBeamBatch:
    """Serving-scale variant: decode a BATCH of long sequences concurrently
    — one vmapped chunk scan on device per feed, per-sequence
    commits/shifts on host (each read's window advances independently).

    All sequences share the chunk grid; per-read true lengths are fixed
    upfront (frames with global index >= length carry state through, so
    ragged reads just stop absorbing frames early)."""

    def __init__(self, batch: int, lengths, beam_width: int = 7,
                 label_window: int = 2048, blank: int = 0,
                 cutoff_top_n: Optional[int] = None):
        self.batch = int(batch)
        self.lengths = np.asarray(lengths, np.int32)
        assert self.lengths.shape == (self.batch,)
        self.beam_width = int(beam_width)
        self.window = int(label_window)
        self.blank = int(blank)
        one = beam_init(self.beam_width, self.window)
        self.state = jax.tree_util.tree_map(
            lambda a: np.broadcast_to(np.asarray(a)[None],
                                      (self.batch,) + a.shape).copy(), one)
        self.committed = [[] for _ in range(self.batch)]
        self.committed_times = [[] for _ in range(self.batch)]
        self.frames_fed = 0
        self.saturated_chunks = 0
        self._scan = _jit_scan_batch(self.blank, cutoff_top_n)

    def feed(self, log_probs: np.ndarray) -> None:
        """log_probs: (B, T_c, C) log-softmax chunk (same grid for all)."""
        B, T, _ = log_probs.shape
        assert B == self.batch
        ts = jnp.arange(self.frames_fed, self.frames_fed + T, dtype=jnp.int32)
        # np.array (not asarray): _commit_all shifts windows in place
        self.state = jax.tree_util.tree_map(np.array, self._scan(
            self.state, jnp.asarray(log_probs, jnp.float32), ts,
            jnp.asarray(self.lengths)))
        self.frames_fed += T
        self._commit_all()

    def _commit_all(self) -> None:
        prefixes, plens, pb, pnb, times = self.state
        total = np.logaddexp(pb, pnb)  # (B, W)
        for b in range(self.batch):
            alive = total[b] > NEG_INF / 2
            if not alive.any():
                continue
            live_p = prefixes[b][alive]
            k_max = int(plens[b][alive].min()) - 1  # keep >=1 label (see
            if k_max <= 0:                          # StreamingBeam._commit)
                continue
            agree = np.all(live_p[:, :k_max] == live_p[0:1, :k_max], axis=0)
            k = int(np.argmin(agree)) if not agree.all() else k_max
            if k <= 0:
                continue
            self.committed[b].extend(int(x) for x in live_p[0, :k])
            self.committed_times[b].extend(
                int(x) for x in times[b][alive][0, :k])
            prefixes[b] = np.roll(prefixes[b], -k, axis=1)
            times[b] = np.roll(times[b], -k, axis=1)
            plens[b] = plens[b] - k
        for b in range(self.batch):
            alive = total[b] > NEG_INF / 2
            if alive.any() and int(plens[b][alive].max()) >= self.window:
                self.saturated_chunks += 1

    def finalize(self):
        """List of (labels, score, times) per sequence, best hypothesis."""
        fin = _jit_finalize_batch()(
            jax.tree_util.tree_map(jnp.asarray, self.state))
        prefixes, plens, scores, times = jax.tree_util.tree_map(
            np.asarray, fin)
        out = []
        for b in range(self.batch):
            n = int(plens[b, 0])
            labels = np.concatenate(
                [np.asarray(self.committed[b], np.int32),
                 prefixes[b, 0, :n]])
            tms = np.concatenate(
                [np.asarray(self.committed_times[b], np.int32),
                 times[b, 0, :n]])
            out.append((labels, float(scores[b, 0]), tms))
        return out


def streaming_beam_decode(log_probs, beam_width: int = 7,
                          label_window: int = 2048, chunk_frames: int = 4096,
                          blank: int = 0, log_input: bool = True,
                          cutoff_top_n: Optional[int] = None
                          ) -> Tuple[np.ndarray, float, np.ndarray]:
    """Decode ONE (T, C) log-prob sequence with the streaming beam.

    Returns (labels, score, times) of the best hypothesis. Parity with the
    monolithic ctc_beam_search_jax is tested in
    tests/test_streaming_beam.py. cutoff_top_n: per-frame label pre-prune
    (exact whenever every top-W survivor is in the frame's top-K)."""
    lp = np.asarray(log_probs, np.float32)
    if not log_input:
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), axis=-1))
    sb = StreamingBeam(beam_width=beam_width, label_window=label_window,
                       blank=blank, cutoff_top_n=cutoff_top_n)
    T = lp.shape[0]
    # fixed chunk shape (pad the tail with carry-through frames) so every
    # read length reuses ONE compiled scan
    for s in range(0, T, chunk_frames):
        chunk = lp[s: s + chunk_frames]
        n = chunk.shape[0]
        if n < chunk_frames:
            chunk = np.concatenate(
                [chunk, np.zeros((chunk_frames - n, lp.shape[1]),
                                 np.float32)])
        sb.feed(chunk, valid=n)
    return sb.finalize()
