"""ctypes binding for the native CTC beam decoder (native/ctc_beam.cc).

Lazily builds libctcbeam.so with g++ on first use (no pybind11 in this
environment; plain C ABI + ctypes keeps the binding dependency-free).
Falls back cleanly when no compiler is available — callers should check
native_available() or use decoding/prefix_beam.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ctc_beam.cc")
_LIB_PATH = os.path.join(_HERE, "libctcbeam.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", _LIB_PATH, _SRC, "-lpthread"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=240)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-2000:]}"
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            err = _build()
            if err:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.ctc_beam_search_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # log_probs
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B, T, C
            ctypes.POINTER(ctypes.c_int32),   # lengths (nullable)
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # beam, blank, max_len
            ctypes.POINTER(ctypes.c_int32),   # out_labels
            ctypes.POINTER(ctypes.c_int32),   # out_lengths
            ctypes.POINTER(ctypes.c_float),   # out_scores
            ctypes.POINTER(ctypes.c_int32),   # out_times (nullable)
            ctypes.c_int,                      # num_threads
        ]
        lib.ctc_beam_search_batch.restype = None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def ctc_beam_search_native(logits, beam_width: int = 7, blank: int = 0,
                           lengths=None, max_label_len: Optional[int] = None,
                           log_input: bool = False, num_threads: int = 0,
                           return_times: bool = False
                           ) -> Tuple[np.ndarray, ...]:
    """Batched CTC prefix beam search via the native library.

    Args:
      logits: (B, T, C) float; softmaxed internally unless log_input.
      return_times: also return (B, S) int32 per-label emission frames
        (the native ctcdecode's `times` output).
    Returns (labels (B, S) int32 0-padded, lengths (B,) int32,
    scores (B,) float32[, times (B, S) int32]), best beam per sequence.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native ctc beam unavailable: {_build_error}")
    logits = np.ascontiguousarray(logits, dtype=np.float32)
    B, T, C = logits.shape
    if not log_input:
        m = logits.max(axis=-1, keepdims=True)
        logits = logits - m
        logits = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        logits = np.ascontiguousarray(logits, dtype=np.float32)
    S = int(max_label_len) if max_label_len is not None else T

    out_labels = np.zeros((B, S), np.int32)
    out_lengths = np.zeros((B,), np.int32)
    out_scores = np.zeros((B,), np.float32)
    out_times = np.zeros((B, S), np.int32)
    if lengths is not None:
        lengths = np.ascontiguousarray(lengths, dtype=np.int32)
        len_ptr = lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        len_ptr = None
    lib.ctc_beam_search_batch(
        logits.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        B, T, C, len_ptr, beam_width, blank, S,
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_times.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num_threads,
    )
    if return_times:
        return out_labels, out_lengths, out_scores, out_times
    return out_labels, out_lengths, out_scores
