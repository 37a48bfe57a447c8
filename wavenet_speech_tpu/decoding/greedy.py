"""Greedy decoding utilities (reference modules/sequence_decoders.py:9-41).

argmax_decode runs on device (jit-friendly); CTC collapse + string rendering
are host-side (ragged outputs).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from wavenet_speech_tpu.data.common import ALPHABET


def argmax_decode(logits) -> jnp.ndarray:
    """(B, L, C) logits -> (B, L) argmax labels (reference
    sequence_decoders.py:9-23, which takes batch-seq-logit order too)."""
    return jnp.argmax(logits, axis=-1)


def ctc_collapse(labels: np.ndarray, lengths: Optional[np.ndarray] = None,
                 blank: int = 0) -> List[np.ndarray]:
    """Standard CTC collapse: merge repeats, then drop blanks. Returns a
    ragged list of label arrays."""
    labels = np.asarray(labels)
    out = []
    for b in range(labels.shape[0]):
        row = labels[b, : (None if lengths is None else int(lengths[b]))]
        keep = np.ones(len(row), dtype=bool)
        keep[1:] = row[1:] != row[:-1]
        dedup = row[keep]
        out.append(dedup[dedup != blank])
    return out


def labels2strings(labels, lookup: Optional[Dict[int, str]] = None) -> List[str]:
    """Integer labels -> strings via lookup (reference
    sequence_decoders.py:26-41); blank maps to ''. Accepts a (B, L) array or
    a ragged list of 1-D arrays."""
    lookup = lookup or ALPHABET
    if isinstance(labels, (list, tuple)):
        rows = [np.asarray(r) for r in labels]
    else:
        labels = np.asarray(labels)
        rows = [labels[b] for b in range(labels.shape[0])]
    return ["".join(lookup.get(int(ix), "") for ix in row) for row in rows]


def greedy_ctc_decode(logits, lengths=None, blank: int = 0,
                      lookup: Optional[Dict[int, str]] = None) -> List[str]:
    """argmax -> collapse -> strings, the standard greedy CTC pipeline the
    reference notebooks use for evaluation."""
    labels = np.asarray(argmax_decode(logits))
    return labels2strings(ctc_collapse(labels, lengths, blank), lookup)
