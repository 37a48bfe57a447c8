from wavenet_speech_tpu.data.common import (
    ALPHABET,
    Batch,
    MuLawQuantizer,
    one_hot_lc,
    interleave_zeros,
)
from wavenet_speech_tpu.data.pore_model import PoreModelLoader, DEFAULT_CURRENTS
from wavenet_speech_tpu.data.gaussian_kmer import (
    GaussianModelLoader,
    RawGaussianModelLoader,
    DEFAULT_KMER_MODEL,
    kmer_ids,
)
from wavenet_speech_tpu.data.raw_signal import RawSignalGenerator
from wavenet_speech_tpu.data.hdf5 import QueueLoader, BucketedLoader, ecoli_worker_fn
from wavenet_speech_tpu.data.prefetch import prefetch_to_device, batch_to_device

__all__ = [
    "ALPHABET",
    "Batch",
    "MuLawQuantizer",
    "one_hot_lc",
    "interleave_zeros",
    "PoreModelLoader",
    "DEFAULT_CURRENTS",
    "GaussianModelLoader",
    "RawGaussianModelLoader",
    "DEFAULT_KMER_MODEL",
    "kmer_ids",
    "RawSignalGenerator",
    "QueueLoader",
    "BucketedLoader",
    "ecoli_worker_fn",
    "prefetch_to_device",
    "batch_to_device",
]
