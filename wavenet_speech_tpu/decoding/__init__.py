from wavenet_speech_tpu.decoding.greedy import (
    argmax_decode,
    ctc_collapse,
    labels2strings,
    greedy_ctc_decode,
)
from wavenet_speech_tpu.decoding.prefix_beam import (
    prefix_beam_search,
    beam_search_decode,
)
from wavenet_speech_tpu.decoding.ctc_beam_device import ctc_beam_search_jax
from wavenet_speech_tpu.decoding.labelsync import Beam, BeamSearchDecoder
from wavenet_speech_tpu.decoding.distributed import distributed_beam_decode

__all__ = [
    "argmax_decode",
    "ctc_collapse",
    "labels2strings",
    "greedy_ctc_decode",
    "prefix_beam_search",
    "beam_search_decode",
    "ctc_beam_search_jax",
    "Beam",
    "BeamSearchDecoder",
    "distributed_beam_decode",
]
