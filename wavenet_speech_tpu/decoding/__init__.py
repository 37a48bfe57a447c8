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

__all__ = [
    "argmax_decode",
    "ctc_collapse",
    "labels2strings",
    "greedy_ctc_decode",
    "prefix_beam_search",
    "beam_search_decode",
]
