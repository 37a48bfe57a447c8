from wavenet_speech_tpu.native.ctc_beam import (
    native_available,
    ctc_beam_search_native,
)

__all__ = ["native_available", "ctc_beam_search_native"]
