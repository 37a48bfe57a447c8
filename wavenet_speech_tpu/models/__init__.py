from wavenet_speech_tpu.models.blocks import (
    ResidualBlock,
    ResidualMUBlock,
    ResidualReLUBlock,
    MultiplicativeUnit,
)
from wavenet_speech_tpu.models.wavenet import WaveNet
from wavenet_speech_tpu.models.classifier import WaveNetClassifier
from wavenet_speech_tpu.models.raw_ctcnet import RawCTCNet
from wavenet_speech_tpu.models.bytenet_decoder import ByteNetDecoder
from wavenet_speech_tpu.models.rnn_decoder import RNNByteNetDecoder, StackedLSTMCell

__all__ = [
    "ResidualBlock",
    "ResidualMUBlock",
    "ResidualReLUBlock",
    "MultiplicativeUnit",
    "WaveNet",
    "WaveNetClassifier",
    "RawCTCNet",
    "ByteNetDecoder",
    "RNNByteNetDecoder",
    "StackedLSTMCell",
]
