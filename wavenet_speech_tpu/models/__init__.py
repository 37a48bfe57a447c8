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
from wavenet_speech_tpu.models.conv_decoder import AttnConvolutionalDecoder
from wavenet_speech_tpu.models import fast_wavenet

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
    "AttnConvolutionalDecoder",
    "fast_wavenet",
]
