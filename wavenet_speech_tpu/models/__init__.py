from wavenet_speech_tpu.models.blocks import (
    ResidualBlock,
    ResidualMUBlock,
    ResidualReLUBlock,
    MultiplicativeUnit,
)
from wavenet_speech_tpu.models.wavenet import WaveNet
from wavenet_speech_tpu.models.classifier import WaveNetClassifier
from wavenet_speech_tpu.models.raw_ctcnet import RawCTCNet

__all__ = [
    "ResidualBlock",
    "ResidualMUBlock",
    "ResidualReLUBlock",
    "MultiplicativeUnit",
    "WaveNet",
    "WaveNetClassifier",
    "RawCTCNet",
]
