from wavenet_speech_tpu.utils.config import (
    json_to_config,
    config_to_json,
    layers_from_cfg,
    base_model_cfg,
    classifier_cfg,
    training_cfg,
)
from wavenet_speech_tpu.utils.run_logging import Logger, MovingAverageMeter, Throughput

__all__ = [
    "json_to_config",
    "config_to_json",
    "layers_from_cfg",
    "base_model_cfg",
    "classifier_cfg",
    "training_cfg",
    "Logger",
    "MovingAverageMeter",
    "Throughput",
]
