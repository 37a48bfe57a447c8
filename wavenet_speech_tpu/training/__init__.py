from wavenet_speech_tpu.training.loss import JointLoss, next_signal_xe_loss
from wavenet_speech_tpu.training.optimizer import (
    Optimizer,
    ReduceLROnPlateau,
    build_optimizer,
    make_lr_schedule,
)
from wavenet_speech_tpu.training.trainer import (
    TrainState,
    make_joint_train_step,
    make_ctc_train_step,
    make_eval_step,
)

__all__ = [
    "JointLoss",
    "next_signal_xe_loss",
    "Optimizer",
    "ReduceLROnPlateau",
    "build_optimizer",
    "make_lr_schedule",
    "TrainState",
    "make_joint_train_step",
    "make_ctc_train_step",
    "make_eval_step",
]
