from wavenet_speech_tpu.ops.conv import (
    CausalConv1d,
    NonCausalConv1d,
    Conv1x1,
    Dense,
    causal_conv1d,
    noncausal_conv1d,
    autopad,
    receptive_field,
)
from wavenet_speech_tpu.ops.norm import LayerNorm
from wavenet_speech_tpu.ops.activations import gated_activation, leaky_relu, hardtanh
from wavenet_speech_tpu.ops.ctc import (
    ctc_loss,
    ctc_loss_flat,
    densify_labels,
    ctc_forward_logprob,
)

__all__ = [
    "CausalConv1d",
    "NonCausalConv1d",
    "Conv1x1",
    "Dense",
    "causal_conv1d",
    "noncausal_conv1d",
    "autopad",
    "receptive_field",
    "LayerNorm",
    "gated_activation",
    "leaky_relu",
    "hardtanh",
    "ctc_loss",
    "ctc_loss_flat",
    "densify_labels",
    "ctc_forward_logprob",
]
