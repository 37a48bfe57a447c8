from wavenet_speech_tpu.ops.pallas.residual_block import (
    fused_gated_block,
    pallas_available,
)

__all__ = ["fused_gated_block", "pallas_available"]
