from wavenet_speech_tpu.parallel.mesh import (
    AXES,
    make_mesh,
    batch_sharding,
    replicated,
)
from wavenet_speech_tpu.parallel.sharding import (
    param_shardings,
    shard_params,
    shard_batch,
)
from wavenet_speech_tpu.parallel.ctc_sharded import ctc_loss_seq_sharded
from wavenet_speech_tpu.parallel.halo import (
    seq_axis,
    current_seq_axis,
    halo_pad,
    seq_sharded_apply,
)

__all__ = [
    "AXES",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_params",
    "shard_batch",
    "seq_axis",
    "current_seq_axis",
    "halo_pad",
    "seq_sharded_apply",
    "ctc_loss_seq_sharded",
]
