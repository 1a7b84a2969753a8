from dgcnn_tpu.parallel.mesh import make_mesh, device_grid, initialize_multihost
from dgcnn_tpu.parallel.shard import (
    shard_batch_for_dp,
    pack_epoch_dp,
    partition_edges,
    shard_bucket,
    batch_pspecs,
    lpt_assign,
)
from dgcnn_tpu.parallel.train_dp import (
    make_dp_train_epoch,
    make_dp_eval_epoch,
    make_sharded_loss,
    device_put_epoch,
)

__all__ = [
    "make_mesh",
    "device_grid",
    "initialize_multihost",
    "shard_batch_for_dp",
    "pack_epoch_dp",
    "partition_edges",
    "shard_bucket",
    "batch_pspecs",
    "lpt_assign",
    "make_dp_train_epoch",
    "make_dp_eval_epoch",
    "make_sharded_loss",
    "device_put_epoch",
]
