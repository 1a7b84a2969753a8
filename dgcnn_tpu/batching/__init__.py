from dgcnn_tpu.batching.packer import (
    GraphBatch,
    BucketSpec,
    compute_bucket,
    pack_batch,
    pack_epoch,
)

__all__ = [
    "GraphBatch",
    "BucketSpec",
    "compute_bucket",
    "pack_batch",
    "pack_epoch",
]
