from dgcnn_tpu.ops.gcn import gcn_degree, gcn_edge_weights, gcn_conv
from dgcnn_tpu.ops.spmm import spmm, sddmm
from dgcnn_tpu.ops.sort_pool import sort_pool
from dgcnn_tpu.ops.readout import conv1d_readout

__all__ = [
    "sddmm",
    "gcn_degree",
    "gcn_edge_weights",
    "gcn_conv",
    "spmm",
    "sort_pool",
    "conv1d_readout",
]
