"""Data layer: TU-format graph datasets as flat NumPy arrays.

TPU-native replacement for the reference's data stack (PyG `TUDataset` +
`Indegree` pre-transform + fold-index files — reference train.py:81-87,
utils.py:5-36, data/*/10fold_idx/). Everything here is host-side NumPy;
the batching layer turns a `GraphSet` into fixed-shape device arrays.
"""

from dgcnn_tpu.data.datasets import DATASET_STATS, DatasetMeta, load_dataset
from dgcnn_tpu.data.folds import (
    get_folds,
    load_fold_indices,
    make_stratified_folds,
)
from dgcnn_tpu.data.graphset import GraphSet
from dgcnn_tpu.data.synthetic import PROFILES, synthesize_tu_dataset
from dgcnn_tpu.data.tu_parser import (
    assemble_features,
    parse_tu_dir,
    write_tu_format,
)

__all__ = [
    "DATASET_STATS",
    "DatasetMeta",
    "GraphSet",
    "PROFILES",
    "assemble_features",
    "get_folds",
    "load_dataset",
    "load_fold_indices",
    "make_stratified_folds",
    "parse_tu_dir",
    "synthesize_tu_dataset",
    "write_tu_format",
]
