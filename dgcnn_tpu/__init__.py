"""dgcnn_tpu — a TPU-native graph-classification framework.

A from-scratch JAX/XLA/Pallas re-design of the DGCNN graph-classification
workload (AAAI-2018 "An End-to-End Deep Learning Architecture for Graph
Classification"), with the same capability surface as the PyTorch/PyG
reference (leftthomas/DGCNN) but built TPU-first:

* static padded shapes + ragged-batch masking instead of per-batch Python
  loops over dynamic graphs,
* graph convolution as dense `X @ W` on the MXU plus a gather/segment-sum
  (or Pallas SpMM) edge aggregation,
* device-side SortPooling (global lexicographic sort, no per-graph densify),
* a single jitted epoch program (`lax.scan` over pre-packed batches) with
  on-device metric accumulation,
* scale-out via `jax.sharding.Mesh` + `shard_map`: data parallelism over
  graph mega-batches and edge-partitioned aggregation with `psum`.

Reference parity targets are documented per-module via `file:line` citations
into the reference repo.
"""

__version__ = "0.1.0"

from dgcnn_tpu.config import DATASETS, Config

# Lazy top-level API (PEP 562): keeps `import dgcnn_tpu` light — the heavy
# JAX/optax imports only happen when a symbol is first touched.
_LAZY = {
    "GraphSet": "dgcnn_tpu.data.graphset",
    "load_dataset": "dgcnn_tpu.data.datasets",
    "synthesize_tu_dataset": "dgcnn_tpu.data.synthetic",
    "DGCNN": "dgcnn_tpu.models.dgcnn",
    "apply": "dgcnn_tpu.models.dgcnn",
    "init_params": "dgcnn_tpu.models.dgcnn",
    "num_params": "dgcnn_tpu.models.dgcnn",
    "run_cross_validation": "dgcnn_tpu.train.cv",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["Config", "DATASETS", "__version__", *sorted(_LAZY)]
