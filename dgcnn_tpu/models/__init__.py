from dgcnn_tpu.models.dgcnn import DGCNN, init_params, apply, apply_coo, apply_dense

__all__ = ["DGCNN", "init_params", "apply", "apply_coo", "apply_dense"]
