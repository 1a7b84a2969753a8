from dgcnn_tpu.models.dgcnn import DGCNN, init_params, apply

__all__ = ["DGCNN", "init_params", "apply"]
