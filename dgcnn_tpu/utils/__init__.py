from dgcnn_tpu.utils.checkpoint import save_checkpoint, load_checkpoint, checkpoint_exists

__all__ = ["save_checkpoint", "load_checkpoint", "checkpoint_exists"]
