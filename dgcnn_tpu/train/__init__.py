from dgcnn_tpu.train.loop import (
    make_train_epoch,
    make_eval_epoch,
    nll_loss_and_correct,
)
from dgcnn_tpu.train.cv import run_cross_validation

__all__ = [
    "make_train_epoch",
    "make_eval_epoch",
    "nll_loss_and_correct",
    "run_cross_validation",
]
