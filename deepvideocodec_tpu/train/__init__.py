"""Training stack: RD loss, 6-stage curriculum, dual optimizers, train steps."""

from .loss import rate_distortion_loss
from .curriculum import Stage, stage_for_epoch
from .optimizers import make_optimizer, partition_labels
from .trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)

__all__ = [
    "rate_distortion_loss",
    "Stage",
    "stage_for_epoch",
    "make_optimizer",
    "partition_labels",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
