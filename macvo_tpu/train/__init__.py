"""Training harness (reference: Train/MatchingNet/)."""

from .loss import cov_loss, final_cov_loss, flow_loss, sequence_loss, sequence_metrics
from .step import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_optimizer,
    make_sharded_train_step,
    make_train_step,
    trainable_mask,
)

__all__ = [
    "TrainConfig", "TrainState", "cov_loss", "create_train_state", "final_cov_loss",
    "flow_loss", "make_optimizer", "make_sharded_train_step", "make_train_step",
    "sequence_loss", "sequence_metrics", "trainable_mask",
]
