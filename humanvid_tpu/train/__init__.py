from .state import (
    OptimizerConfig,
    cast_untrainable,
    combine_params,
    partition_params,
    TrainState,
    make_optimizer,
    stage1_trainable,
    stage2_trainable,
    trainability_mask,
)
from .step import TrainConfig, make_loss_fn, make_train_step

__all__ = [
    "OptimizerConfig",
    "cast_untrainable",
    "combine_params",
    "partition_params",
    "TrainState",
    "make_optimizer",
    "stage1_trainable",
    "stage2_trainable",
    "trainability_mask",
    "TrainConfig",
    "make_loss_fn",
    "make_train_step",
]
