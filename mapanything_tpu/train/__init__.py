"""Training stack: losses, optimizer, train step, checkpointing."""

from .losses import (
    FactoredGeometryConfig,
    L1Loss,
    L2Loss,
    OverallLossConfig,
    RobustRegressionLoss,
    bce_with_logits,
    exclude_top_n_percent,
    factored_geometry_scale_regr3d,
    non_ambiguous_mask_loss,
    overall_loss,
)
from . import criteria
from .criteria import MultiLoss, released_criterion
from .step import (
    OptimConfig,
    TrainState,
    cosine_schedule,
    create_train_state,
    jit_train_step,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "FactoredGeometryConfig",
    "L1Loss",
    "L2Loss",
    "MultiLoss",
    "OptimConfig",
    "criteria",
    "released_criterion",
    "OverallLossConfig",
    "RobustRegressionLoss",
    "TrainState",
    "bce_with_logits",
    "cosine_schedule",
    "create_train_state",
    "exclude_top_n_percent",
    "factored_geometry_scale_regr3d",
    "jit_train_step",
    "make_optimizer",
    "make_train_step",
    "non_ambiguous_mask_loss",
    "overall_loss",
]

from .checkpoints import (
    load_params,
    load_train_state,
    save_params,
    save_train_state,
)
from .loop import (
    MetricLogger,
    SmoothedValue,
    TrainLoopConfig,
    build_dataset_mix,
    test_one_epoch,
    train,
    train_one_epoch,
)
