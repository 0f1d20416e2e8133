from nkbx.train.losses import (
    DEFAULT_FOCAL_GAMMA,
    MultitaskCriterion,
    SingletaskCriterion,
    cross_entropy,
    focal_loss,
    get_loss,
)
from nkbx.train.optim import (
    OptimizerBundle,
    backbone_state_factor,
    get_optimizer,
    get_scheduler,
)
from nkbx.train.state import TrainState
from nkbx.train.engine import (
    EpochCollector,
    build_eval_step,
    build_train_step,
    train_epoch,
    val_epoch,
)
from nkbx.train.checkpoint import (
    load_model_variables,
    restore_train_state,
    save_checkpoint,
    save_model_msgpack,
)
from nkbx.train.trainer import train

__all__ = [
    "DEFAULT_FOCAL_GAMMA",
    "MultitaskCriterion",
    "SingletaskCriterion",
    "cross_entropy",
    "focal_loss",
    "get_loss",
    "OptimizerBundle",
    "backbone_state_factor",
    "get_optimizer",
    "get_scheduler",
    "TrainState",
    "EpochCollector",
    "build_eval_step",
    "build_train_step",
    "train_epoch",
    "val_epoch",
    "load_model_variables",
    "restore_train_state",
    "save_checkpoint",
    "save_model_msgpack",
    "train",
]
