from .arguments import TrainingArguments
from .optimizer import build_optimizer, label_params, make_lr_schedule
from .rollout import autoregressive_rollout, rollout_loss
from .trainer import Trainer, TrainState

__all__ = [
    "TrainingArguments", "build_optimizer", "label_params", "make_lr_schedule",
    "autoregressive_rollout", "rollout_loss", "Trainer", "TrainState",
]
