from swem_tpu.train.losses import make_criterion
from swem_tpu.train.solver import lr_schedule, make_optimizer, max_iter_for_stage
from swem_tpu.train.trainer import TrainState, create_train_state, make_train_step

__all__ = [
    "make_criterion",
    "lr_schedule",
    "make_optimizer",
    "max_iter_for_stage",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
