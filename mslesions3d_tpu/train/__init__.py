from .state import TrainState, create_train_state, cosine_annealing_schedule, eval_view
from .steps import (
    make_train_step,
    make_eval_step,
    make_predict_step,
    make_gathered_train_step,
    make_gathered_eval_step,
    make_sharded_gathered_train_step,
)
from .checkpoints import CheckpointManager
from .loop import Trainer, TrainerConfig
