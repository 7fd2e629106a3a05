from .state import TrainState, make_train_state, make_optimizer
from .steps import (
    make_train_step, make_eval_step, compute_loss, eval_variables,
    device_batch)
