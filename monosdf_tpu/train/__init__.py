from .optim import OptimConfig, make_optimizer
from .step import (
    TrainState,
    make_train_step,
    make_train_step_scan,
    init_train_state,
)
