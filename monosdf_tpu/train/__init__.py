from .optim import OptimConfig, make_optimizer
from .step import TrainState, make_train_step, init_train_state
