from . import losses  # noqa: F401
from .checkpoint import CheckpointManager, empty_histories  # noqa: F401
from .state import TrainState, create_train_state, make_optimizers  # noqa: F401
from .step import make_jitted_train_step, make_train_step  # noqa: F401
from .trainer import Trainer  # noqa: F401
