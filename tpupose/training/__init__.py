from tpupose.training.loss import eucl_loss, stagewise_losses  # noqa: F401
from tpupose.training.optimizer import make_optimizer, param_labels  # noqa: F401
from tpupose.training.train import (  # noqa: F401
    TrainState,
    create_state,
    make_preprocessed_step,
    make_train_step,
)
from tpupose.training import checkpoint  # noqa: F401
