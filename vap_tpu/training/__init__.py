from .optimizer import get_lr_schedule, get_optimizer
from .train_step import (
    TrainStepConfig,
    cogvideox_vap_loss,
    make_train_step,
    trainable_mask,
)
