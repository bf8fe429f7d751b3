from .schedules import (
    build_lr_schedule,
    gradual_warmup_cosine_lr,
    poly_lr,
    step_decay_lr,
    warmup_cosine_lr,
)
from .segmentor import Segmentor
from .state import ModuleState, TrainState, apply_updates, make_optimizer, split_variables
from .steps import (
    make_family_loss,
    make_lr_schedule,
    make_optimizers,
    make_src_train_step,
    wrap_step_checkify,
)
