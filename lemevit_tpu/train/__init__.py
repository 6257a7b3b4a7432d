from lemevit_tpu.train.optim import build_optimizer, build_lr_schedule  # noqa: F401
from lemevit_tpu.train.state import TrainState, create_train_state  # noqa: F401
from lemevit_tpu.train.steps import (  # noqa: F401
    cross_entropy_loss,
    eval_step,
    make_eval_step,
    make_train_step,
)
