"""Training: typed config, optimizers, train state, jitted/sharded steps,
checkpointing."""

from yolat_tpu.train.config import Config
from yolat_tpu.train.optim import make_optimizer
from yolat_tpu.train.loop import TrainState, create_state, make_train_step
