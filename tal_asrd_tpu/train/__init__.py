from tal_asrd_tpu.train.system import ASRSystem, TrainState
from tal_asrd_tpu.train.losses import (
    log_softmax_cross_entropy,
    masked_token_loss,
    masked_accuracy,
    masked_mean,
)
from tal_asrd_tpu.train.optimizers import lamb, radam, adafactor, lookahead
from tal_asrd_tpu.train.schedules import (
    triangle_schedule,
    inv_sqrt_schedule,
    linear_decay_schedule,
    constant_schedule,
)
from tal_asrd_tpu.train.loop import Trainer, TrainerConfig
from tal_asrd_tpu.train.lm_system import LMSystem, LMTextDataset
from tal_asrd_tpu.train.embed_system import (
    ContrastiveCollator,
    ContrastiveDataset,
    EmbedSystem,
)

__all__ = [
    "ASRSystem",
    "TrainState",
    "log_softmax_cross_entropy",
    "masked_token_loss",
    "masked_accuracy",
    "masked_mean",
    "lamb",
    "radam",
    "adafactor",
    "lookahead",
    "triangle_schedule",
    "inv_sqrt_schedule",
    "linear_decay_schedule",
    "constant_schedule",
    "Trainer",
    "TrainerConfig",
    "LMSystem",
    "LMTextDataset",
    "ContrastiveCollator",
    "ContrastiveDataset",
    "EmbedSystem",
]
