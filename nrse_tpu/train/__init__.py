from nrse_tpu.train.schedules import cosine_annealing, make_byol_optimizer
from nrse_tpu.train.early_stopping import EarlyStopping
from nrse_tpu.train.byol_trainer import BYOLTrainState, make_byol_train_step, make_byol_eval_step

__all__ = [
    "cosine_annealing",
    "make_byol_optimizer",
    "EarlyStopping",
    "BYOLTrainState",
    "make_byol_train_step",
    "make_byol_eval_step",
]
