from tsue_tpu.train.losses import denorm, denorm_mse_loss
from tsue_tpu.train.trainer import Trainer, TrainState, make_optimizer
