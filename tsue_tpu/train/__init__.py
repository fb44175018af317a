from tsue_tpu.train.losses import denorm, denorm_mse_loss
from tsue_tpu.train.trainer import TrainState, make_optimizer
