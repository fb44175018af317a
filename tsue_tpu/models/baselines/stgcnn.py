"""Social-STGCNN baseline (B4; ref scripts/test_baseline_stgcnn.py:210-265).

Embed -> 2x temporal graph-conv blocks (Conv k=3 over time + BatchNorm +
ReLU) -> flatten -> FC to horizon.  The reference's Conv2d over a
(B, C, T, 1) tensor with kernel (3,1) is just a 1-D temporal conv; here it
is nn.Conv over the time axis (channel-last, the TPU-friendly layout).
BatchNorm keeps torch semantics: batch stats in training, running averages
at eval (mutable "batch_stats" collection).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class STGConvBlock(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        # x: (B, T, C)
        x = nn.Conv(self.features, kernel_size=(self.kernel_size,),
                    padding="SAME", name="conv")(x)
        x = nn.BatchNorm(use_running_average=use_running_average,
                         name="norm")(x)
        return nn.relu(x)


class SocialSTGCNN(nn.Module):
    seq_len: int
    out_len: int
    feature_size: int = 2
    hidden_dim: int = 128
    kernel_size: int = 3

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True,
                 teacher: Optional[jnp.ndarray] = None):
        x = jnp.swapaxes(batch["traj_in"], 1, 2)        # (B, T, 2)
        B = x.shape[0]
        x = nn.Dense(self.hidden_dim, name="input_embedding")(x)
        x = STGConvBlock(self.hidden_dim, self.kernel_size, name="stgconv1")(
            x, use_running_average=deterministic)
        x = STGConvBlock(self.hidden_dim, self.kernel_size, name="stgconv2")(
            x, use_running_average=deterministic)
        x = x.reshape(B, -1)                            # (B, T*H)
        pred = nn.Dense(self.out_len * self.feature_size,
                        name="output_layer")(x)
        pred = pred.reshape(B, self.out_len, self.feature_size)
        return jnp.swapaxes(pred, 1, 2)                 # (B, 2, T_out)
