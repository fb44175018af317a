"""MMTrans baseline (B6; ref scripts/baseline_mmtrans.py:210-287).

Two-modality transformer: trajectory and lane-polygon point sequences
separately embedded + sinusoidal positional encoding, concatenated, encoded
by a 4-layer post-LN transformer with a key-padding mask over zero lane
points, decoded from the trajectory positions by a flatten+FC head.

The lane input is the window-normalized polygon (data variant D15,
ref scripts/baseline_mmtrans.py:96-207): polygon pixel coords normalized by
the window's min/max, computed on the fly from batch["polygon"] and
batch["norm_stat"] — no separate dataset build needed.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.models.layers import EncoderBlock


def sinusoidal_pos_encoding(max_len: int, d_model: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def normalize_polygon(polygon: jnp.ndarray, polygon_len: jnp.ndarray,
                      norm_stat: jnp.ndarray) -> jnp.ndarray:
    """(B, P, 2) raw px -> window-normalized coords; invalid points -> 0."""
    ns = norm_stat
    mins = jnp.stack([ns[:, 0], ns[:, 2]], axis=1)[:, None, :]   # (B,1,2)
    rng = jnp.stack([ns[:, 1] - ns[:, 0], ns[:, 3] - ns[:, 2]],
                    axis=1)[:, None, :]
    rng = jnp.where(jnp.abs(rng) < 1e-6, 1.0, rng)
    out = (polygon - mins) / rng
    valid = (jnp.arange(polygon.shape[1])[None, :]
             < polygon_len[:, None])[..., None]
    return jnp.where(valid, out, 0.0)


class MMTrans(nn.Module):
    seq_len: int
    out_len: int
    feature_size: int = 2
    d_model: int = 128
    n_heads: int = 8
    n_layers: int = 4
    dropout: float = 0.1
    max_len: int = 100

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True,
                 teacher: Optional[jnp.ndarray] = None):
        traj = jnp.swapaxes(batch["traj_in"], 1, 2)      # (B, T_in, 2)
        lane = normalize_polygon(batch["polygon"], batch["polygon_len"],
                                 batch["norm_stat"])      # (B, P, 2)
        B, T_in, _ = traj.shape
        P = lane.shape[1]
        pe = jnp.asarray(sinusoidal_pos_encoding(self.max_len, self.d_model))
        temb = nn.Dense(self.d_model, name="traj_embedding")(traj) + pe[None, :T_in]
        lemb = nn.Dense(self.d_model, name="lane_embedding")(lane) + pe[None, :P]
        x = jnp.concatenate([temb, lemb], axis=1)        # (B, T_in+P, d)
        # key mask: all traj positions + nonzero lane points (ref :258-261)
        lane_valid = jnp.sum(jnp.abs(lane), axis=-1) != 0
        key_mask = jnp.concatenate(
            [jnp.ones((B, T_in), bool), lane_valid], axis=1)
        for i in range(self.n_layers):
            x = EncoderBlock(self.d_model, self.n_heads, dropout=self.dropout,
                             name=f"enc_{i}")(x, key_mask=key_mask,
                                              deterministic=deterministic)
        x = x[:, :self.seq_len].reshape(B, -1)
        pred = nn.Dense(self.out_len * self.feature_size, name="decoder")(x)
        pred = pred.reshape(B, self.out_len, self.feature_size)
        return jnp.swapaxes(pred, 1, 2)
