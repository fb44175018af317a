"""GAIL baseline (B7; ref scripts/baseline_GAIL.py:193-247).

MLP generator (flattened history -> hidden 128 -> horizon, optional output
noise) + MLP discriminator over [x || y] with sigmoid output; the
alternating BCE training step lives in tsue_tpu.train.baseline_steps.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GAILGenerator(nn.Module):
    seq_len: int
    out_len: int
    feature_size: int = 2
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True,
                 teacher: Optional[jnp.ndarray] = None,
                 noise_scale: float = 0.0):
        x = jnp.swapaxes(batch["traj_in"], 1, 2)   # (B, T, 2)
        B = x.shape[0]
        h = x.reshape(B, -1)
        h = nn.relu(nn.Dense(self.hidden_dim, name="enc1")(h))
        h = nn.relu(nn.Dense(self.hidden_dim, name="enc2")(h))
        h = nn.relu(nn.Dense(self.hidden_dim, name="dec1")(h))
        out = nn.Dense(self.out_len * self.feature_size, name="dec2")(h)
        out = out.reshape(B, self.out_len, self.feature_size)
        if noise_scale > 0:
            out = out + noise_scale * jax.random.normal(
                self.make_rng("noise"), out.shape)
        return jnp.swapaxes(out, 1, 2)             # (B, 2, T_out)


class GAILDiscriminator(nn.Module):
    seq_len: int
    out_len: int
    feature_size: int = 2
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray):
        """x: (B, 2, T_in), y: (B, 2, T_out) -> probability (B, 1)."""
        B = x.shape[0]
        flat = jnp.concatenate(
            [jnp.swapaxes(x, 1, 2).reshape(B, -1),
             jnp.swapaxes(y, 1, 2).reshape(B, -1)], axis=1)
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(flat))
        h = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(h))
        return nn.sigmoid(nn.Dense(1, name="fc3")(h))
