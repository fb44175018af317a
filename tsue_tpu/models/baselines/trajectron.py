"""Trajectron++-style VAE baseline (B5; ref scripts/baseline_trajtron.py:192-245).

LSTM encoder -> latent (mu, logvar) -> reparameterized z -> LSTM decoder
over [last-input || z] repeated across the horizon -> FC.  Loss (in
tsue_tpu.train.baseline_steps) = denorm MSE + 0.1 * KL.

The latent sample uses the explicit "latent" RNG stream — the K-candidate
eval draws K different z's reproducibly (the reference relies on global
torch randomness, ref scripts/test_baseline_trajtron.py:210-482).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.models.baselines.lstm import _StackedLSTM


class TrajectronPP(nn.Module):
    seq_len: int
    out_len: int
    feature_size: int = 2
    hidden_dim: int = 128
    latent_dim: int = 32

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True,
                 teacher: Optional[jnp.ndarray] = None,
                 return_latent: bool = False):
        x = jnp.swapaxes(batch["traj_in"], 1, 2)        # (B, T, 2)
        B = x.shape[0]
        outs, _ = _StackedLSTM(self.hidden_dim, 1, name="encoder_lstm")(x)
        h = outs[:, -1, :]
        mu = nn.Dense(self.latent_dim, name="fc_mu")(h)
        logvar = nn.Dense(self.latent_dim, name="fc_logvar")(h)
        if deterministic:
            z = mu
        else:
            eps = jax.random.normal(self.make_rng("latent"), mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
        z_seq = jnp.repeat(z[:, None, :], self.out_len, axis=1)
        last = jnp.repeat(x[:, -1:, :], self.out_len, axis=1)
        dec_in = jnp.concatenate([last, z_seq], axis=-1)
        dec_out, _ = _StackedLSTM(self.hidden_dim, 1, name="decoder_lstm")(dec_in)
        pred = nn.Dense(self.feature_size, name="output_layer")(dec_out)
        pred = jnp.swapaxes(pred, 1, 2)                 # (B, 2, T_out)
        if return_latent:
            return pred, (mu, logvar)
        return pred


def kl_divergence(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) / B (ref :241-242)."""
    B = mu.shape[0]
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar)) / B
