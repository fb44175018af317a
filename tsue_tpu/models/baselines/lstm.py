"""LSTM baselines: CS-LSTM (B2) and Social-LSTM (B3).

Parity targets: ref scripts/baseline_cs_lstm.py:192-248 (2-layer LSTM
encoder-decoder, teacher forcing in training, autoregressive at test) and
ref scripts/baseline_sociallstm.py:193-250 (embed -> 1-layer LSTM -> FC to
the whole horizon).

TPU-first: the torch per-step Python decode loop becomes ``lax.scan`` over
``nn.OptimizedLSTMCell`` — one compiled program for the whole rollout.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class _StackedLSTM(nn.Module):
    """N stacked LSTM cells scanned over time."""
    hidden_dim: int
    num_layers: int

    def setup(self):
        self.cells = [nn.OptimizedLSTMCell(self.hidden_dim, name=f"cell_{i}")
                      for i in range(self.num_layers)]

    def init_carry(self, rng, batch_size):
        # initialize_carry wants (batch..., features); carry shape only
        # depends on the batch dims + hidden_dim
        return [cell.initialize_carry(rng, (batch_size, 1))
                for cell in self.cells]

    def step(self, carries, x):
        """One timestep through the stack; returns (new_carries, top_out)."""
        new_carries = []
        h = x
        for cell, carry in zip(self.cells, carries):
            carry, h = cell(carry, h)
            new_carries.append(carry)
        return new_carries, h

    def __call__(self, xs, carries=None):
        """xs: (B, T, F) -> (outputs (B, T, H), final carries)."""
        B = xs.shape[0]
        if carries is None:
            carries = self.init_carry(jax.random.key(0), B)

        def body(carries, x_t):
            carries, h = self.step(carries, x_t)
            return carries, h

        carries, outs = nn.scan(
            lambda mdl, c, x: mdl.step(c, x),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)(self, carries, xs)
        return outs, carries


class CSLSTM(nn.Module):
    """2-layer LSTM encoder-decoder (ref scripts/baseline_cs_lstm.py:192-248)."""
    seq_len: int
    out_len: int
    feature_size: int = 2
    hidden_dim: int = 128
    num_layers: int = 2

    def setup(self):
        self.encoder = _StackedLSTM(self.hidden_dim, self.num_layers,
                                    name="encoder")
        self.decoder = _StackedLSTM(self.hidden_dim, self.num_layers,
                                    name="decoder")
        self.fc = nn.Dense(self.feature_size, name="fc")

    def __call__(self, batch: dict, deterministic: bool = True,
                 teacher: Optional[jnp.ndarray] = None):
        """batch["traj_in"]: (B, 2, T_in); teacher: (B, 2, T_out) for
        teacher-forced training. Returns (B, 2, T_out)."""
        x = jnp.swapaxes(batch["traj_in"], 1, 2)      # (B, T, 2)
        B = x.shape[0]
        _, carries = self.encoder(x)
        first_in = x[:, -1, :]                        # (B, 2)

        if teacher is not None:
            # teacher forcing: decoder inputs are [last_in, y_0..y_{T-2}]
            y = jnp.swapaxes(teacher, 1, 2)           # (B, T_out, 2)
            dec_in = jnp.concatenate([first_in[:, None, :], y[:, :-1, :]],
                                     axis=1)
            outs, _ = self.decoder(dec_in, carries)
            preds = self.fc(outs)                     # (B, T_out, 2)
        else:
            # autoregressive rollout under scan
            def body(mdl, carry, _):
                carries, prev = carry
                carries, h = mdl.decoder.step(carries, prev)
                pred = mdl.fc(h)
                return (carries, pred), pred

            (_, _), preds = nn.scan(
                body, variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=1,
                length=self.out_len)(self, (carries, first_in), None)
        return jnp.swapaxes(preds, 1, 2)              # (B, 2, T_out)


class SocialLSTM(nn.Module):
    """Embed -> LSTM -> FC to horizon (ref scripts/baseline_sociallstm.py:193-250)."""
    seq_len: int
    out_len: int
    feature_size: int = 2
    embedding_dim: int = 64
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True,
                 teacher: Optional[jnp.ndarray] = None):
        x = jnp.swapaxes(batch["traj_in"], 1, 2)      # (B, T, 2)
        emb = nn.Dense(self.embedding_dim, name="embedding")(x)
        outs, _ = _StackedLSTM(self.hidden_dim, 1, name="lstm")(emb)
        h_last = outs[:, -1, :]
        pred = nn.Dense(self.out_len * self.feature_size, name="fc")(h_last)
        pred = pred.reshape(-1, self.out_len, self.feature_size)
        return jnp.swapaxes(pred, 1, 2)
