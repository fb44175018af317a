"""Constant-velocity baseline (ref scripts/baseline_cv.py:186-239, B1).

The reference builds K candidates with nested Python loops over candidates
and horizon steps; here the whole (B, K, 2, T_out) tensor is one broadcasted
expression — no loops, one XLA kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cv_candidates(x: jnp.ndarray, out_len: int, rng: jax.Array | None = None,
                  num_candidates: int = 1,
                  noise_scale: float = 0.1) -> jnp.ndarray:
    """(B, 2, T_in) -> (B, K, 2, T_out); candidate 0 is noise-free when
    rng is None."""
    B, C, T = x.shape
    last = x[:, :, -1]                     # (B, 2)
    vel = last - x[:, :, -2]               # (B, 2)
    if rng is not None:
        noise = jax.random.normal(rng, (B, num_candidates, C)) * noise_scale
    else:
        noise = jnp.zeros((B, num_candidates, C))
    v = vel[:, None, :] + noise            # (B, K, 2)
    steps = jnp.arange(1, out_len + 1, dtype=x.dtype)   # (T_out,)
    return last[:, None, :, None] + v[..., None] * steps  # (B, K, 2, T_out)
