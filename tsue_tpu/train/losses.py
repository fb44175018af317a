"""Loss and denormalization as pure functions.

The reference computes the denormalized-MSE loss inside the model forward
(ref scripts/train.py:945-961).  Pixel coordinates reach ~3840 so the squared
error has large dynamic range — everything here is forced to float32
regardless of the model compute dtype (SURVEY.md §7 numerics note).
"""
from __future__ import annotations

import jax.numpy as jnp


def denorm(traj: jnp.ndarray, norm_stat: jnp.ndarray) -> jnp.ndarray:
    """Map normalized (B, 2, T) back to pixel coords using (B, 4) min/max
    [min_x, max_x, min_y, max_y] (ref scripts/train.py:947-957)."""
    traj = traj.astype(jnp.float32)
    ns = norm_stat.astype(jnp.float32)
    min_xy = jnp.stack([ns[:, 0], ns[:, 2]], axis=1)[:, :, None]  # (B,2,1)
    max_xy = jnp.stack([ns[:, 1], ns[:, 3]], axis=1)[:, :, None]
    return traj * (max_xy - min_xy) + min_xy


def denorm_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    norm_stat: jnp.ndarray,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """MSE_x + MSE_y on denormalized coords (ref scripts/train.py:959-961).

    ``valid`` (B,) masks wrap-around padding rows from the batch iterator.
    """
    pd = denorm(pred, norm_stat)
    gt = denorm(target, norm_stat)
    se = (pd - gt) ** 2                       # (B, 2, T)
    if valid is None:
        return se[:, 0].mean() + se[:, 1].mean()
    w = valid.astype(jnp.float32)[:, None]    # (B, 1)
    denom = jnp.maximum(w.sum() * se.shape[2], 1.0)
    return (se[:, 0] * w).sum() / denom + (se[:, 1] * w).sum() / denom
