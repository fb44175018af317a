"""Fused denormalize + trajectory-error reduction Pallas kernel.

Computes per-sample ADE and FDE in pixel coordinates in one pass — the
denormalization, squared error, sqrt, and horizon reduction never
materialize intermediates in HBM (the reference denormalizes whole tensors
then reduces, ref scripts/train.py:1306-1321).  XLA reference path =
tsue_tpu.eval.metrics.ade_fde (the parity target).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ade_fde_kernel(pred_ref, gt_ref, stat_ref, out_ref):
    pred = pred_ref[0].astype(jnp.float32)     # (2, T)
    gt = gt_ref[0].astype(jnp.float32)
    st = stat_ref[:].astype(jnp.float32)       # (1, 4) block
    mn = jnp.stack([st[0, 0], st[0, 2]])[:, None]
    mx = jnp.stack([st[0, 1], st[0, 3]])[:, None]
    rng = mx - mn
    d = (pred - gt) * rng                      # denorm difference
    dist = jnp.sqrt(jnp.sum(d * d, axis=0) + 1e-12)  # (T,)
    out_ref[0, 0] = jnp.mean(dist)
    out_ref[0, 1] = dist[-1]


def fused_ade_fde(pred: jnp.ndarray, gt: jnp.ndarray,
                  norm_stat: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """pred/gt (B,2,T) normalized, norm_stat (B,4) -> (B,2) [ade, fde]."""
    B, _, T = pred.shape
    return pl.pallas_call(
        _ade_fde_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2), jnp.float32),
        interpret=interpret,
    )(pred, gt, norm_stat)
