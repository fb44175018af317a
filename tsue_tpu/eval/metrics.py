"""Trajectory metrics: ADE/FDE and K-candidate minADE/minFDE/minRMSE.

Parity targets:
- ADE/FDE on denormalized coords: ref scripts/train.py:1318-1326
- K-candidate min metrics via MC dropout: ref scripts/test.py:1301-1382

TPU-first delta: the reference runs K sequential full-model forwards per
batch with host syncs between them (ref scripts/test.py:1327-1339); here the
K candidates are ONE ``vmap`` over explicit dropout keys — a single compiled
program with K batched forwards and zero host round-trips.  This is a large
share of the throughput win (SURVEY.md §7 levers).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from tsue_tpu.train.losses import denorm


def ade_fde(pred: jnp.ndarray, target: jnp.ndarray, norm_stat: jnp.ndarray,
            valid: jnp.ndarray | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean over samples of mean/final-step Euclidean error (pixel coords).

    pred/target: (B, 2, T) normalized; returns scalar (ade, fde).
    """
    pd = denorm(pred, norm_stat)
    gt = denorm(target, norm_stat)
    dist = jnp.sqrt(jnp.sum((pd - gt) ** 2, axis=1) + 1e-12)  # (B, T)
    per_ade = dist.mean(axis=1)
    per_fde = dist[:, -1]
    if valid is None:
        return per_ade.mean(), per_fde.mean()
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    return (per_ade * w).sum() / n, (per_fde * w).sum() / n


def candidate_rollout(apply_fn: Callable, variables, batch: Dict,
                      num_candidates: int, rng: jax.Array) -> jnp.ndarray:
    """K stochastic forwards as one vmap over dropout keys (strict parity).

    ``apply_fn(variables, batch, deterministic, rngs)`` must return
    (B, 2, T).  Returns (B, K, 2, T).  Explicit per-candidate keys replace
    the reference's ``model.train()``-inside-``no_grad`` global-dropout trick
    (ref scripts/test.py:1308-1309) — reproducible by construction.
    """
    keys = jax.random.split(rng, num_candidates)

    def one(key):
        return apply_fn(variables, batch, False, {"dropout": key})

    preds = jax.vmap(one)(keys)               # (K, B, 2, T)
    return jnp.swapaxes(preds, 0, 1)          # (B, K, 2, T)


def fast_candidate_rollout(model, variables, batch: Dict,
                           num_candidates: int, rng: jax.Array) -> jnp.ndarray:
    """Fast mode: the deterministic MLLM context is computed ONCE, only the
    stochastic forecaster is vmapped over K dropout keys (~9x fewer LLM
    FLOPs than strict parity; candidate diversity comes from the forecaster
    dropout, the part whose stochasticity drives the K-candidate metrics).
    model must be a TrajectoryModel (encode_context/forecast split)."""
    keys = jax.random.split(rng, num_candidates)
    cross_kv, mask, poly = model.apply(variables, batch, True,
                                       method=model.encode_context_kv)

    def one(key):
        return model.apply(variables, batch, cross_kv, mask, poly, False,
                           method=model.forecast_kv, rngs={"dropout": key})

    preds = jax.vmap(one)(keys)
    return jnp.swapaxes(preds, 0, 1)


def min_ade_fde_rmse(cands: jnp.ndarray, target: jnp.ndarray,
                     norm_stat: jnp.ndarray,
                     valid: jnp.ndarray | None = None):
    """Per-sample min over K candidates, averaged (ref scripts/test.py:1342-1376).

    cands: (B, K, 2, T) normalized; target: (B, 2, T).
    Returns (minADE, minFDE, minRMSE) scalars.
    """
    B, K, _, T = cands.shape
    pd = denorm(cands.reshape(B * K, 2, T), jnp.repeat(norm_stat, K, axis=0))
    pd = pd.reshape(B, K, 2, T)
    gt = denorm(target, norm_stat)[:, None]   # (B, 1, 2, T)
    sq = jnp.sum((pd - gt) ** 2, axis=2)      # (B, K, T)
    dist = jnp.sqrt(sq + 1e-12)
    ade_k = dist.mean(axis=2)                 # (B, K)
    fde_k = dist[:, :, -1]
    # ref divides the summed squared error by 2T (mean over coord AND time,
    # test.py:1370): sq already sums the coord axis, so halve before sqrt
    rmse_k = jnp.sqrt(sq.mean(axis=2) / 2.0 + 1e-12)
    mins = (ade_k.min(axis=1), fde_k.min(axis=1), rmse_k.min(axis=1))
    if valid is None:
        return tuple(m.mean() for m in mins)
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    return tuple((m * w).sum() / n for m in mins)
