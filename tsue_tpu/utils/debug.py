"""Diagnostics: rank-aware debug printing, param counting, NaN probes.

Parity targets:
- ``debug_print`` rank-gated logger (ref modify_scripts/test.py:26-29)
- param counting harness (ref modify_scripts/check.py:1350-1418)
- NaN probes after fusion stages (ref scripts/modify_im_kim_train.py DEBUG
  insertions) — here as a jit-safe ``nan_probe`` via jax.debug.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def debug_print(*args, rank: int = 0, **kwargs):
    """Print only on the given process (default 0)."""
    if jax.process_index() == rank:
        print(*args, **kwargs, flush=True)


def count_params(params: Any, trainable_label_fn=None) -> Dict[str, int]:
    """Total / per-top-level-group / trainable parameter counts.

    ``trainable_label_fn(path_strs) -> "train"|"freeze"`` (e.g.
    tsue_tpu.train.trainer.freeze_label with a regime) splits the count the
    way the reference's check.py prints trainable params.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {"total": 0, "trainable": 0}
    groups: Dict[str, int] = {}
    for path, leaf in flat:
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        strs = tuple(str(getattr(p, "key", p)) for p in path)
        out["total"] += n
        groups[strs[0]] = groups.get(strs[0], 0) + n
        if trainable_label_fn is None or \
                trainable_label_fn(strs) == "train":
            out["trainable"] += n
    out["groups"] = groups
    return out


def nan_probe(x: jnp.ndarray, name: str):
    """jit-safe NaN/Inf detector: prints when non-finite values appear
    (the functional version of the reference's post-stage DEBUG prints)."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.lax.cond(
        bad,
        lambda: jax.debug.print("[nan_probe] {n}: NON-FINITE VALUES", n=name),
        lambda: None)
    return x
