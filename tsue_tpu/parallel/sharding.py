"""Parameter partition rules: DP + tensor-parallel Llama over a 2-D mesh.

The reference has pure DP only (SURVEY.md §2.5 P1-P3).  Parity needs no TP
(the 1B Llama fits one v5e chip), but the framework ships Megatron-style TP
as a config knob: attention q/k/v split by heads (output dim), o_proj split
on the input dim, MLP gate/up split on output, down on input, embedding
split on the feature dim.  XLA inserts the all-reduces over ICI from these
shardings alone — there is no hand-written collective here.
"""
from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (param-path substring match, PartitionSpec) — first hit wins.
_TP_RULES: Tuple[Tuple[Tuple[str, ...], P], ...] = (
    (("q_proj", "kernel"), P(None, "model")),
    (("k_proj", "kernel"), P(None, "model")),
    (("v_proj", "kernel"), P(None, "model")),
    (("o_proj", "kernel"), P("model", None)),
    (("gate_proj", "kernel"), P(None, "model")),
    (("up_proj", "kernel"), P(None, "model")),
    (("down_proj", "kernel"), P("model", None)),
    (("q_proj", "lora_b"), P(None, "model")),
    (("k_proj", "lora_b"), P(None, "model")),
    (("v_proj", "lora_b"), P(None, "model")),
    (("o_proj", "lora_a"), P("model", None)),
    (("embed_tokens", "embedding"), P(None, "model")),
)


def param_spec(path_strs: Tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for a param path; replicated unless a TP rule matches."""
    for (suffix, spec) in _TP_RULES:
        if len(path_strs) >= len(suffix) and \
                tuple(path_strs[-len(suffix):]) == suffix and \
                ndim == len([s for s in spec]):
            return spec
    return P()


def shard_params(params, mesh: Mesh):
    """device_put every param leaf with its TP/replicated NamedSharding."""
    def place(path, x):
        strs = tuple(str(getattr(p, "key", p)) for p in path)
        spec = param_spec(strs, x.ndim)
        # divisibility guard: fall back to replication when the axis size
        # does not divide (e.g. tiny test configs on large meshes)
        for dim, axis in enumerate(spec):
            if axis is not None and \
                    x.shape[dim] % mesh.shape.get(axis, 1) != 0:
                return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def tree_shardings(tree, mesh: Mesh):
    """The NamedSharding pytree matching ``shard_params`` placement."""
    def spec_of(path, x):
        strs = tuple(str(getattr(p, "key", p)) for p in path)
        spec = param_spec(strs, x.ndim)
        for dim, axis in enumerate(spec):
            if axis is not None and \
                    x.shape[dim] % mesh.shape.get(axis, 1) != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(spec_of, tree)
