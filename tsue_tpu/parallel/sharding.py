"""Parameter partition rules: DP + tensor-parallel (+ optional FSDP)
Llama over a 2-D mesh.

The reference has pure DP only (SURVEY.md §2.5 P1-P3).  Parity needs no TP
(the 1B Llama fits one v5e chip), but the framework ships Megatron-style TP
as a config knob: attention q/k/v split by heads (output dim), o_proj split
on the input dim, MLP gate/up split on output, down on input, embedding
split on the feature dim.  ``fsdp=True`` additionally shards every large
param's biggest free dim along the data axis (ZeRO-3: params, grads and —
via zeros_like inheritance — the Adam moments all live sharded; XLA
all-gathers each layer's weights on use and reduce-scatters its grads).
XLA inserts every collective over ICI from these shardings alone — there
is no hand-written collective here.
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
    # int8 decode collection (ops/quant.py): w8 shards like its bf16
    # kernel twin; the per-output-channel scale shards with the OUTPUT
    # dim — "model" where the output dim is split (q/k/v/gate/up),
    # replicated where the contraction dim is split (o/down: the psum'd
    # output is whole on every shard, default P() covers it).
    (("q_proj", "w8"), P(None, "model")),
    (("k_proj", "w8"), P(None, "model")),
    (("v_proj", "w8"), P(None, "model")),
    (("o_proj", "w8"), P("model", None)),
    (("gate_proj", "w8"), P(None, "model")),
    (("up_proj", "w8"), P(None, "model")),
    (("down_proj", "w8"), P("model", None)),
    (("q_proj", "scale"), P("model")),
    (("k_proj", "scale"), P("model")),
    (("v_proj", "scale"), P("model")),
    (("gate_proj", "scale"), P("model")),
    (("up_proj", "scale"), P("model")),
    # the (D, V) LM-head int8 table splits the contraction dim D, the
    # same feature axis the tied embed_tokens/embedding splits — logits
    # come out of a psum of partial (B, V) products; the per-vocab-row
    # scale (V,) stays replicated (512 KB f32 at the real vocab).
    (("lm_head_w8",), P("model", None)),
)


def param_spec(path_strs: Tuple[str, ...], ndim: int) -> P:
    """PartitionSpec for a param path; replicated unless a TP rule matches."""
    for (suffix, spec) in _TP_RULES:
        if len(path_strs) >= len(suffix) and \
                tuple(path_strs[-len(suffix):]) == suffix and \
                ndim == len([s for s in spec]):
            return spec
    return P()


# params smaller than this stay replicated under FSDP (norm scales,
# biases, LoRA adapters): sharding them saves nothing and adds a
# collective per use
_FSDP_MIN_SIZE = 2 ** 16


def _fsdp_augment(spec: P, shape, mesh: Mesh,
                  min_size: int = _FSDP_MIN_SIZE) -> P:
    """ZeRO-3-style augmentation: put the largest still-unsharded,
    divisible dim of a big param on the data axis.  Composes with TP
    (e.g. q_proj kernel P(None, "model") -> P("data", "model"));
    optimizer moments inherit the same placement because optax builds
    them with zeros_like over already-placed params."""
    data = mesh.shape.get("data", 1)
    size = 1
    for d in shape:
        size *= d
    if data <= 1 or size < min_size:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(tuple(spec)))
    for dim in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if entries[dim] is None and shape[dim] % data == 0 \
                and shape[dim] >= data:
            entries[dim] = "data"
            return P(*entries)
    return spec


def _resolve(path, x, mesh: Mesh, fsdp: bool, min_size: int) -> P:
    strs = tuple(str(getattr(p, "key", p)) for p in path)
    spec = param_spec(strs, x.ndim)
    # divisibility guard: fall back to replication when the axis size
    # does not divide (e.g. tiny test configs on large meshes)
    for dim, axis in enumerate(spec):
        if axis is not None and \
                x.shape[dim] % mesh.shape.get(axis, 1) != 0:
            spec = P()
            break
    if fsdp:
        spec = _fsdp_augment(spec, x.shape, mesh, min_size)
    return spec


def shard_params(params, mesh: Mesh, fsdp: bool = False,
                 fsdp_min_size: int = _FSDP_MIN_SIZE):
    """device_put every param leaf with its TP/FSDP/replicated
    NamedSharding (``fsdp``: see MeshConfig.fsdp; ``fsdp_min_size``
    lowers the big-param threshold, e.g. for tiny-config dryruns)."""
    def place(path, x):
        return jax.device_put(
            x, NamedSharding(mesh, _resolve(path, x, mesh, fsdp,
                                            fsdp_min_size)))
    return jax.tree_util.tree_map_with_path(place, params)


def tree_shardings(tree, mesh: Mesh, fsdp: bool = False,
                   fsdp_min_size: int = _FSDP_MIN_SIZE):
    """The NamedSharding pytree matching ``shard_params`` placement."""
    def spec_of(path, x):
        return NamedSharding(mesh, _resolve(path, x, mesh, fsdp,
                                            fsdp_min_size))
    return jax.tree_util.tree_map_with_path(spec_of, tree)
