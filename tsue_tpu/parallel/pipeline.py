"""Pipeline parallelism (GPipe-style) for the Llama decoder stack.

The reference has pure DP only (SURVEY.md §2.5 P3: no TP/PP/SP anywhere);
TP and FSDP already ship as config knobs (parallel/sharding.py).  This
module adds the third composable axis: **pipeline parallelism** over the
decoder depth, for models whose layer stack outgrows one chip even with
TP+FSDP.  TPU-native mechanics (nothing like the reference's NCCL DDP):

- the L decoder layers are stacked into one (S, L/S, ...) pytree whose
  leading dim is sharded over a ``pipe`` mesh axis — each device holds
  its stage's layers only;
- one ``shard_map`` program runs the classic GPipe schedule: a
  ``lax.scan`` over ``n_micro + S - 1`` ticks in which every stage
  applies its local layers (an inner ``lax.scan`` over the stacked
  slice) to the activation received from the previous stage and hands
  the result to the next via a circular ``lax.ppermute`` — the standard
  JAX SPMD pipeline pattern (scaling-book recipe: shardings + explicit
  collectives, no point-to-point sends);
- the fusion front-end (Q-Former + embeddings + modality embeddings)
  and the final norm / LM head stay replicated across ``pipe``; their
  gradient contributions land on the stages that actually consume them
  (embed on stage 0, head on stage S-1) and are summed with one
  ``psum`` over ``pipe`` — tied embeddings fall out naturally (embed
  and head cotangents merge in the same psum);
- composes with DP on a ("data", "pipe") mesh: microbatches are a
  reshape of each data shard, gradients are psum'd over ``data``.

Bubbles: the first/last S-1 ticks process placeholder inputs on some
stages; their outputs never reach the loss, so their cotangents are
exactly zero — correctness does not depend on masking the compute.

Semantics: the pipelined loss equals the single-device
``MultiModalLLM.lm_loss`` (token-weighted CE over the fused sequence)
up to f32 reduction order — pinned by tests/test_pipeline.py together
with one-optimizer-step parameter equivalence.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tsue_tpu.config import ExperimentConfig
from tsue_tpu.models.llama import (LlamaLayer, RMSNorm, _remat_policy,
                                   causal_lm_ce_sum_chunked, rope_inv_freq)

IGNORE_LABEL = -100


def make_pipeline_mesh(pipeline_parallel: int, devices=None) -> Mesh:
    """("data", "pipe") mesh: DP outer, pipeline stages inner (adjacent
    device ids per pipeline so stage hops ride neighbor ICI links)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % pipeline_parallel != 0:
        raise ValueError(f"pipeline_parallel={pipeline_parallel} must "
                         f"divide device count {n}")
    arr = np.asarray(devices).reshape(n // pipeline_parallel,
                                      pipeline_parallel)
    return Mesh(arr, axis_names=("data", "pipe"))


def _num_layers(model_params) -> int:
    return sum(1 for k in model_params if str(k).startswith("layer_"))


def split_llama_layers(params, n_stages: int) -> Tuple[Dict, Dict]:
    """MLLM param tree -> (outer, layers).

    ``outer`` is the tree with the llama decoder layers removed (fusion
    front-end, embeddings, final norm, untied head); ``layers`` is the
    per-layer trees stacked into leaves of shape (S, L/S, ...) whose
    leading dim is the pipeline stage.
    """
    model = dict(params["llama"]["model"])
    L = _num_layers(model)
    if L % n_stages != 0:
        raise ValueError(f"num_layers={L} must divide into "
                         f"{n_stages} pipeline stages")
    per_layer = [model.pop(f"layer_{i}") for i in range(L)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    layers = jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, L // n_stages, *x.shape[1:]), stacked)
    outer = dict(params)
    outer["llama"] = dict(params["llama"])
    outer["llama"]["model"] = model
    return outer, layers


def join_llama_layers(outer: Dict, layers: Dict) -> Dict:
    """Inverse of :func:`split_llama_layers` (checkpoint export: stage-1
    artifacts keep the standard per-layer tree, import_mllm-compatible)."""
    leaves = jax.tree_util.tree_leaves(layers)
    S, Lp = leaves[0].shape[0], leaves[0].shape[1]
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape(S * Lp, *x.shape[2:]), layers)
    model = dict(outer["llama"]["model"])
    for i in range(S * Lp):
        model[f"layer_{i}"] = jax.tree_util.tree_map(lambda x: x[i], flat)
    params = dict(outer)
    params["llama"] = dict(outer["llama"])
    params["llama"]["model"] = model
    return params


def place_pipeline_params(pp_params: Dict, mesh: Mesh) -> Dict:
    """device_put: layer stack sharded over ``pipe``, the rest replicated."""
    return {
        "outer": jax.device_put(
            pp_params["outer"], NamedSharding(mesh, P())),
        "layers": jax.device_put(
            pp_params["layers"], NamedSharding(mesh, P("pipe"))),
    }


def make_pipelined_lm_loss(mllm, mesh: Mesh, num_microbatches: int,
                           deterministic: bool = True):
    """Build ``loss(pp_params, batch, rng) -> scalar``: the stage-1 LM
    loss (``MultiModalLLM.lm_loss`` semantics) under the GPipe schedule.

    ``batch`` holds the standard (B, ...) stage-1 arrays; B must be
    divisible by ``num_microbatches * mesh.shape['data']``.  The returned
    function is shard_map'd over ``mesh`` and fully differentiable
    (grad of ppermute is the reverse ppermute; replicated inputs get
    their cotangents psum'd by the shard_map transpose).
    """
    cfg = mllm.llama
    S = mesh.shape["pipe"]
    n_micro = num_microbatches
    n_img = mllm.qformer.num_query_tokens if mllm.use_vision else 0
    inv_freq = rope_inv_freq(cfg)
    layer_cls = LlamaLayer
    if cfg.remat:
        layer_cls = nn.remat(LlamaLayer, static_argnums=(5, 8),
                             policy=_remat_policy(cfg.remat_policy))
    layer_mod = layer_cls(cfg, mllm.dtype)
    norm_mod = RMSNorm(cfg.rms_norm_eps)

    def head_fn(outer, h):
        if cfg.tie_word_embeddings:
            w = outer["llama"]["model"]["embed_tokens"]["embedding"].T
        else:
            w = outer["llama"]["lm_head"]["kernel"]
        return jnp.dot(h, w.astype(h.dtype),
                       preferred_element_type=jnp.float32)

    def ce_sum(outer, hidden, labels):
        """Masked next-token CE (sum, count) — causal_lm_loss math kept
        per-token-sum so microbatch/DP shards combine exactly.  Honors
        ``cfg.loss_chunk`` (models/llama.py causal_lm_ce_sum_chunked): at
        real vocab the dense (B, T, 128256) f32 logits would otherwise be
        materialized on EVERY pipe stage (only the last stage's sum
        survives the psum, but the buffers live on all of them)."""
        if cfg.loss_chunk:
            return causal_lm_ce_sum_chunked(
                hidden, labels, lambda h: head_fn(outer, h), cfg.loss_chunk)
        logits = head_fn(outer, hidden[:, :-1]).astype(jnp.float32)
        y = labels[:, 1:]
        valid = y != IGNORE_LABEL
        safe = jnp.where(valid, y, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tok = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        return ((logz - tok) * valid).sum(), valid.sum()

    def shard_fn(pp_params, vision, input_ids, attention_mask, labels,
                 rng):
        # local shapes: (n_micro, bm, ...) — data axis already split
        outer = pp_params["outer"]
        local_layers = jax.tree_util.tree_map(
            lambda x: x[0], pp_params["layers"])         # (L/S, ...)
        stage = jax.lax.axis_index("pipe")
        nm, bm = input_ids.shape[0], input_ids.shape[1]
        # decorrelate dropout across data shards: rng arrives replicated
        # (in_spec P()), so without this every DP shard would draw the
        # same mask pattern for its local block each step
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))

        # fusion front-end for every microbatch at once (replicated over
        # pipe; only stage 0 consumes the result)
        flat = lambda x: x.reshape(nm * bm, *x.shape[2:])
        rngs = (None if deterministic
                else {"dropout": jax.random.fold_in(rng, 0)})
        fused, fmask, _ = mllm.apply(
            {"params": outer}, flat(vision), flat(input_ids),
            flat(attention_mask), deterministic, method=mllm.fuse,
            rngs=rngs)
        Pf, D = fused.shape[1], fused.shape[2]
        emb = fused.reshape(nm, bm, Pf, D)
        fmask = fmask.reshape(nm, bm, Pf)
        pos = jnp.maximum(jnp.cumsum(fmask, axis=-1) - 1, 0)
        if n_img:
            pad = jnp.full((nm, bm, n_img), IGNORE_LABEL, labels.dtype)
            labels = jnp.concatenate([pad, labels], axis=-1)

        def apply_stage(x, m, p, key):
            def body(h, xs):
                lp, k = xs
                lr = None if deterministic else {"dropout": k}
                h, _ = layer_mod.apply(
                    {"params": lp}, h, m.astype(bool), p, inv_freq,
                    deterministic, None, None, False, rngs=lr)
                return h, None
            n_local = jax.tree_util.tree_leaves(local_layers)[0].shape[0]
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(n_local))
            y, _ = jax.lax.scan(body, x, (local_layers, keys))
            return y

        def tick(carry, t):
            recv, outputs = carry
            # stage s works on microbatch t - s at tick t
            idx = jnp.clip(t - stage, 0, n_micro - 1)
            x_in = jax.lax.dynamic_index_in_dim(
                emb, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
            x = jnp.where(stage == 0, x_in, recv)
            m = jax.lax.dynamic_index_in_dim(fmask, idx, 0, keepdims=False)
            p = jax.lax.dynamic_index_in_dim(pos, idx, 0, keepdims=False)
            key = jax.random.fold_in(jax.random.fold_in(rng, 1), t)
            key = jax.random.fold_in(key, stage)
            y = apply_stage(x, m, p, key)
            # the last stage finished microbatch t - (S - 1)
            oidx = t - (S - 1)
            safe_o = jnp.clip(oidx, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, safe_o, 0,
                                               keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(oidx >= 0, y, cur), safe_o, 0)
            recv = jax.lax.ppermute(
                y, "pipe", [(i, (i + 1) % S) for i in range(S)])
            return (recv, outputs), None

        init = (jnp.zeros((bm, Pf, D), emb.dtype),
                jnp.zeros((nm, bm, Pf, D), emb.dtype))
        (_, outputs), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + S - 1))

        hidden = norm_mod.apply(
            {"params": outer["llama"]["model"]["final_norm"]},
            outputs.reshape(nm * bm, Pf, D))
        s, cnt = ce_sum(outer, hidden, labels.reshape(nm * bm, -1))
        # only the last stage holds real outputs; broadcast its sum
        s = jax.lax.psum(jnp.where(stage == S - 1, s, 0.0), "pipe")
        s = jax.lax.psum(s, "data")
        cnt = jax.lax.psum(cnt, "data")    # labels replicated over pipe
        return s / jnp.maximum(cnt, 1)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=({"outer": P(), "layers": P("pipe")},
                  P(None, "data"), P(None, "data"), P(None, "data"),
                  P(None, "data"), P()),
        out_specs=P(), check_vma=False)

    def loss(pp_params, batch: Dict, rng) -> jnp.ndarray:
        dp = mesh.shape["data"]
        B = batch["input_ids"].shape[0]
        if B % (n_micro * dp) != 0:
            raise ValueError(
                f"batch {B} must be divisible by microbatches*dp ="
                f" {n_micro}*{dp}")
        mb = lambda x: x.reshape(n_micro, B // n_micro, *x.shape[1:])
        vision = batch.get("vision")
        if vision is None:           # no-vision ablation: text only
            vision = jnp.zeros((B, 1, 1), jnp.float32)
        return mapped(pp_params, mb(vision), mb(batch["input_ids"]),
                      mb(batch["attention_mask"]), mb(batch["labels"]),
                      rng)

    return loss


def _pp_freeze_label(path_strs, regime: str) -> str:
    """Stage-1 freeze semantics on the pp tree: the ``layers`` stack IS
    the base llama (only LoRA leaves train); ``outer`` keeps its original
    paths so the standard rule applies (train/stage1.py)."""
    from tsue_tpu.train.stage1 import stage1_freeze_label
    if regime == "joint":
        return "train"
    if path_strs and path_strs[0] == "layers":
        return "train" if any("lora" in p for p in path_strs) else "freeze"
    return stage1_freeze_label(path_strs[1:], regime)


def make_pipelined_stage1_step(mllm, cfg: ExperimentConfig, mesh: Mesh,
                               num_microbatches: int, pp_params: Dict,
                               regime: str = "lora_only"):
    """(init, train_step, eval_step) for the pipelined stage-1 fine-tune.

    ``pp_params`` (the {"outer": ..., "layers": ...} layout from
    :func:`split_llama_layers`) is consumed at factory time to build the
    freeze-masked optimizer eagerly — no init-before-train_step ordering
    contract; ``init(pp_params)`` just returns the optimizer state.
    ``train_step(pp_params, opt_state, batch, rng)`` mirrors
    train/stage1.py's step contract on the pipeline layout.
    """
    import optax

    from tsue_tpu.train.stage1 import make_stage1_optimizer

    loss_train = make_pipelined_lm_loss(mllm, mesh, num_microbatches,
                                        deterministic=False)
    loss_eval = make_pipelined_lm_loss(mllm, mesh, num_microbatches,
                                       deterministic=True)
    tx = make_stage1_optimizer(
        cfg, pp_params,
        label_fn=lambda path_strs: _pp_freeze_label(path_strs, regime))

    def train_step(pp_params, opt_state, batch: Dict, rng):
        loss, grads = jax.value_and_grad(loss_train)(pp_params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, pp_params)
        pp_params = optax.apply_updates(pp_params, updates)
        return pp_params, opt_state, {"lm_loss": loss}

    def eval_step(pp_params, batch: Dict):
        return {"lm_loss": loss_eval(pp_params, batch, jax.random.key(0))}

    return tx.init, jax.jit(train_step), jax.jit(eval_step)
