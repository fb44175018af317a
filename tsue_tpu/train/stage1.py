"""Stage-1 MLLM fine-tuning: causal-LM loss over fused [img || text].

The reference ships only the evaluation harness for this stage
(ref scripts/check_generation.py; the training loop that produced
``mllm_lora_ddp_finetuned.pt`` is not in the repo).  This module supplies
the missing trainer with the same artifact contract: AdamW on the LoRA +
Q-Former + modality embeddings (base Llama frozen), best-val checkpointing
via ``export_mllm``-compatible params.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from tsue_tpu.config import ExperimentConfig


def stage1_freeze_label(path_strs, regime: str = "lora_only") -> str:
    """Stage-1 default: train LoRA + everything outside the base Llama."""
    in_llama = any(p == "llama" for p in path_strs)
    is_lora = any("lora" in p for p in path_strs)
    if regime == "joint":
        return "train"
    if in_llama and not is_lora:
        return "freeze"
    return "train"


def make_stage1_optimizer(cfg: ExperimentConfig, params, label_fn=None):
    """AdamW + clip + freeze-mask + NaN guard.  ``label_fn(path_strs) ->
    "train"|"freeze"`` overrides the default stage-1 freeze rule (used by
    the pipelined path, whose param tree has a different layout)."""
    label_fn = label_fn or stage1_freeze_label
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: label_fn(
            tuple(str(getattr(p, "key", p)) for p in path)),
        params)
    inner = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip or 1.0),
        optax.adamw(cfg.train.lr, weight_decay=cfg.train.weight_decay))
    if cfg.train.nan_guard:
        # guard INSIDE the "train" branch: wrapping the whole
        # multi_transform would make the finiteness check consume every
        # FROZEN gradient too, keeping the frozen base's dW matmuls alive
        # against XLA DCE (measured on the bs8 stage-1 step — see
        # scripts/ab_frozen_dce.py / PARITY.md).  A non-finite loss still
        # reaches the trainable grads, so skip-bad-step is identical.
        # (Probe reformulations measured a wash — train/guard.py,
        # PARITY.md "Joint train-step profile".)
        inner = optax.apply_if_finite(inner, max_consecutive_errors=100)
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels)


def make_stage1_train_step(mllm, tx):
    """(params, opt_state, batch, rng) -> (params, opt_state, metrics).

    Loss = masked causal LM CE over [img-span(-100) || prompt(-100) ||
    answer] (ref scripts/check_generation.py:131-150 semantics).
    """
    def loss_fn(params, batch, rng):
        return mllm.apply(
            {"params": params}, batch.get("vision"), batch["input_ids"],
            batch["attention_mask"], batch["labels"], False,
            rngs={"dropout": rng}, method=mllm.lm_loss)

    def step(params, opt_state, batch: Dict, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"lm_loss": loss}

    return step


def make_stage1_eval_step(mllm):
    def step(params, batch: Dict):
        loss = mllm.apply(
            {"params": params}, batch.get("vision"), batch["input_ids"],
            batch["attention_mask"], batch["labels"], True,
            method=mllm.lm_loss)
        return {"lm_loss": loss}
    return step
