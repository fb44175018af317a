"""Training: freeze regimes as optax masks, jit'ed DP train/eval steps.

Replaces the reference's per-script DDP loops (ref scripts/train.py:1044-1328):
- freeze regimes = optax.multi_transform over param-path labels instead of
  ``requires_grad`` flips + ``find_unused_parameters=True`` DDP
  (ref scripts/train.py:1127-1145, modify_scripts/modify_train.py:522-528,
  modify_scripts/modify.py:523-525);
- non-finite-loss step skip = optax.apply_if_finite
  (ref modify_scripts/modify_train.py:1188-1194);
- gradient all-reduce is implicit: the loss is a global mean over the
  data-sharded batch, so XLA inserts the psum (no DDP hooks).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tsue_tpu.config import ExperimentConfig
from tsue_tpu.train.losses import denorm_mse_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx, apply_fn=apply_fn)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


# ---------------------------------------------------------------------------
# Freeze regimes
# ---------------------------------------------------------------------------

def _path_strs(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        key = getattr(p, "key", None)
        out.append(str(key if key is not None else p))
    return tuple(out)


def freeze_label(path_strs: Tuple[str, ...], regime: str) -> str:
    """Return "train" or "freeze" for a param path under the given regime.

    Regimes (SURVEY.md §2.6 T1-T4):
      frozen_mllm — whole mllm subtree frozen (ref scripts/train.py:1141-1142)
      joint       — everything trainable (ref im_kim_train_GRN.py:976-1008)
      lora_only   — inside mllm/llama only lora params train
                    (ref modify_train.py:522-528); everything else trains
      full_freeze — mllm/llama frozen incl. LoRA (ref modify.py:523-525);
                    qformer/forecaster train
    """
    in_mllm = "mllm" in path_strs
    in_llama = in_mllm and any(p == "llama" for p in path_strs)
    is_lora = any("lora" in p for p in path_strs)
    if regime == "joint":
        return "train"
    if regime == "frozen_mllm":
        return "freeze" if in_mllm else "train"
    if regime == "lora_only":
        if in_llama and not is_lora:
            return "freeze"
        return "train"
    if regime == "full_freeze":
        return "freeze" if in_llama else "train"
    raise ValueError(f"unknown freeze regime {regime!r}")


def make_optimizer(cfg: ExperimentConfig, params) -> optax.GradientTransformation:
    """AdamW(lr, wd=1e-4) + clip + freeze mask + non-finite guard."""
    tcfg = cfg.train
    chain = []
    if tcfg.grad_clip:
        chain.append(optax.clip_by_global_norm(tcfg.grad_clip))
    chain.append(optax.adamw(tcfg.lr, weight_decay=tcfg.weight_decay))
    inner = optax.chain(*chain)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: freeze_label(_path_strs(path), tcfg.freeze_regime),
        params)
    if tcfg.nan_guard:
        # guard the TRAIN branch only (see train/stage1.py note): a
        # whole-tree finiteness check would keep every frozen param's dW
        # matmul alive against XLA DCE in the lora_only / full_freeze
        # regimes; a non-finite loss still reaches the trainable grads,
        # so bad steps are skipped identically.  The guard's total cost
        # is 3.9% of the joint step and NOT reformulation-addressable:
        # a max-|x| probe and a clip-norm-shared probe (train/guard.py)
        # both measured a wash vs this optax guard (PARITY.md "Joint
        # train-step profile", scripts/ab_guard.py).
        inner = optax.apply_if_finite(inner, max_consecutive_errors=100)
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, labels)


# ---------------------------------------------------------------------------
# Steps
# ---------------------------------------------------------------------------

def make_train_step(cfg: ExperimentConfig):
    """Returns a jit-able (state, batch, rng) -> (state, metrics).

    In the frozen-MLLM regime gradients are stopped at the MLLM output
    (the whole mllm subtree is frozen, so no trainable param needs the
    LLM backward) — the apply_fn must accept stop_llm_grad as a kwarg.
    """
    stop_llm = cfg.train.freeze_regime == "frozen_mllm" and cfg.model.use_llm

    def loss_fn(params, state, batch, rng):
        pred = state.apply_fn(
            {"params": params}, batch, False,
            rngs={"dropout": rng}, stop_llm_grad=stop_llm)
        loss = denorm_mse_loss(pred, batch["traj_out"], batch["norm_stat"],
                               batch.get("valid"))
        return loss, pred

    def step(state: TrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return step


def make_eval_step(cfg: ExperimentConfig):
    def step(state: TrainState, batch: Dict):
        pred = state.apply_fn({"params": state.params}, batch, True)
        loss = denorm_mse_loss(pred, batch["traj_out"], batch["norm_stat"],
                               batch.get("valid"))
        return {"loss": loss, "pred": pred}
    return step


def stack_epoch_batches(iterator) -> Dict:
    """Materialize one epoch of batches as a stacked device pytree
    (num_batches leading axis) for ``make_scan_epoch``."""
    import numpy as np
    batches = list(iterator)
    return {k: jnp.asarray(np.stack([b[k] for b in batches]))
            for k in batches[0]}


def make_scan_epoch(cfg: ExperimentConfig):
    """Whole-epoch training as ONE compiled lax.scan over batches.

    Semantically identical to the Python step loop (same per-step rng
    folding via state.step) — verified bit-equal in tests.  Measured note:
    with JAX's async dispatch the Python loop already pipelines step
    launches, so on a low-latency runtime the scan is NOT automatically
    faster (25-step epoch of the no-LLM model on v5e: loop 5.8 ms/step vs
    scan 12.7 ms/step — the stacked-batch dynamic slicing costs more than
    the dispatch it saves).  Use it when host dispatch is the bottleneck
    (very small steps, congested host) or to fuse epochs into larger
    traced programs.
    """
    step = make_train_step(cfg)

    def epoch(state: TrainState, batches: Dict, rng: jax.Array):
        def body(st, batch):
            st, m = step(st, batch, rng)
            return st, m["loss"]
        state, losses = jax.lax.scan(body, state, batches)
        return state, losses

    return epoch
