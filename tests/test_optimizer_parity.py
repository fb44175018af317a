"""Optimizer-TRAJECTORY parity vs torch (VERDICT r4 task 6).

Forward/loss parity vs real torch mirrors is pinned elsewhere
(test_reference_ckpt_compat.py); this pins the training DYNAMICS: K steps
of the production optax chain — ``clip_by_global_norm(1.0) +
adamw(lr=5e-4, weight_decay=1e-4)`` under the freeze-mask multi_transform
with the NaN guard inside the train branch (train/trainer.py
make_optimizer, train/stage1.py make_stage1_optimizer) — against
``torch.optim.AdamW(lr=5e-4, weight_decay=1e-4)`` +
``clip_grad_norm_(trainable, 1.0)`` (ref scripts/train.py:1145,
modify_scripts/modify_train.py:1188-1194 skip-on-nonfinite) on identical
fp32 data/grads.  AdamW decay/eps conventions are a classic silent
divergence; the north star is reproducing the reference's ADE/FDE and
training dynamics produce those numbers.

Conventions being asserted identical:
  - decoupled weight decay applied only to TRAINABLE params (frozen params
    carry requires_grad=False in the reference, so torch's AdamW never
    sees them; optax's multi_transform routes them to set_to_zero)
  - bias-corrected first/second moments, eps OUTSIDE the sqrt
  - global-norm clip computed over the trainable subtree only
  - non-finite grads skip the update without advancing moments
    (optax.apply_if_finite vs the reference's skip-the-step guard)
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from tsue_tpu.config import ExperimentConfig
from tsue_tpu.train.stage1 import make_stage1_optimizer
from tsue_tpu.train.trainer import make_optimizer

LR, WD, CLIP = 5e-4, 1e-4, 1.0
STEPS = 6


def _tree(rng, spec):
    """Nested dict of fp32 arrays from a {path: shape} spec."""
    out = {}
    for path, shape in spec.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = rng.normal(size=shape).astype(np.float32)
    return out


def _leaves(tree, prefix=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), v


def _run_optax(tx, params0, grad_seq):
    params = jax.tree.map(jnp.asarray, params0)
    opt_state = tx.init(params)
    out = []
    for g in grad_seq:
        gj = jax.tree.map(jnp.asarray, g)
        updates, opt_state = tx.update(gj, opt_state, params)
        params = optax.apply_updates(params, updates)
        out.append(jax.tree.map(np.asarray, params))
    return out


def _run_torch(params0, grad_seq, trainable):
    """The reference loop: AdamW over requires_grad params only, global
    clip over the same set, skip the step on non-finite grads."""
    tensors = {name: torch.tensor(leaf, requires_grad=(name in trainable))
               for name, leaf in _leaves(params0)}
    opt = torch.optim.AdamW([tensors[n] for n in sorted(trainable)],
                            lr=LR, weight_decay=WD, betas=(0.9, 0.999),
                            eps=1e-8)
    out = []
    for g in grad_seq:
        flat_g = dict(_leaves(g))
        finite = all(np.isfinite(flat_g[n]).all() for n in trainable)
        if finite:  # ref modify_train.py:1188-1194 skips non-finite steps
            for n in trainable:
                tensors[n].grad = torch.tensor(flat_g[n])
            torch.nn.utils.clip_grad_norm_(
                [tensors[n] for n in sorted(trainable)], CLIP)
            opt.step()
            opt.zero_grad()
        out.append({n: t.detach().numpy().copy()
                    for n, t in tensors.items()})
    return out


def _assert_trajectories_match(optax_steps, torch_steps):
    for k, (oj, ot) in enumerate(zip(optax_steps, torch_steps)):
        for name, leaf in _leaves(oj):
            np.testing.assert_allclose(
                leaf, ot[name], rtol=2e-5, atol=2e-6,
                err_msg=f"step {k} param {name}")


SPEC = {
    "mllm/llama/layers_0/q_proj/kernel": (8, 8),      # frozen (frozen_mllm)
    "mllm/llama/layers_0/q_proj/lora_a": (8, 4),      # frozen under
    "mllm/qformer/dense/kernel": (6, 6),              #   frozen_mllm too
    "forecaster/dense/kernel": (8, 6),                # trainable
    "forecaster/dense/bias": (6,),
    "lane_enc/conv/kernel": (3, 4, 4),
}


def _grad_seq(params0, *, nan_step=None, big_step=None):
    """STEPS grad trees; one optionally huge (exercises the clip), one
    optionally NaN'd on a trainable leaf (exercises the guard)."""
    rng = np.random.default_rng(7)
    seq = []
    for k in range(STEPS):
        g = jax.tree.map(
            lambda x: rng.normal(size=x.shape).astype(np.float32), params0)
        if k == big_step:
            g = jax.tree.map(lambda x: x * 50.0, g)  # norm >> 1 -> clips
        if k == nan_step:
            g["forecaster"]["dense"]["bias"] = np.full(
                (6,), np.nan, np.float32)
        seq.append(g)
    return seq


def test_stage2_frozen_mllm_trajectory_matches_torch_adamw():
    params0 = _tree(np.random.default_rng(0), SPEC)
    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, lr=LR, weight_decay=WD, grad_clip=CLIP,
            freeze_regime="frozen_mllm", nan_guard=True))
    tx = make_optimizer(cfg, params0)
    trainable = {n for n, _ in _leaves(params0)
                 if not n.startswith("mllm/")}
    seq = _grad_seq(params0, big_step=2, nan_step=4)
    optax_steps = _run_optax(tx, params0, seq)
    _assert_trajectories_match(optax_steps,
                               _run_torch(params0, seq, trainable))
    # the frozen subtree must be bit-identical to its init throughout
    final = optax_steps[-1]
    np.testing.assert_array_equal(
        final["mllm"]["llama"]["layers_0"]["q_proj"]["kernel"],
        params0["mllm"]["llama"]["layers_0"]["q_proj"]["kernel"])


def test_stage1_lora_trajectory_matches_torch_adamw():
    params0 = _tree(np.random.default_rng(1), SPEC)
    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, lr=LR, weight_decay=WD, grad_clip=CLIP,
            nan_guard=True))
    tx = make_stage1_optimizer(cfg, params0)
    # stage-1 rule: train LoRA + everything outside the base Llama
    trainable = {n for n, _ in _leaves(params0)
                 if "lora" in n or "llama" not in n}
    seq = _grad_seq(params0, big_step=1)
    _assert_trajectories_match(_run_optax(tx, params0, seq),
                               _run_torch(params0, seq, trainable))


def test_joint_regime_trajectory_matches_torch_adamw():
    """joint = everything trainable (ref im_kim_train_GRN.py:976-1008)."""
    params0 = _tree(np.random.default_rng(2), SPEC)
    cfg = ExperimentConfig()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, lr=LR, weight_decay=WD, grad_clip=CLIP,
            freeze_regime="joint", nan_guard=True))
    tx = make_optimizer(cfg, params0)
    trainable = {n for n, _ in _leaves(params0)}
    seq = _grad_seq(params0, big_step=0, nan_step=3)
    _assert_trajectories_match(_run_optax(tx, params0, seq),
                               _run_torch(params0, seq, trainable))
