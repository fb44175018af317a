"""Interleaved A/B: NaN-guard placement vs frozen-gradient DCE.

The stage-1 step freezes the 1.23B-param base Llama and trains only LoRA
+ Q-Former + modality embeddings.  With ``optax.apply_if_finite`` wrapped
around the WHOLE ``multi_transform`` (the r3 layout), the finiteness
check consumes every frozen gradient, so XLA cannot dead-code-eliminate
the frozen base's dW matmuls — roughly a third of the backward FLOPs
spent on gradients that are zeroed on arrival.  The r4 layout guards the
"train" branch only (train/stage1.py), making every frozen dW dead.

Arms (one process, interleaved windows, identical batch):
  guard_outer — the r3 layout, rebuilt inline
  guard_inner — the shipped make_stage1_optimizer
  no_guard    — (--ceiling) nan_guard off: any gap to guard_inner is the
                cost of the finiteness check itself.  Off by default —
                three live 2.5 GB param trees + step peak OOM a 16 GB
                chip.

    python scripts/ab_frozen_dce.py [--bs 8] [--iters 3] [--windows 3]

Prints one JSON line {arm: ms} + trainable-update equivalence check.
"""
from _common import base_parser  # noqa: F401  (sys.path setup)
import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--text-len", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--ceiling", action="store_true",
                   help="add the no_guard arm (needs the HBM headroom)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np
    import optax
    from bench import stage1_step_setup
    from tsue_tpu.train.stage1 import (make_stage1_train_step,
                                       stage1_freeze_label)

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    # the shipped (guard_inner) step + shared params/batch
    step_inner, params, opt_inner, batch = stage1_step_setup(
        128256, args.bs, args.text_len)

    # rebuild the r3 guard-outer layout and a no-guard ceiling inline
    from bench import _cfg
    cfg = _cfg(128256, args.bs, 18, 18, args.text_len, "bfloat16")
    import jax.numpy as jnp
    from tsue_tpu.models.fusion import MultiModalLLM
    import dataclasses
    llama = dataclasses.replace(cfg.model.llama, loss_chunk=128)
    mllm = MultiModalLLM(llama, cfg.model.qformer, dtype=jnp.bfloat16)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: stage1_freeze_label(
            tuple(str(getattr(p_, "key", p_)) for p_ in path)),
        params)
    adamw = lambda: optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip or 1.0),
        optax.adamw(cfg.train.lr, weight_decay=cfg.train.weight_decay))
    tx_outer = optax.apply_if_finite(
        optax.multi_transform({"train": adamw(),
                               "freeze": optax.set_to_zero()}, labels),
        max_consecutive_errors=100)
    tx_plain = optax.multi_transform(
        {"train": adamw(), "freeze": optax.set_to_zero()}, labels)

    arms = {
        "guard_inner": (step_inner, opt_inner),
        "guard_outer": (jax.jit(make_stage1_train_step(mllm, tx_outer),
                                donate_argnums=(0, 1)),
                        tx_outer.init(params)),
    }
    if args.ceiling:
        arms["no_guard"] = (
            jax.jit(make_stage1_train_step(mllm, tx_plain),
                    donate_argnums=(0, 1)), tx_plain.init(params))
    key = jax.random.key(0)

    # one step per arm from the SAME params: trainable updates must agree
    # (frozen stay bit-identical zero-updates in every layout).  Copies
    # are made up front so the original tree can be freed before the
    # first step runs (each live tree is 2.5 GB).
    import jax.numpy as jnp
    trees = {name: jax.tree.map(jnp.copy, params) for name in arms}
    del params
    ref = {}
    state = {}
    for name, (step, opt) in arms.items():
        p2, o2, m = step(trees.pop(name), opt, batch, key)
        ref[name] = p2
        state[name] = (p2, o2)
        log(f"compiled {name}: loss {float(m['lm_loss']):.4f}")
    flat_a = jax.tree.leaves(ref["guard_inner"])
    for other in [n for n in arms if n != "guard_inner"]:
        flat_b = jax.tree.leaves(ref[other])
        max_d = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                          - b.astype(jnp.float32))))
                    for a, b in zip(flat_a, flat_b))
        log(f"max |param delta| guard_inner vs {other}: {max_d:.3e}")
    del ref

    best = {n: float("inf") for n in arms}
    for w in range(args.windows):
        for name, (step, _) in arms.items():
            ps, os_ = state[name]
            t0 = time.time()
            for i in range(args.iters):
                ps, os_, m = step(ps, os_, batch,
                                  jax.random.fold_in(key, i))
                float(m["lm_loss"])
            dt = (time.time() - t0) / args.iters
            state[name] = (ps, os_)
            best[name] = min(best[name], dt)
            log(f"  w{w} {name}: {dt*1000:.0f} ms")

    out = {name: round(best[name] * 1000, 1) for name in arms}
    out["speedup_inner_vs_outer"] = round(
        best["guard_outer"] / best["guard_inner"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
