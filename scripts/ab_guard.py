"""Interleaved A/B: NaN-guard finiteness-check formulation on the JOINT
train step (every one of the 1.3B params trainable).

The r5 joint-step profile (PARITY.md) showed optax.apply_if_finite's
per-leaf ``all(isfinite(leaf))`` bool reductions costing 96 ms of the
521 ms device step (466 is-finite_reduce_fusion ops): with everything
trainable the guard re-reads the whole gradient tree through the slow
predicate-reduce path.  train/guard.py reformulates the check two ways
(NaN-propagating ``max(|x|)`` f32 probe; probe shared with the clip's
global norm) — detection exactly equivalent, state identical.  This
script measures the swaps.

MEASURED OUTCOME (r5, real chip, bs16 interleaved best-of-3-windows):
optax 537.8 / fast 537.8 / fusednorm 535.8 / no_guard 517.1 ms — both
reformulations a wash, so the trainers keep optax.apply_if_finite; see
PARITY.md "Joint train-step profile" for the post-mortem.

Memory note: a joint 1.3B AdamW state is ~13 GB, so two live arms
cannot coexist on a 16 GB chip.  Both guards produce byte-identical
opt_state STRUCTURE (optax's own ApplyIfFiniteState), so the arms
alternate over ONE donated TrainState: armA step -> rewrap the same
buffers under armB's tx -> armB step -> ... with per-arm timing over
consecutive steps inside each window.  Identical numerics on the
all-finite path is pinned separately (tests/test_guard.py bitwise).

    python scripts/ab_guard.py [--bs 16] [--iters 3] [--windows 3]

Prints one JSON line {arm: ms_per_step, speedup: x}.
"""
from _common import base_parser  # noqa: F401  (sys.path setup)
import argparse
import dataclasses
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--text-len", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--ceiling", action="store_true",
                   help="also measure nan_guard=False sequentially at "
                        "the end (its opt_state structure differs, so "
                        "it cannot share the interleaved state)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import optax
    from bench import build
    from tsue_tpu.models.tsue import TrajectoryModel
    from tsue_tpu.train.guard import (apply_if_finite_fast,
                                      clipped_apply_if_finite)
    from tsue_tpu.train.trainer import (TrainState, freeze_label,
                                        make_optimizer, make_train_step,
                                        _path_strs)

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    # the benched joint variant: remat+dots, rbg dropout keys, bs16
    cfg, _, params, batch = build(128256, batch_size=args.bs, seq_len=18,
                                  out_len=30, text_len=args.text_len,
                                  dtype_str="bfloat16")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, llama=dataclasses.replace(
                cfg.model.llama, remat=True, remat_policy="dots")),
        train=dataclasses.replace(cfg.train, freeze_regime="joint"))
    model = TrajectoryModel(cfg.model, 18, 30)

    def apply_fn(vs, b, det, rngs=None, **kw):
        return model.apply(vs, b, det, rngs=rngs, **kw)

    # arm "optax": the shipped optimizer (optax.apply_if_finite guard)
    tx_optax = make_optimizer(cfg, params)
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: freeze_label(_path_strs(path),
                                     cfg.train.freeze_regime), params)
    # arm "fast": identical chain with the max-|x| probe guard
    tx_fast = optax.multi_transform(
        {"train": apply_if_finite_fast(
            optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip),
                        optax.adamw(cfg.train.lr,
                                    weight_decay=cfg.train.weight_decay)),
            max_consecutive_errors=100),
         "freeze": optax.set_to_zero()}, labels)
    # arm "fusednorm": guard probe == the clip's global norm (one pass)
    tx_fused = optax.multi_transform(
        {"train": clipped_apply_if_finite(
            cfg.train.grad_clip,
            optax.adamw(cfg.train.lr,
                        weight_decay=cfg.train.weight_decay), 100),
         "freeze": optax.set_to_zero()}, labels)

    state = TrainState.create(apply_fn, params, tx_fast)
    del params
    step_raw = make_train_step(cfg)
    steps = {"fast": jax.jit(step_raw, donate_argnums=0),
             "optax": jax.jit(step_raw, donate_argnums=0),
             "fusednorm": jax.jit(step_raw, donate_argnums=0)}
    txs = {"fast": tx_fast, "optax": tx_optax, "fusednorm": tx_fused}
    key = jax.random.key(0, impl="rbg")

    def run_arm(name, st, n):
        st = st.replace(tx=txs[name])
        t0 = time.time()
        m = None
        for _ in range(n):
            st, m = steps[name](st, batch, key)
        loss = float(m["loss"])                    # block
        return st, (time.time() - t0) / n, loss

    for name in steps:                             # compile
        t0 = time.time()
        state, _, loss = run_arm(name, state, 1)
        log(f"compiled {name} in {time.time()-t0:.1f}s  loss {loss:.4f}")

    best = {n: float("inf") for n in steps}
    for w in range(args.windows):
        for name in steps:
            state, dt, _ = run_arm(name, state, args.iters)
            best[name] = min(best[name], dt)
            log(f"  w{w} {name}: {dt*1e3:.1f} ms/step")

    out = {n: round(best[n] * 1e3, 1) for n in steps}
    out["speedup"] = round(best["optax"] / best["fast"], 3)
    out["speedup_fusednorm"] = round(best["optax"] / best["fusednorm"], 3)

    if args.ceiling:
        # nan_guard off: keep only the param leaves, free the ~10 GB of
        # AdamW moments before the fresh init (no copy — refcounted)
        params = state.params
        del state
        tx_plain = optax.multi_transform(
            {"train": optax.chain(
                optax.clip_by_global_norm(cfg.train.grad_clip),
                optax.adamw(cfg.train.lr,
                            weight_decay=cfg.train.weight_decay)),
             "freeze": optax.set_to_zero()}, labels)
        st = TrainState.create(apply_fn, params, tx_plain)
        del params
        step_plain = jax.jit(step_raw, donate_argnums=0)
        t0 = time.time()
        st, m = step_plain(st, batch, key)
        float(m["loss"])
        log(f"compiled no_guard in {time.time()-t0:.1f}s")
        best_pl = float("inf")
        for w in range(args.windows):
            t0 = time.time()
            for _ in range(args.iters):
                st, m = step_plain(st, batch, key)
            float(m["loss"])
            best_pl = min(best_pl, (time.time() - t0) / args.iters)
            log(f"  w{w} no_guard: {best_pl*1e3:.1f} ms/step")
        out["no_guard"] = round(best_pl * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
