"""Op-level device-time profile of a production program.

Traces one of the hot workloads with ``jax.profiler`` and prints the
per-HLO-op device-time aggregation (utils/xplane.py — no TensorBoard
needed).  The r3 decode-step profile in PARITY.md came from this flow.

    python scripts/profile_ops.py --workload decode [--out /tmp/trace]
    python scripts/profile_ops.py --workload forward
    python scripts/profile_ops.py --workload stage1    # LM fine-tune step
    python scripts/profile_ops.py --workload joint     # stage-2 joint step
    python scripts/profile_ops.py --parse /tmp/trace   # re-parse only

The train-step workloads profile exactly the benched programs (bench.py
stage1_step_setup / the joint dots+rbg variant) so per-op floors map 1:1
onto the PARITY.md train-step numbers.
"""
from _common import base_parser  # noqa: F401  (sys.path setup)
import argparse
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_workload(name: str, out_dir: str, nan_guard: bool = True):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tsue_tpu.utils.jax_cache import configure
    configure(jax, min_secs=5.0)

    if name == "decode":
        from _common import build_decode_workload
        gen, variables, (vision, ids, mask) = build_decode_workload()
        key = jax.random.key(0)
        run = lambda k: int(np.asarray(
            gen(variables, vision, ids, mask, k)).sum())
    elif name == "forward":
        from bench import build
        _, model, params, batch = build(128256, batch_size=16, seq_len=18,
                                        out_len=18, text_len=512,
                                        dtype_str="bfloat16")
        step = jax.jit(lambda p, b: model.apply({"params": p}, b, True))
        key = jax.random.key(0)
        run = lambda k: float(jnp.sum(step(params, batch)))
    elif name == "stage1":
        from bench import stage1_step_setup
        step, params, opt_state, batch = stage1_step_setup(128256)
        key = jax.random.key(0)
        state = [params, opt_state]

        def run(k):
            p, o, m = step(state[0], state[1], batch, k)
            state[0], state[1] = p, o
            return float(m["lm_loss"])
    elif name == "joint":
        # the optimized joint variant benched in bench.py main (remat +
        # dots policy + rbg dropout keys, bs16, 18->30, text 512)
        import dataclasses
        from bench import build
        from tsue_tpu.models.tsue import TrajectoryModel
        from tsue_tpu.train.trainer import (TrainState, make_optimizer,
                                            make_train_step)
        cfg, _, params, batch = build(128256, batch_size=16, seq_len=18,
                                      out_len=30, text_len=512,
                                      dtype_str="bfloat16")
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, llama=dataclasses.replace(
                    cfg.model.llama, remat=True, remat_policy="dots")),
            train=dataclasses.replace(cfg.train, freeze_regime="joint",
                                      nan_guard=nan_guard))
        model = TrajectoryModel(cfg.model, 18, 30)

        def apply_fn(vs, b, det, rngs=None, **kw):
            return model.apply(vs, b, det, rngs=rngs, **kw)

        tx = make_optimizer(cfg, params)
        state = [TrainState.create(apply_fn, params, tx)]
        step = jax.jit(make_train_step(cfg), donate_argnums=0)
        key = jax.random.key(0, impl="rbg")

        def run(k):
            st, m = step(state[0], batch, k)
            state[0] = st
            return float(m["loss"])
    else:
        raise SystemExit(f"unknown workload {name}")

    log("warmup/compile...")
    run(key)
    log("tracing...")
    jax.profiler.start_trace(out_dir)
    run(jax.random.fold_in(key, 1))
    jax.profiler.stop_trace()
    return out_dir


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workload", default="decode",
                   choices=["decode", "forward", "stage1", "joint"])
    p.add_argument("--out", default="/tmp/tsue_profile")
    p.add_argument("--no-nan-guard", action="store_true",
                   help="joint workload only: drop apply_if_finite (the "
                        "no_guard ceiling arm of scripts/ab_guard.py)")
    p.add_argument("--parse", default=None,
                   help="skip tracing; parse this trace dir")
    p.add_argument("--plane", default=None,
                   help="plane-name substring; default: TPU on "
                        "accelerators, CPU under --platform cpu")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tsue_tpu.utils.xplane import find_xplane, op_durations, summarize
    trace_dir = args.parse or run_workload(args.workload, args.out,
                                           nan_guard=not args.no_nan_guard)
    pb = find_xplane(trace_dir)
    log(f"parsing {pb}")
    plane = args.plane
    if plane is None:
        import jax
        plane = "CPU" if jax.devices()[0].platform == "cpu" else "TPU"
    agg = op_durations(pb, plane_filter=plane)
    if not agg:
        # loud, not a silent all-zero report: the plane filter missed
        raise SystemExit(
            f"no events matched plane filter {plane!r} in {pb}; "
            "try --plane '' to list everything")
    print(summarize(agg, top=args.top))


if __name__ == "__main__":
    main()
