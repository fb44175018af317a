"""Interleaved A/B: do the fused elementwise Pallas kernels
(ops/fused.py: one-pass RMSNorm, silu·up fused into the down-projection)
move the production workloads?

Targets the ~48 ms/step of elementwise time the r2 profile found in the
155 ms single 1B forward (PARITY.md "Parity-mode eval profile").  All
variants are built in ONE process and timed in interleaved windows
(CLAUDE.md: cross-run comparisons on the shared tunnel are noise).

    python scripts/ab_fused.py [--iters 2] [--windows 3] [--k 10]

Prints one JSON line {variant: traj_per_sec or ms}.
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
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from bench import build
    from tsue_tpu.eval.metrics import candidate_rollout, fast_candidate_rollout
    from tsue_tpu.ops.fused import fused_scope

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    cfg, model, params, batch64 = build(
        128256, batch_size=64, seq_len=18, out_len=18, text_len=512,
        dtype_str="bfloat16")
    batch16 = {k: v[:16] for k, v in batch64.items()}
    K = args.k

    def parity_fn(p_, b_, r_):
        return candidate_rollout(
            lambda v, bb, det, rngs: model.apply(v, bb, det, rngs=rngs),
            {"params": p_}, b_, K, r_)

    def fast_fn(p_, b_, r_):
        return fast_candidate_rollout(model, {"params": p_}, b_, K, r_)

    # (name, fused, fn, batch)
    variants = [
        ("fast_bs64_base", "off", fast_fn, batch64),
        ("fast_bs64_fused", "on", fast_fn, batch64),
        ("parity_bs16_base", "off", parity_fn, batch16),
        ("parity_bs16_fused", "on", parity_fn, batch16),
    ]
    steps, dead = {}, {}
    rng = jax.random.key(0, impl="rbg")
    for name, fused, fn, b in variants:
        try:
            with fused_scope(fused):   # trace+compile inside the scope
                st = jax.jit(fn)
                t0 = time.time()
                float(jnp.sum(st(params, b, rng)))
            steps[name] = (st, b)
            log(f"{name}: compiled+warm in {time.time()-t0:.1f}s")
        except Exception as e:
            dead[name] = f"{type(e).__name__}: {str(e)[:200]}"
            log(f"{name}: FAILED ({dead[name]})")

    best = {name: float("inf") for name in steps}
    for w in range(args.windows):
        for name, (st, b) in steps.items():
            t0 = time.time()
            for i in range(args.iters):
                float(jnp.sum(st(params, b,
                                 jax.random.fold_in(rng, w * 10 + i))))
            dt = (time.time() - t0) / args.iters
            best[name] = min(best[name], dt)
            log(f"  w{w} {name}: {dt*1000:.0f} ms/batch")

    out = {}
    for name, (st, b) in steps.items():
        bs = b["traj_in"].shape[0]
        out[name] = round(bs / best[name], 2)
    for name, err in dead.items():
        out[name] = None
        out[name + "_error"] = err
    print(json.dumps(out))


if __name__ == "__main__":
    main()
