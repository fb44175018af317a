"""Interleaved A/B: where parity-mode K-candidate eval time goes, and
whether Pallas flash attention / a larger batch close the MFU gap.

Parity mode = the reference's exact eval semantics (K full stochastic
model forwards, ref scripts/test.py:1327-1339) as one vmap.  The r2 bench
measured 9.4 traj/s at bs16 (~47-64% MFU); the XLA attention path
materializes the (K*B, H, 544, 544) fp32 logits per layer in HBM
(~6 GB/layer at bs16 K=10), which the Pallas kernel (ops/flash.py) never
does.  Variants are all built in ONE process and timed in interleaved
windows (CLAUDE.md: cross-run comparisons on the shared tunnel are noise).

    python scripts/ab_parity.py [--iters 2] [--windows 3] [--k 10]
        [--trace /tmp/parity_trace]

Prints one JSON line: {variant: traj_per_sec or null(OOM)}.
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
    p.add_argument("--trace", default=None,
                   help="dump a jax.profiler trace of xla_bs16 here")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from bench import build
    from tsue_tpu.eval.metrics import candidate_rollout
    from tsue_tpu.ops.attention import attention_impl

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    cfg, model, params, batch32 = build(
        128256, batch_size=32, seq_len=18, out_len=18, text_len=512,
        dtype_str="bfloat16")
    batches = {16: {k: v[:16] for k, v in batch32.items()}, 32: batch32}
    K = args.k

    variants = [("xla_bs16", "xla", 16), ("pallas_bs16", "pallas", 16),
                ("xla_bs32", "xla", 32), ("pallas_bs32", "pallas", 32)]
    steps, dead = {}, {}
    rng = jax.random.key(0)
    for name, impl, bs in variants:
        try:
            with attention_impl(impl):  # trace+compile inside the scope
                st = jax.jit(lambda p, b, r: candidate_rollout(
                    lambda v, bb, det, rngs: model.apply(v, bb, det,
                                                         rngs=rngs),
                    {"params": p}, b, K, r))
                t0 = time.time()
                float(jnp.sum(st(params, batches[bs], rng)))  # compile+warm
            steps[name] = (st, bs)
            log(f"{name}: compiled+warm in {time.time()-t0:.1f}s")
        except Exception as e:
            dead[name] = f"{type(e).__name__}"
            log(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})")

    best = {name: float("inf") for name in steps}
    for w in range(args.windows):
        for name, (st, bs) in steps.items():
            t0 = time.time()
            for i in range(args.iters):
                float(jnp.sum(st(params, batches[bs],
                                 jax.random.fold_in(rng, w * 10 + i))))
            dt = (time.time() - t0) / args.iters
            best[name] = min(best[name], dt)
            log(f"  w{w} {name}: {dt*1000:.0f} ms/batch")

    out = {}
    for name, (st, bs) in steps.items():
        out[name] = round(bs / best[name], 2)
    for name in dead:
        out[name] = None
        out[name + "_error"] = dead[name]

    if args.trace and "xla_bs16" in steps:
        st, bs = steps["xla_bs16"]
        with jax.profiler.trace(args.trace):
            float(jnp.sum(st(params, batches[bs], rng)))
        log(f"trace written to {args.trace}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
