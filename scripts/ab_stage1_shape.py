"""Interleaved sweep: stage-1 step shape (batch size x loss-chunk size).

After the frozen-dW DCE fix (scripts/ab_frozen_dce.py) the stage-1
profile shows the chunked-CE scan carrying ~17 ms of dynamic-update-slice
overhead at loss_chunk=128 (5 chunks) and fixed per-step overheads that a
larger batch would amortize.  This sweeps both knobs with one model init,
reporting ms/step AND ms/sample (the production-relevant number — stage-1
epochs are throughput-bound, not latency-bound).

    python scripts/ab_stage1_shape.py --bs 8 --chunks 128,264
    python scripts/ab_stage1_shape.py --bs 16 --chunks 128,264

Memory note: every arm owns a donated 2.5 GB params tree, so run ONE
batch size per invocation (two chunk arms = ~5 GB of trees + the step
peak; three trees OOM'd a 16 GB chip).  Chunk comparisons are
interleaved and exact; cross-bs comparisons use ms/sample across runs
and carry the ambient-throughput caveat (CLAUDE.md).

Prints one JSON line {"bs{B}_chunk{C}": {"ms": .., "ms_per_sample": ..}}.
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
    p.add_argument("--bs", default="8")
    p.add_argument("--chunks", default="128,264")
    p.add_argument("--text-len", type=int, default=512)
    p.add_argument("--remat", default="",
                   help="remat policy for the Llama layers (e.g. dots) — "
                        "required headroom for bs16 (two bs16 no-remat "
                        "arms OOM a 16 GB chip)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    from bench import stage1_step_setup

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")
    sizes = [int(s) for s in args.bs.split(",")]
    chunks = [int(c) for c in args.chunks.split(",")]
    key = jax.random.key(0)

    arms = {}
    for bs in sizes:
        for ck in chunks:
            # one init per arm: steps donate their state, so sharing a
            # tree across arms would invalidate it mid-sweep; trees are
            # small enough two-at-a-time if sizes stay modest
            step, params, opt, batch = stage1_step_setup(
                128256, bs, args.text_len, loss_chunk=ck,
                remat_policy=args.remat)
            t0 = time.time()
            params, opt, m = step(params, opt, batch, key)
            float(m["lm_loss"])
            log(f"compiled bs{bs} chunk{ck} in {time.time()-t0:.0f}s "
                f"(loss {float(m['lm_loss']):.4f})")
            arms[(bs, ck)] = [step, params, opt, batch]

    best = {k: float("inf") for k in arms}
    for w in range(args.windows):
        for k, arm in arms.items():
            step, params, opt, batch = arm
            t0 = time.time()
            for i in range(args.iters):
                params, opt, m = step(params, opt, batch,
                                      jax.random.fold_in(key, i))
                float(m["lm_loss"])
            dt = (time.time() - t0) / args.iters
            arm[1], arm[2] = params, opt
            best[k] = min(best[k], dt)
            log(f"  w{w} bs{k[0]} chunk{k[1]}: {dt*1000:.0f} ms "
                f"({dt*1000/k[0]:.1f} ms/sample)")

    out = {f"bs{bs}_chunk{ck}": {"ms": round(best[(bs, ck)] * 1000, 1),
                                 "ms_per_sample": round(
                                     best[(bs, ck)] * 1000 / bs, 2)}
           for (bs, ck) in arms}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
