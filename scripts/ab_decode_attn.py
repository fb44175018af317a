"""Interleaved A/B: XLA vs Pallas attention inside the KV-cached decode
loop (Tq=1 against the cache) — the one shape class the flash kernel's
"measured faster" claim did not cover when it became the default.

CAVEAT: the impl scope covers the WHOLE generate program, so the "xla"
arm also forces XLA for the prefill — neither arm is exactly the shipped
auto config (Pallas prefill + XLA Tq=1 decode).  The 64-step decode
dominates the call (~85%+ of time), so the comparison direction is
about decode attention, but treat the absolute tok/s as lower bounds on
the shipped path.

    python scripts/ab_decode_attn.py [--bs 16] [--iters 2] [--windows 3]

Prints one JSON line {variant: tok_per_sec}.
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
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--max-new", type=int, default=64)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np
    from _common import build_decode_workload
    from tsue_tpu.ops.attention import attention_impl

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")
    log("init...")

    key = jax.random.key(0)
    gens = {}
    for impl in ("xla", "pallas"):
        with attention_impl(impl):   # trace+compile inside the scope
            gen, variables, (vision, ids, mask) = build_decode_workload(
                batch_size=args.bs, max_new=args.max_new)
            t0 = time.time()
            int(np.asarray(gen(variables, vision, ids, mask, key)).sum())
        gens[impl] = gen
        log(f"{impl}: compiled+warm in {time.time()-t0:.1f}s")

    best = {n: float("inf") for n in gens}
    for w in range(args.windows):
        for n, gen in gens.items():
            t0 = time.time()
            for i in range(args.iters):
                int(np.asarray(gen(variables, vision, ids, mask,
                                   jax.random.fold_in(key, w * 10 + i))
                               ).sum())
            dt = (time.time() - t0) / args.iters
            best[n] = min(best[n], dt)
            log(f"  w{w} {n}: {dt*1000:.0f} ms/call")

    print(json.dumps({n: round(bs * args.max_new / t, 1)
                      for n, t in best.items()}))


if __name__ == "__main__":
    main()
