"""Interleaved A/B: int8 KV cache (ops/kv_quant.py) vs the bf16 cache,
at the real Llama-1B dims over a batch-size sweep.

Arms run the production generator (eval/generation.py): the bf16 cache,
the int8 cache through the Pallas VMEM-dequant kernel ("kv_int8"), and
the int8 cache through the XLA dequant-fused formulation ("kv_int8x",
kv_attn_impl("xla")).  ``--int8`` additionally interleaves every arm
with the int8 weight collection attached (ops/quant.py), since the KV
stream only dominates once the weight stream is already halved.
Workload: the reference's production sampling chain (T=0.9, top-k 40,
top-p 0.9, penalties — ref scripts/train.py:630-642) on random prompts.

    python scripts/ab_kv_quant.py [--bs 16,64,128] [--int8] [--fused-head]

Prints one JSON line {arm: {bs: tok_per_sec}} + token agreement.
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
    p.add_argument("--bs", default="16,64,128")
    p.add_argument("--prompt-len", type=int, default=144)
    p.add_argument("--max-new", type=int, default=64)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--int8", action="store_true",
                   help="also interleave with int8 weights attached")
    p.add_argument("--fused-head", action="store_true",
                   help="decode both arms through the fused LM-head+top-k "
                        "kernel (the production fast path)")
    p.add_argument("--greedy", action="store_true",
                   help="greedy instead of the sampled production chain")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np
    from _common import build_mllm_bf16
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.ops.sampling import SamplingConfig

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    sizes = [int(s) for s in args.bs.split(",")]
    mllm, variables, (vision, ids, mask) = build_mllm_bf16(
        batch_size=max(sizes), prompt_len=args.prompt_len)
    vocab = mllm.llama.vocab_size
    cfg = (SamplingConfig(do_sample=False) if args.greedy
           else SamplingConfig())
    variants = {"": variables}
    if args.int8:
        from tsue_tpu.ops.quant import with_quantized_decode
        variants["_int8"] = with_quantized_decode(variables)

    from tsue_tpu.ops.kv_quant import kv_attn_impl

    # (generator, int8-attention formulation): "kernel" = the Pallas
    # VMEM-dequant kernel, "xla" = dequant fused into XLA attention.
    # Tracing happens on first call, so run() scopes every call.
    gens = {
        "kv_bf16": (make_generate_fn(
            mllm, cfg, args.max_new, args.prompt_len, eos_id=vocab - 1,
            pad_id=0, fused_head=args.fused_head), "kernel"),
        "kv_int8": (make_generate_fn(
            mllm, cfg, args.max_new, args.prompt_len, eos_id=vocab - 1,
            pad_id=0, fused_head=args.fused_head, quantize_kv=True),
            "kernel"),
        "kv_int8x": (make_generate_fn(
            mllm, cfg, args.max_new, args.prompt_len, eos_id=vocab - 1,
            pad_id=0, fused_head=args.fused_head, quantize_kv=True),
            "xla"),
    }
    key = jax.random.key(0)

    def run(gen, impl, vs, bs, k):
        with kv_attn_impl(impl):
            return np.asarray(gen(vs, vision[:bs], ids[:bs], mask[:bs], k))

    arms = [(g + sfx, gen, impl, variants[sfx])
            for sfx in variants for g, (gen, impl) in gens.items()]
    outs = {}
    for name, gen, impl, vs in arms:                 # compile + agreement
        for bs in sizes:
            t0 = time.time()
            outs[(name, bs)] = run(gen, impl, vs, bs, key)
            log(f"compiled {name} bs{bs} in {time.time()-t0:.1f}s")
    agreement = {}
    for sfx in variants:
        for bs in sizes:
            a = outs[("kv_bf16" + sfx, bs)]
            b = outs[("kv_int8" + sfx, bs)]
            agree = float((a == b).mean())
            agreement[f"bs{bs}{sfx}"] = round(agree, 4)
            log(f"token agreement{sfx} bs{bs}: {agree:.4f} "
                "(int8 cache error can flip sampled draws)")

    best = {(n, bs): float("inf") for n, _, _, _ in arms for bs in sizes}
    for w in range(args.windows):
        for name, gen, impl, vs in arms:
            for bs in sizes:
                t0 = time.time()
                for i in range(args.iters):
                    run(gen, impl, vs, bs,
                        jax.random.fold_in(key, w * 10 + i))
                dt = (time.time() - t0) / args.iters
                best[(name, bs)] = min(best[(name, bs)], dt)
                log(f"  w{w} {name} bs{bs}: {dt:.3f}s "
                    f"({bs*args.max_new/dt:.0f} tok/s)")

    result = {"agreement": agreement}
    for name, _, _, _ in arms:
        result[name] = {str(bs): round(bs * args.max_new /
                                       best[(name, bs)], 1)
                        for bs in sizes}
    for sfx in variants:
        result["speedup" + sfx] = {
            str(bs): round(best[("kv_bf16" + sfx, bs)] /
                           best[("kv_int8" + sfx, bs)], 3)
            for bs in sizes}
        result["speedup_xla" + sfx] = {
            str(bs): round(best[("kv_bf16" + sfx, bs)] /
                           best[("kv_int8x" + sfx, bs)], 3)
            for bs in sizes}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
