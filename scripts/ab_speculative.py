"""Interleaved A/B: speculative (prompt-lookup) vs plain greedy decode
at real Llama-1B dims (eval/speculative.py vs eval/generation.py).

Acceptance — hence the win — depends on how repetitive the output is,
so two workloads bound it:

- "looping": repeated-token prompts with no repetition processors;
  greedy decode degenerates into cycles (the classic failure mode),
  which prompt lookup drafts perfectly — the acceptance CEILING.
- "wandering": random prompts with the HF-default processors
  (repetition_penalty=1.2, no_repeat_ngram=3) that force novelty —
  near-zero acceptance, i.e. the overhead FLOOR.

Real templated traffic-context generations sit between (see the
trained-model acceptance probe in tests/test_speculative.py and
PARITY.md).  Per-workload token agreement between the two arms is
computed and logged — bitwise only in exact arithmetic (pinned on CPU
in tests/test_speculative.py); in bf16 the Tq=W window forward can
flip near-tied argmaxes (see eval/speculative.py).

    python scripts/ab_speculative.py [--bs 16] [--window 8] [--sampled]

``--sampled`` benches speculative SAMPLING (sample-and-match,
eval/speculative.py) instead of greedy: "looping" uses a peaked
temperature (0.25) over the periodic prompts — the confident/templated
regime where acceptance = p(draft) stays high — and "wandering" uses
the reference's full production chain (T=0.9/top-k 40/top-p 0.9/
penalties).  Token agreement vs the plain arm is only reported for
greedy (the sampled arms use per-row chain keys vs the plain scan's
shared-key chain, so tokens differ by keying while the distribution is
identical — pinned in tests/test_speculative.py).

Prints one JSON line {workload: {plain_tok_s, spec_tok_s, tok_per_fwd}}.
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
    p.add_argument("--prompt-len", type=int, default=144)
    p.add_argument("--max-new", type=int, default=64)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--draft-ngram", type=int, default=3)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--sampled", action="store_true",
                   help="bench speculative sampling instead of greedy")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from _common import build_mllm_bf16
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.eval.speculative import make_speculative_generate_fn
    from tsue_tpu.ops.sampling import SamplingConfig

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    mllm, variables, (vision, ids, mask) = build_mllm_bf16(
        batch_size=args.bs, prompt_len=args.prompt_len)
    vocab = mllm.llama.vocab_size
    loop_ids = jnp.tile(
        jnp.asarray(np.random.default_rng(1).integers(
            3, 50000, (args.bs, 8)), jnp.int32),
        (1, -(-args.prompt_len // 8)))[:, :args.prompt_len]
    if args.sampled:
        workloads = {
            "looping": (SamplingConfig(do_sample=True, temperature=0.25,
                                       repetition_penalty=1.0,
                                       no_repeat_ngram_size=0), loop_ids),
            "wandering": (SamplingConfig(), ids),  # full HF default chain
        }
    else:
        workloads = {
            "looping": (SamplingConfig(do_sample=False,
                                       repetition_penalty=1.0,
                                       no_repeat_ngram_size=0), loop_ids),
            "wandering": (SamplingConfig(do_sample=False,
                                         repetition_penalty=1.2,
                                         no_repeat_ngram_size=3), ids),
        }
    key = jax.random.key(0)
    results = {}
    for name, (cfg, pids) in workloads.items():
        plain = make_generate_fn(mllm, cfg, args.max_new, args.prompt_len,
                                 eos_id=vocab - 1, pad_id=0)
        spec = make_speculative_generate_fn(
            mllm, cfg, args.max_new, args.prompt_len, eos_id=vocab - 1,
            pad_id=0, window=args.window, draft_ngram=args.draft_ngram,
            with_stats=True)
        t0 = time.time()
        ref = np.asarray(plain(variables, vision, pids, mask, key))
        got, n_fwd = jax.block_until_ready(
            spec(variables, vision, pids, mask, key))
        log(f"{name}: compiled+warm in {time.time()-t0:.1f}s")
        if args.sampled:
            # sampled arms use per-row chain keys; the plain scan's
            # shared-key chain draws different tokens from the SAME
            # distribution — agreement is not meaningful here
            agree = None
        else:
            # agreement is bitwise in exact arithmetic (pinned on CPU in
            # tests); in bf16 the Tq=W window forward can differ from the
            # Tq=1 step at ulp level and flip near-tied argmaxes (same
            # class as the chunked-scan caveat in eval/generation.py)
            agree = float((np.asarray(got) == ref).mean())
            log(f"{name}: token agreement vs plain {agree:.4f}")
        tok_per_fwd = args.max_new / float(np.asarray(n_fwd).mean())
        best = {"plain": float("inf"), "spec": float("inf")}
        for w in range(args.windows):
            for arm, fn in (("plain", plain), ("spec", spec)):
                t0 = time.time()
                for _ in range(args.iters):
                    jax.block_until_ready(
                        fn(variables, vision, pids, mask, key))
                dt = (time.time() - t0) / args.iters
                best[arm] = min(best[arm], dt)
                log(f"  w{w} {name}/{arm}: {dt*1000:.0f} ms/call")
        tok = args.bs * args.max_new
        results[name] = {
            "plain_tok_s": round(tok / best["plain"], 1),
            "spec_tok_s": round(tok / best["spec"], 1),
            "speedup": round(best["plain"] / best["spec"], 3),
            "tok_per_fwd": round(tok_per_fwd, 2),
            "token_agreement": (None if agree is None else round(agree, 4)),
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
