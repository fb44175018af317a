"""Interleaved A/B: continuous (slot-refill) vs batch-synchronous
scheduling for variable-length generation (serve_batching.py).

Both arms run the IDENTICAL jitted programs over the same request set
with per-request PRNG keys, so they produce byte-identical outputs
(asserted); the only difference is run(refill=...) — whether a finished
slot is refilled immediately or the pool drains before re-admitting
(the static generator's policy).  Output-length variance comes from
per-request max_new caps drawn uniformly from [min-new, max-new] with a
fixed seed: with random weights EOS essentially never fires at a 128k
vocab, so caps are the deterministic stand-in for natural early stops.

    python scripts/ab_continuous.py [--slots 16] [--requests 64]

``--speculative W`` adds the batcher's window mode (serve_batching.py)
as a third dimension: a 2x2 interleaved grid (refill x window in
{1, W}) on a TEMPLATED workload — periodic prompts at a peaked
temperature (the regime where prompt-lookup acceptance is high, see
scripts/ab_speculative.py) — demonstrating that the scheduling win and
the speculation win compose multiplicatively.  Window-mode outputs are
bitwise the plain pool's in exact arithmetic (pinned in
tests/test_serve_batching.py); in bf16 the Tq=W forward can flip
near-tied draws, so cross-window agreement is reported, not asserted.

Prints one JSON line {variant: tok_per_sec, ...}.
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
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=144)
    p.add_argument("--min-new", type=int, default=8)
    p.add_argument("--max-new", type=int, default=64)
    p.add_argument("--chunk", type=int, default=8)
    p.add_argument("--windows", type=int, default=3)
    p.add_argument("--speculative", type=int, default=0, metavar="W",
                   help="also run the speculative window-W pool on a "
                        "templated (periodic, peaked-T) workload — the "
                        "combined scheduling+speculation grid")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import numpy as np
    from _common import build_mllm_bf16
    from tsue_tpu.ops.sampling import SamplingConfig
    from tsue_tpu.serve_batching import ContinuousBatcher

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    mllm, variables, (vision, ids, mask) = build_mllm_bf16(
        batch_size=args.requests, prompt_len=args.prompt_len)
    vocab = mllm.llama.vocab_size
    if args.speculative:
        # templated workload: periodic prompts + peaked sampled config
        # (high prompt-lookup acceptance — ab_speculative's "looping")
        import jax.numpy as jnp
        ids = jnp.tile(
            jnp.asarray(np.random.default_rng(1).integers(
                3, 50000, (args.requests, 8)), jnp.int32),
            (1, -(-args.prompt_len // 8)))[:, :args.prompt_len]
        sampling = SamplingConfig(do_sample=True, temperature=0.25,
                                  repetition_penalty=1.0,
                                  no_repeat_ngram_size=0)
    else:
        sampling = SamplingConfig()
    batcher = ContinuousBatcher(
        mllm, variables, sampling, num_slots=args.slots,
        prompt_len=args.prompt_len, max_new_tokens=args.max_new,
        eos_id=vocab - 1, pad_id=0, chunk=args.chunk)
    spec_batcher = ContinuousBatcher(
        mllm, variables, sampling, num_slots=args.slots,
        prompt_len=args.prompt_len, max_new_tokens=args.max_new,
        eos_id=vocab - 1, pad_id=0, chunk=args.chunk,
        window=args.speculative) if args.speculative else None

    caps = np.random.default_rng(0).integers(
        args.min_new, args.max_new + 1, args.requests)
    base = jax.random.key(7)
    requests = [{"vision": vision[i], "prompt_ids": ids[i],
                 "prompt_mask": mask[i], "max_new": int(caps[i]),
                 "rng": jax.random.fold_in(base, i)}
                for i in range(args.requests)]
    total_tok = int(caps.sum())
    log(f"{args.requests} requests, caps {args.min_new}-{args.max_new} "
        f"(mean {caps.mean():.1f}), {total_tok} tokens total")

    # warmup: compiles admit buckets / decode chunk / release.  Schedule
    # equality is exact in exact arithmetic (pinned on the CPU mesh in
    # tests/test_serve_batching.py); on-chip bf16 the two schedules
    # admit in different bucket SHAPES (A=1 prefill vs A=16), and a
    # program-shape change can flip near-tied draws at ulp level (the
    # standard formulation caveat) — so agreement is reported, not
    # asserted.
    t0 = time.time()
    ref = batcher.run(requests, refill=True)
    log(f"warmup+compile {time.time()-t0:.1f}s")
    sync = batcher.run(requests, refill=False)
    same = sum(np.array_equal(a, b) for a, b in zip(ref, sync))
    log(f"schedule agreement: {same}/{len(ref)} requests identical "
        "(bf16 admission-shape flips expected on a real chip)")

    arms = [("continuous", batcher, True), ("batch_sync", batcher, False)]
    if spec_batcher is not None:
        t0 = time.time()
        spec = spec_batcher.run(requests, refill=True)
        log(f"speculative warmup+compile {time.time()-t0:.1f}s")
        same = sum(np.array_equal(a, b) for a, b in zip(ref, spec))
        log(f"window-mode outputs match plain on {same}/{len(ref)} "
            "requests (bf16 near-tie flips expected on a real chip)")
        arms += [("continuous_spec", spec_batcher, True),
                 ("batch_sync_spec", spec_batcher, False)]

    best = {name: float("inf") for name, _, _ in arms}
    for w in range(args.windows):
        for name, b, refill in arms:
            t0 = time.time()
            out = b.run(requests, refill=refill)
            dt = time.time() - t0
            assert sum(len(o) for o in out) == total_tok
            best[name] = min(best[name], dt)
            log(f"  w{w} {name}: {dt:.2f}s ({total_tok/dt:.0f} tok/s)")

    result = {n: round(total_tok / t, 1) for n, t in best.items()}
    result["speedup"] = round(best["batch_sync"] / best["continuous"], 3)
    if spec_batcher is not None:
        result["speedup_spec_over_plain"] = round(
            best["continuous"] / best["continuous_spec"], 3)
        result["speedup_combined"] = round(
            best["batch_sync"] / best["continuous_spec"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
