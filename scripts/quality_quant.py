"""Quantized-decode QUALITY evidence at the real Llama-1B dims.

VERDICT r3 #7: one step of logit closeness does not bound drift over an
autoregressive rollout.  This script measures, for each opt-in quant mode
(int8 weights / int8 KV / both) against the bf16 baseline:

1. 64-token GREEDY generation agreement: per-row exact-sequence rate,
   token agreement, and mean matched-prefix length (drift shows up as
   short prefixes even when single-step logits are close);
2. the same under the production SAMPLED chain (same keys both arms —
   ulp-level logit shifts near sampling thresholds flip draws, so this is
   the operator-facing "will my sampled outputs change" number);
3. teacher-forced logit drift: decode the baseline's OWN greedy tokens
   through the quantized variant and record per-step max/mean |Δlogit|
   over all 64 steps — the autoregressive error-accumulation bound the
   first-step table in PARITY.md lacks.

Trajectory K-candidate metrics are NOT affected by these modes by
construction: the stage-2 rollout consumes the MLLM's deterministic
hidden-state context (eval/metrics.py fast_candidate_rollout), never a
sampled decode, and `quant_ok` gates the int8 paths to decode calls only
(ops/quant.py) — pinned bit-identical in tests/test_quant.py.

    python scripts/quality_quant.py [--bs 16] [--max-new 64]

Prints one JSON dict; PARITY.md carries the measured table.
"""
from _common import base_parser  # noqa: F401  (sys.path setup)
import argparse
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=144)
    p.add_argument("--max-new", type=int, default=64)
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
    from tsue_tpu.ops.quant import with_quantized_decode
    from tsue_tpu.ops.sampling import SamplingConfig

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")
    bs, P, N = args.bs, args.prompt_len, args.max_new
    mllm, variables, (vision, ids, mask) = build_mllm_bf16(
        batch_size=bs, prompt_len=P)
    vocab = mllm.llama.vocab_size
    qvars = with_quantized_decode(variables)
    modes = {"int8_w": (qvars, False), "int8_kv": (variables, True),
             "both": (qvars, True)}
    key = jax.random.key(0)
    result = {}

    def agreement(ref, out):
        eq = ref == out
        prefix = np.argmin(np.pad(eq, ((0, 0), (0, 1)),
                                  constant_values=False), axis=1)
        return {"seq_agree": round(float(eq.all(axis=1).mean()), 4),
                "tok_agree": round(float(eq.mean()), 4),
                "mean_prefix": round(float(prefix.mean()), 1)}

    for sname, cfg in [("greedy", SamplingConfig(do_sample=False)),
                       ("sampled", SamplingConfig())]:
        gens = {"bf16": make_generate_fn(mllm, cfg, N, P, eos_id=vocab - 1,
                                         pad_id=0)}
        for mname, (_, qkv) in modes.items():
            gens[mname] = make_generate_fn(mllm, cfg, N, P,
                                           eos_id=vocab - 1, pad_id=0,
                                           quantize_kv=qkv)
        ref = np.asarray(gens["bf16"](variables, vision, ids, mask, key))
        for mname, (vs, _) in modes.items():
            out = np.asarray(gens[mname](vs, vision, ids, mask, key))
            result[f"{sname}_{mname}"] = agreement(ref, out)
            log(sname, mname, result[f"{sname}_{mname}"])

    # teacher-forced logit drift along the baseline's greedy trajectory
    greedy = SamplingConfig(do_sample=False)
    gen_ref = make_generate_fn(mllm, greedy, N, P, eos_id=vocab - 1,
                               pad_id=0)
    ref_toks = jnp.asarray(np.asarray(
        gen_ref(variables, vision, ids, mask, key)))
    cache_len = mllm.qformer.num_query_tokens + P + N

    def rollout_logits(vs, quantize_kv):
        @jax.jit
        def f(vs, vision, ids, mask, toks):
            caches, last_hidden, prefix_len, fmask = mllm.apply(
                vs, vision, ids, mask, cache_len, method=mllm.prefill)
            if quantize_kv:
                from tsue_tpu.ops.kv_quant import quantize_cache
                caches = quantize_cache(caches)
            l0 = mllm.apply(
                vs, last_hidden,
                method=lambda m, h: m.llama_mod.logits_from_hidden(
                    h, quant_ok=True))

            def body(carry, xs):
                caches = carry
                tok, step = xs
                lg, caches = mllm.apply(
                    vs, tok, step, prefix_len, caches, fmask, cache_len,
                    method=mllm.decode_step)
                return caches, lg

            _, ls = jax.lax.scan(
                body, caches,
                (jnp.swapaxes(toks, 0, 1), jnp.arange(toks.shape[1])))
            return jnp.concatenate([l0[None], ls], axis=0)  # (N+1, B, V)

        return np.asarray(f(vs, vision, ids, mask, ref_toks),
                          np.float32)

    base = rollout_logits(variables, False)
    for mname, (vs, qkv) in modes.items():
        q = rollout_logits(vs, qkv)
        d = np.abs(base - q)
        result[f"drift_{mname}"] = {
            "max_abs_dlogit": round(float(d.max()), 4),
            "mean_abs_dlogit": round(float(d.mean()), 5),
            "last_step_max": round(float(d[-1].max()), 4),
            "top1_agree": round(float(
                (base.argmax(-1) == q.argmax(-1)).mean()), 4),
            "logit_std": round(float(base.std()), 3),
        }
        log("drift", mname, result[f"drift_{mname}"])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
