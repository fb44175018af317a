"""Op-level device-time profile of a production program.

Traces one of the hot workloads with ``jax.profiler`` and prints the
per-HLO-op device-time aggregation (utils/xplane.py — no TensorBoard
needed).  The r3 decode-step profile in PARITY.md came from this flow.

    python scripts/profile_ops.py --workload decode [--out /tmp/trace]
    python scripts/profile_ops.py --workload forward
    python scripts/profile_ops.py --parse /tmp/trace   # re-parse only
"""
from _common import base_parser  # noqa: F401  (sys.path setup)
import argparse
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_workload(name: str, out_dir: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tsue_tpu.utils.jax_cache import configure
    configure(jax, min_secs=5.0)

    if name == "decode":
        from tsue_tpu.config import LlamaConfig, QFormerConfig
        from tsue_tpu.eval.generation import make_generate_fn
        from tsue_tpu.models.fusion import MultiModalLLM
        from tsue_tpu.ops.sampling import SamplingConfig
        vocab, prompt_len, bs = 128256, 144, 16
        mllm = MultiModalLLM(LlamaConfig(vocab_size=vocab), QFormerConfig(),
                             dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        vision = jnp.asarray(rng.standard_normal((bs, 18, 512)), jnp.float32)
        ids = jnp.asarray(rng.integers(3, 50000, (bs, prompt_len)), jnp.int32)
        mask = jnp.ones((bs, prompt_len), jnp.int32)
        variables = jax.jit(lambda v, i, m: mllm.init(
            {"params": jax.random.key(0)}, v, i, m, True))(
                vision[:1], ids[:1], mask[:1])
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables)
        gen = make_generate_fn(mllm, SamplingConfig(), 64, prompt_len,
                               eos_id=vocab - 1, pad_id=0)
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
                   choices=["decode", "forward"])
    p.add_argument("--out", default="/tmp/tsue_profile")
    p.add_argument("--parse", default=None,
                   help="skip tracing; parse this trace dir")
    p.add_argument("--plane", default="TPU")
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tsue_tpu.utils.xplane import find_xplane, op_durations, summarize
    trace_dir = args.parse or run_workload(args.workload, args.out)
    pb = find_xplane(trace_dir)
    log(f"parsing {pb}")
    print(summarize(op_durations(pb, plane_filter=args.plane),
                    top=args.top))


if __name__ == "__main__":
    main()
