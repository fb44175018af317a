"""Realistic speculative-decoding acceptance probe (eval/speculative.py).

scripts/ab_speculative.py bounds the win with synthetic workloads on
RANDOM weights (looping ceiling / wandering floor); this study measures
the realistic middle: a mid-size byte-level MLLM is stage-1 fine-tuned
on the synthetic traffic contexts until it actually generates the
templated paragraphs, then greedy generation from held-out prompts is
timed plain vs speculative (interleaved, one process).  The acceptance
rate (tokens per forward) on learned templated text is the number the
synthetic bounds cannot give.

Usage: python scripts/study_speculative_acceptance.py [--epochs 30]
Prints one JSON line {tok_per_fwd, plain_tok_s, spec_tok_s, speedup, ...}.
"""
import dataclasses
import json
import sys
import time

from _common import base_parser


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def midsize_cfg():
    from tsue_tpu.config import (DataConfig, ExperimentConfig,
                                 LaneEncoderConfig, LlamaConfig, LTSFConfig,
                                 ModelConfig, QFormerConfig, TrainConfig)
    llama = LlamaConfig(vocab_size=384, hidden_size=256,
                        intermediate_size=1024, num_layers=4, num_heads=8,
                        num_kv_heads=4, head_dim=32, rope_scaling_factor=1.0)
    model = ModelConfig(
        llama=llama,
        qformer=QFormerConfig(hidden_size=128, num_heads=8,
                              num_encoder_layers=2, num_decoder_layers=2,
                              num_query_tokens=8),
        lane=LaneEncoderConfig(), ltsf=LTSFConfig())
    return ExperimentConfig(
        name="study_spec_accept",
        data=DataConfig(seq_len=18, out_len=18, max_length=640),
        model=model, train=TrainConfig(batch_size=16))


def main():
    p = base_parser(__doc__)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--draft-ngram", type=int, default=3)
    p.add_argument("--max-new", type=int, default=96)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--processors", choices=("none", "hf"), default="none",
                   help="'hf' = repetition_penalty 1.2 + no_repeat_ngram 3 "
                        "(the reference's sampled-decode settings) — at "
                        "BYTE granularity these penalize every previously "
                        "seen character and derail templated regeneration, "
                        "so the realistic byte-level serving config is "
                        "'none' (pure greedy)")
    p.add_argument("--split", choices=("train", "test"), default="train",
                   help="prompt source: 'train' probes the converged/"
                        "memorized regime (the templated-serving case); "
                        "'test' probes held-out generalization, which at "
                        "this model scale is mostly noise")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from tsue_tpu.data import get_tokenizer
    from tsue_tpu.eval.generation import make_generate_fn, prompt_only
    from tsue_tpu.eval.speculative import make_speculative_generate_fn
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.ops.sampling import SamplingConfig
    from tsue_tpu.runner import prepare_data, run_stage1
    from tsue_tpu.train.checkpoint import restore_pytree

    try:
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    log(f"device: {jax.devices()[0]}")

    cfg = midsize_cfg()
    epochs = args.epochs if args.epochs is not None else 100
    ntracks = args.synthetic_tracks or 20
    export = f"{args.out_dir}/spec_accept_mllm"
    log(f"stage-1 fine-tuning mid-size byte MLLM for {epochs} epochs...")
    out = run_stage1(cfg, args.data, args.out_dir, epochs=epochs,
                     export_path=export, synthetic_tracks=ntracks,
                     tokenizer_path=args.tokenizer)
    log(f"final LM loss: {out['final_lm_loss']:.3f}")

    tokenizer = get_tokenizer(args.tokenizer)
    dtr, _, dte = prepare_data(cfg, args.data, tokenizer, ntracks)
    dte = dtr if args.split == "train" else dte
    llama = dataclasses.replace(cfg.model.llama,
                                vocab_size=tokenizer.vocab_size)
    mllm = MultiModalLLM(llama=llama, qformer=cfg.model.qformer,
                         use_vision=cfg.model.use_vision)
    b = dte.slice(np.arange(min(args.bs, len(dte)))).as_batch_dict()
    ids, mask = prompt_only(b)
    vision = jnp.asarray(b["vision"])
    variables = {"params": restore_pytree(export)}

    greedy = (SamplingConfig(do_sample=False) if args.processors == "hf"
              else SamplingConfig(do_sample=False, repetition_penalty=1.0,
                                  no_repeat_ngram_size=0))
    P = ids.shape[1]
    plain = make_generate_fn(mllm, greedy, args.max_new, P,
                             eos_id=tokenizer.eos_id,
                             pad_id=tokenizer.pad_id)
    spec = make_speculative_generate_fn(
        mllm, greedy, args.max_new, P, eos_id=tokenizer.eos_id,
        pad_id=tokenizer.pad_id, window=args.window,
        draft_ngram=args.draft_ngram, with_stats=True)
    key = jax.random.key(0)
    av = (jnp.asarray(ids), jnp.asarray(mask))
    ref = np.asarray(plain(variables, vision, *av, key))
    got, n_fwd = jax.block_until_ready(spec(variables, vision, *av, key))
    got, n_fwd = np.asarray(got), np.asarray(n_fwd)
    # count real (pre-EOS) tokens: acceptance only matters where rows live
    def emitted(rows):
        tot = 0
        for r in rows:
            e = np.nonzero(r == tokenizer.eos_id)[0]
            tot += (int(e[0]) + 1) if e.size else len(r)
        return tot
    tok_spec = emitted(got)
    agree = float((got == ref).mean())
    tok_per_fwd = tok_spec / float(n_fwd.sum())
    log(f"tokens/forward: {tok_per_fwd:.2f} "
        f"(emitted {tok_spec}, forwards {int(n_fwd.sum())}); "
        f"agreement {agree:.4f}")
    from tsue_tpu.eval.generation import trim_and_decode
    log("sample generation: "
        f"{trim_and_decode(got[0], tokenizer)[:120]!r}")

    best = {"plain": float("inf"), "spec": float("inf")}
    for w in range(args.reps):
        for arm, fn in (("plain", plain), ("spec", spec)):
            t0 = time.time()
            jax.block_until_ready(fn(variables, vision, *av, key))
            dt = time.time() - t0
            best[arm] = min(best[arm], dt)
            log(f"  w{w} {arm}: {dt*1000:.0f} ms/call")
    print(json.dumps({
        "tok_per_fwd": round(tok_per_fwd, 2),
        "token_agreement": round(agree, 4),
        "plain_tok_s": round(emitted(ref) / best["plain"], 1),
        "spec_tok_s": round(tok_spec / best["spec"], 1),
        "speedup": round(best["plain"] / best["spec"], 3),
        "final_lm_loss": round(out["final_lm_loss"], 3),
        "window": args.window, "epochs": epochs, "split": args.split}))


if __name__ == "__main__":
    main()
