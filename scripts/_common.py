"""Shared CLI plumbing for the thin entry-point scripts.

Each script mirrors one reference entry point (SURVEY.md §2.7) as
``python scripts/<name>.py [--data all_data.pkl] [--epochs N] ...`` instead
of a hard-coded args dict + torchrun.  Multi-host runs need no launcher
changes: `jax.distributed` picks up the TPU pod environment automatically.
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize pins JAX_PLATFORMS=axon (remote TPU);
# TSUE_PLATFORM=cpu (or --platform cpu) forces local CPU — required for
# smoke runs because *eager* ops round-trip the remote tunnel (~100ms each).
if os.environ.get("TSUE_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["TSUE_PLATFORM"])


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--data", default=None,
                   help="path to all_data.pkl (synthetic fixture if absent)")
    p.add_argument("--out-dir", default="runs")
    p.add_argument("--epochs", type=int, default=None,
                   help="override preset epoch count")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--synthetic-tracks", type=int, default=40)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (smoke runs / no TPU)")
    p.add_argument("--platform", default=None, choices=("cpu", "axon"),
                   help="force a JAX platform (default: environment)")
    p.add_argument("--tokenizer", default=None,
                   help="local HF tokenizer path/name (byte tokenizer if "
                        "unset or unavailable)")
    p.add_argument("--rng-impl", default=None,
                   choices=("threefry2x32", "rbg"),
                   help="training PRNG: threefry2x32 (default, bit-stable "
                        "across backends) or rbg (TPU hardware RNG, "
                        "measured -11%% on the 1B frozen train step)")
    p.add_argument("--loss-chunk", type=int, default=None,
                   help="compute the LM loss in sequence chunks of this "
                        "size — no (B,T,128256) logit materialization, "
                        "identical numerics (models/llama.py).  T/2 "
                        "measured best at the 1B dims: bs16+chunk264 = "
                        "32.6 ms/sample vs 45.4 at bs8+chunk128 "
                        "(scripts/ab_stage1_shape.py)")
    p.add_argument("--remat", action="store_true",
                   help="per-layer Llama rematerialization — required for "
                        "full-backward (joint/stage-1) training of the "
                        "1.31B model on one chip (unless --loss-chunk "
                        "frees enough HBM on the stage-1 side)")
    p.add_argument("--remat-policy", default=None,
                   choices=("full", "dots", "dots_no_batch"),
                   help="checkpoint policy under remat (implies --remat): "
                        "full = recompute everything (minimum memory), "
                        "dots = save matmul outputs and recompute only "
                        "elementwise ops (measured -10.7%% on the 1.31B "
                        "joint step, ~0.4 GB/layer of activation memory)")
    p.add_argument("--length-buckets", default=None,
                   help="comma-separated static text-length buckets "
                        "(e.g. 256,384,512 — the preset default): batches "
                        "are trimmed to the smallest bucket covering their "
                        "longest text row (metric-neutral, measured +30-69%% "
                        "eval throughput).  'none' disables bucketing")
    return p


def parse_length_buckets(spec: str):
    """'256,384,512' -> (256, 384, 512); 'none'/''/'0' -> ()."""
    if spec.strip().lower() in ("none", "", "0", "off"):
        return ()
    try:
        buckets = tuple(sorted(int(s) for s in spec.split(",")))
    except ValueError:
        raise SystemExit(f"--length-buckets: cannot parse {spec!r} "
                         "(want e.g. 256,384,512 or 'none')")
    if any(b <= 0 for b in buckets):
        raise SystemExit("--length-buckets: buckets must be positive")
    return buckets


def add_roi_args(p: argparse.ArgumentParser) -> None:
    """--roi/--site/--zone for the lane-ROI viz CLIs (graph.py, plot.py)."""
    p.add_argument("--roi", default=None,
                   help="lane-ROI table: reference graph.py-format .py, "
                        ".json, or .pkl; the literal 'synthetic' selects "
                        "the parametric stand-in (default: --data's table, "
                        "else the vendored Site-C reference table)")
    p.add_argument("--site", default=None,
                   help="site key in the ROI table (default: auto when the "
                        "table has exactly one site, else an error listing "
                        "the available keys)")
    p.add_argument("--zone", default=None, help="zone key (same defaulting)")


def resolve_roi(args):
    """ROI source precedence: --roi table > --data pickle > the vendored
    Site-C reference table (ref scripts/graph.py:7-216), so the viz CLIs
    reproduce the reference map with zero flags.  ``--roi synthetic``
    selects the parametric stand-in."""
    from tsue_tpu.data.schema import (load_lane_roi, load_tracks,
                                      load_vendored_lane_roi,
                                      make_synthetic_lane_roi)
    if args.roi == "synthetic":
        return make_synthetic_lane_roi()
    if args.roi:
        return load_lane_roi(args.roi)
    if args.data:
        return load_tracks(args.data)[0]["lane_roi"]
    return load_vendored_lane_roi()


def apply_overrides(cfg, args):
    if getattr(args, "platform", None):
        import jax
        jax.config.update("jax_platforms", args.platform)
    # multi-host process-group init (ref torchrun+init_process_group,
    # train.py:1044-1049); env-gated no-op on single-host runs
    from tsue_tpu.parallel.mesh import initialize_distributed
    initialize_distributed()
    tr = cfg.train
    if args.batch_size is not None:
        tr = dataclasses.replace(tr, batch_size=args.batch_size)
    if args.lr is not None:
        tr = dataclasses.replace(tr, lr=args.lr)
    if getattr(args, "rng_impl", None):
        tr = dataclasses.replace(tr, rng_impl=args.rng_impl)
    cfg = dataclasses.replace(cfg, train=tr)
    if getattr(args, "length_buckets", None) is not None:
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data,
            length_buckets=parse_length_buckets(args.length_buckets)))
    ms = cfg.mesh
    if getattr(args, "pipeline_parallel", None):
        ms = dataclasses.replace(ms, pipeline_parallel=args.pipeline_parallel)
    if getattr(args, "microbatches", None):
        ms = dataclasses.replace(ms, microbatches=args.microbatches)
    if ms is not cfg.mesh:
        cfg = dataclasses.replace(cfg, mesh=ms)
    if getattr(args, "tiny", False):
        from tsue_tpu.config import (LlamaConfig, LaneEncoderConfig,
                                     LTSFConfig, ModelConfig, QFormerConfig)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model,
            llama=LlamaConfig.tiny(),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data, max_length=640))
    # after --tiny so the flags survive the tiny LlamaConfig swap
    if getattr(args, "loss_chunk", None) is not None:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, llama=dataclasses.replace(
                cfg.model.llama, loss_chunk=args.loss_chunk)))
    if getattr(args, "remat", False) or getattr(args, "remat_policy", None):
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, llama=dataclasses.replace(
                cfg.model.llama, remat=True,
                remat_policy=(args.remat_policy or
                              cfg.model.llama.remat_policy))))
    return cfg


def finish(metrics: dict):
    print(json.dumps(metrics))


def baseline_main(name: str, doc: str, default_k: int = 0):
    """Shared main() for the eleven baseline/test-baseline CLIs."""
    p = base_parser(doc)
    p.add_argument("--k", type=int, default=default_k,
                   help="K-candidate eval (ref test_baseline_* scripts)")
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_baseline
    cfg = apply_overrides(get_preset("ablation_no_llm"), args)
    finish(run_baseline(name, cfg, args.data, args.out_dir,
                        epochs=args.epochs, eval_candidates=args.k,
                        synthetic_tracks=args.synthetic_tracks))


def build_mllm_bf16(batch_size: int = 16, prompt_len: int = 144,
                    vocab: int = 128256):
    """Real-vocab 1B MLLM in bf16 + synthetic inputs — the shared decode
    micro-bench substrate.  Returns (mllm, variables, (vision, ids, mask))."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.models.fusion import MultiModalLLM

    mllm = MultiModalLLM(LlamaConfig(vocab_size=vocab), QFormerConfig(),
                         dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vision = jnp.asarray(rng.standard_normal((batch_size, 18, 512)),
                         jnp.float32)
    ids = jnp.asarray(rng.integers(3, min(vocab, 50000),
                                   (batch_size, prompt_len)), jnp.int32)
    mask = jnp.ones((batch_size, prompt_len), jnp.int32)
    variables = jax.jit(lambda v, i, m: mllm.init(
        {"params": jax.random.key(0)}, v, i, m, True))(
            vision[:1], ids[:1], mask[:1])
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    return mllm, variables, (vision, ids, mask)


def build_decode_workload(batch_size: int = 16, prompt_len: int = 144,
                          vocab: int = 128256, max_new: int = 64):
    """The canonical decode micro-bench setup shared by ab_decode_attn /
    profile_ops: real-vocab 1B MLLM in bf16 + a jittable generate fn.
    Returns (gen, variables, (vision, ids, mask))."""
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.ops.sampling import SamplingConfig

    mllm, variables, data = build_mllm_bf16(batch_size, prompt_len, vocab)
    gen = make_generate_fn(mllm, SamplingConfig(), max_new, prompt_len,
                           eos_id=vocab - 1, pad_id=0)
    return gen, variables, data
