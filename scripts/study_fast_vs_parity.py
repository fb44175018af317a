"""Fast-vs-parity K-candidate eval equivalence study (VERDICT r1 item 4).

The reference's K candidates come from ``model.train()`` inside ``no_grad``
(ref scripts/test.py:1308-1309): dropout is active in the WHOLE model —
LoRA dropout in the Llama and the Q-Former included.  tsue_tpu's "parity"
candidate mode reproduces that (K vmapped forwards of the full stochastic
model); "fast" mode computes the MLLM context deterministically once per
batch and samples only the forecaster dropout.

This study quantifies whether the two modes produce statistically
indistinguishable K-candidate metrics: it trains the mid-size TSUE stack
JOINTLY (so the Q-Former and LoRA adapters are trained, i.e. LLM-side
dropout has a real effect to measure) on the synthetic highway set, then
evaluates minADE/minFDE/minRMSE at K=10 in both modes across N eval seeds
and prints mean +/- std side by side.  Results are tabulated in PARITY.md;
tests/test_fast_vs_parity.py pins a smaller version.

Usage: python scripts/study_fast_vs_parity.py [--epochs 30] [--seeds 5]
"""
import json
import os

import numpy as np

from _common import base_parser


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
        name="study_fast_vs_parity",
        data=DataConfig(seq_len=18, out_len=18, max_length=640),
        model=model,
        train=TrainConfig(batch_size=16, freeze_regime="joint"))


def main():
    p = base_parser(__doc__)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--seeds", type=int, default=5)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tsue_tpu.parallel.mesh import make_mesh
    from tsue_tpu.runner import evaluate, rebuild_for_eval, run_stage2

    cfg = midsize_cfg()
    epochs = args.epochs if args.epochs is not None else 30
    print(f"training mid-size stack jointly for {epochs} epochs...")
    run_stage2(cfg, args.data, args.out_dir, epochs=epochs,
               eval_candidates=0, save_viz=False,
               synthetic_tracks=args.synthetic_tracks,
               tokenizer_path=args.tokenizer)

    # rebuild the identical model/data (same seeds => same split/windows)
    model, params, (_, _, dte) = rebuild_for_eval(
        cfg, args.data, args.out_dir, tokenizer_path=args.tokenizer,
        synthetic_tracks=args.synthetic_tracks)

    mesh = make_mesh(1)
    results = {"fast": [], "parity": []}
    with mesh:
        for mode in ("fast", "parity"):
            for s in range(args.seeds):
                m = evaluate(model, params, dte, cfg, mesh,
                             eval_candidates=args.k, viz_dir=None,
                             candidate_mode=mode, eval_seed=5000 + 977 * s)
                results[mode].append(
                    [m["min_ade"], m["min_fde"], m["min_rmse"]])
                print(f"  {mode:6s} seed {s}: minADE={m['min_ade']:.3f} "
                      f"minFDE={m['min_fde']:.3f} minRMSE={m['min_rmse']:.3f}")

    names = ("minADE", "minFDE", "minRMSE")
    summary = {}
    print(f"\n| metric | fast (mean+/-std, {args.seeds} seeds) | parity "
          f"(mean+/-std) | delta (% of parity) |")
    print("|---|---|---|---|")
    for j, name in enumerate(names):
        f = np.array([r[j] for r in results["fast"]])
        q = np.array([r[j] for r in results["parity"]])
        delta_pct = 100.0 * (f.mean() - q.mean()) / q.mean()
        summary[name] = {
            "fast_mean": float(f.mean()), "fast_std": float(f.std()),
            "parity_mean": float(q.mean()), "parity_std": float(q.std()),
            "delta_pct": float(delta_pct)}
        print(f"| {name} | {f.mean():.3f} +/- {f.std():.3f} "
              f"| {q.mean():.3f} +/- {q.std():.3f} | {delta_pct:+.2f}% |")
    out_path = os.path.join(args.out_dir, cfg.name, "study.json")
    with open(out_path, "w") as fp:
        json.dump({"k": args.k, "seeds": args.seeds, "epochs": epochs,
                   "summary": summary, "raw": results}, fp, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
