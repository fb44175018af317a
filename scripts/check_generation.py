"""Stage-1 MLLM trainer + generation eval — mirrors ref
scripts/check_generation.py (plus the missing training loop).

Writes test_generation_results.txt and optionally exports the MLLM
checkpoint for stage 2 (--export).
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--export", default=None,
                   help="export trained MLLM params to this dir")
    p.add_argument("--pipeline-parallel", type=int, default=None,
                   help="GPipe pipeline stages over the Llama decoder "
                        "depth (parallel/pipeline.py); must divide both "
                        "the device count and num_layers")
    p.add_argument("--microbatches", type=int, default=None,
                   help="GPipe microbatch upper bound (clamped to the "
                        "largest divisor of the per-data-shard batch)")
    args = p.parse_args()  # --remat/--loss-chunk etc. live in base_parser
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage1
    cfg = apply_overrides(get_preset("train_18_30"), args)
    finish(run_stage1(cfg, args.data, args.out_dir, epochs=args.epochs,
                      export_path=args.export,
                      synthetic_tracks=args.synthetic_tracks,
                      generation_dump="test_generation_results.txt",
                      tokenizer_path=args.tokenizer))


if __name__ == "__main__":
    main()
