"""K=5 candidate eval for stgcnn — mirrors ref scripts/test_baseline_stgcnn.py."""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--k", type=int, default=5)
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_baseline
    cfg = apply_overrides(get_preset("ablation_no_llm"), args)
    finish(run_baseline("stgcnn", cfg, args.data, args.out_dir,
                        epochs=args.epochs, eval_candidates=args.k,
                        synthetic_tracks=args.synthetic_tracks))


if __name__ == "__main__":
    main()
