"""cv baseline — mirrors ref scripts/baseline_cv.py (6->30)."""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--k", type=int, default=0,
                   help="K-candidate eval (ref test_baseline_* scripts)")
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_baseline
    cfg = apply_overrides(get_preset("ablation_no_llm"), args)
    finish(run_baseline("cv", cfg, args.data, args.out_dir,
                        epochs=args.epochs, eval_candidates=args.k,
                        synthetic_tracks=args.synthetic_tracks))


if __name__ == "__main__":
    main()
