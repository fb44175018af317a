"""No-LLM ablation — mirrors ref scripts/ablation_study.py (6->30)."""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage2
    cfg = apply_overrides(get_preset("ablation_no_llm"), args)
    finish(run_stage2(cfg, args.data, args.out_dir, epochs=args.epochs,
                      synthetic_tracks=args.synthetic_tracks))


if __name__ == "__main__":
    main()
