"""No-vision / dummy-text ablation — mirrors ref modify_scripts/modify_train2.py
(18->12) and modify_train3.py (18->6); pick via --horizon.
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--horizon", type=int, default=12, choices=(6, 12))
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage2
    cfg = apply_overrides(
        get_preset(f"ablation_no_vision_18_{args.horizon}"), args)
    finish(run_stage2(cfg, args.data, args.out_dir, epochs=args.epochs,
                      synthetic_tracks=args.synthetic_tracks))


if __name__ == "__main__":
    main()
