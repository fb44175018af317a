"""Stage-2 TSUE trainer — mirrors ref scripts/train.py (18->30, frozen MLLM).

Usage: python scripts/train.py [--data all_data.pkl] [--mllm-ckpt DIR] ...
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--preset", default="train_18_30")
    p.add_argument("--mllm-ckpt", default=None,
                   help="stage-1 MLLM checkpoint dir (import_mllm)")
    p.add_argument("--viz-every", type=int, default=0,
                   help="every N epochs: one val-sample plot + one "
                        "generated context paragraph (ref "
                        "scripts/train.py:1226-1247; 0 disables)")
    p.add_argument("--save-every", type=int, default=0,
                   help="checkpoint the full train state every N epochs "
                        "(params+optimizer+step; enables --resume)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the last --save-every state; the "
                        "continued run reproduces an uninterrupted one")
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage2
    cfg = apply_overrides(get_preset(args.preset), args)
    finish(run_stage2(cfg, args.data, args.out_dir, args.mllm_ckpt,
                      args.epochs, synthetic_tracks=args.synthetic_tracks,
                      viz_every=args.viz_every,
                      save_every=args.save_every, resume=args.resume,
                      tokenizer_path=args.tokenizer))


if __name__ == "__main__":
    main()
