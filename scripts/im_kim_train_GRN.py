"""Joint end-to-end trainer — mirrors ref scripts/im_kim_train_GRN.py (joint_24_24).
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--viz-every", type=int, default=0,
                   help="every N epochs: val-sample plot + generated text "
                        "(ref scripts/train.py:1226-1247; 0 disables)")
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage2
    cfg = apply_overrides(get_preset("joint_24_24"), args)
    finish(run_stage2(cfg, args.data, args.out_dir, epochs=args.epochs,
                      eval_candidates=0, viz_every=args.viz_every,
                      synthetic_tracks=args.synthetic_tracks,
                      tokenizer_path=args.tokenizer))


if __name__ == "__main__":
    main()
