"""K=10 MC-dropout candidate eval — mirrors ref scripts/test_10.py.

Evaluates minADE/minFDE/minRMSE with vmapped explicit-RNG candidates.
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--preset", default="test_6_12")
    p.add_argument("--ckpt", default=None, help="trained checkpoint dir")
    p.add_argument("--mllm-ckpt", default=None,
                   help="stage-1 MLLM artifact the checkpoint was trained "
                        "with (required when training used --mllm-ckpt)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--candidate-mode", default="fast",
                   choices=("fast", "parity"))
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage2
    cfg = apply_overrides(get_preset(args.preset), args)
    finish(run_stage2(cfg, args.data, args.out_dir,
                      mllm_ckpt=args.mllm_ckpt, epochs=args.epochs or 0,
                      eval_candidates=args.k, restore_ckpt=args.ckpt,
                      synthetic_tracks=args.synthetic_tracks,
                      candidate_mode=args.candidate_mode,
                      tokenizer_path=args.tokenizer))


if __name__ == "__main__":
    main()
