"""DDPM diffusion trajectory generator — mirrors ref
modify_scripts/capstone_project.py (modes: generate = train+sample,
predict = eval a stage-2 checkpoint with time-series plots).
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--mode", default="generate",
                   choices=("generate", "predict"))
    p.add_argument("--ckpt", default=None)
    p.add_argument("--mllm-ckpt", default=None,
                   help="stage-1 MLLM artifact the checkpoint was trained "
                        "with (predict mode; required when training used "
                        "--mllm-ckpt)")
    p.add_argument("--cfg-scale", type=float, default=3.0)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--samples", type=int, default=5)
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    cfg = apply_overrides(get_preset("mllm_free_18_18"), args)
    if args.mode == "generate":
        from tsue_tpu.runner import run_diffusion
        finish(run_diffusion(cfg, args.data, args.out_dir,
                             epochs=args.epochs, cfg_scale=args.cfg_scale,
                             n_timestep=args.timesteps,
                             n_samples=args.samples,
                             synthetic_tracks=args.synthetic_tracks))
    else:
        from tsue_tpu.runner import run_stage2
        finish(run_stage2(cfg, args.data, args.out_dir,
                          mllm_ckpt=args.mllm_ckpt, epochs=0,
                          restore_ckpt=args.ckpt,
                          synthetic_tracks=args.synthetic_tracks,
                          tokenizer_path=args.tokenizer))


if __name__ == "__main__":
    main()
