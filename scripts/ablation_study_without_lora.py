"""No-LoRA ablation — mirrors ref scripts/ablation_study_without_lora.py.

A LoRA stage-1 checkpoint can be loaded via --mllm-ckpt; lora leaves are
stripped to fit the no-LoRA model (ref :1070-1084 key surgery).
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--mllm-ckpt", default=None)
    args = p.parse_args()
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage2
    cfg = apply_overrides(get_preset("ablation_no_lora"), args)
    finish(run_stage2(cfg, args.data, args.out_dir, args.mllm_ckpt,
                      args.epochs, synthetic_tracks=args.synthetic_tracks,
                      tokenizer_path=args.tokenizer))


if __name__ == "__main__":
    main()
