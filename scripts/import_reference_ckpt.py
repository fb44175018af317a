"""Migrate a reference torch checkpoint into this framework.

Converts the reference's stage-1 MLLM artifact (``mllm_lora_ddp_finetuned.pt``,
a torch state_dict of its LlamaMultiModal module) into an Orbax checkpoint
that ``scripts/train.py --mllm-ckpt`` consumes directly:

    python scripts/import_reference_ckpt.py \
        --torch-ckpt mllm_lora_ddp_finetuned.pt --out runs/mllm_imported
    python scripts/train.py --mllm-ckpt runs/mllm_imported

Use --strip-lora for the no-LoRA ablation target
(ref scripts/ablation_study_without_lora.py:1070-1084 key surgery).

--stage2 converts a full stage-2 ``MultiModalTrajectoryModel`` state_dict
(lane encoder + MLLM + LTSF forecaster, saved whole at ref
scripts/train.py:1219-1224) into a checkpoint that the eval CLIs consume:

    python scripts/import_reference_ckpt.py --stage2 \
        --torch-ckpt best_val_checkpoint.pt --preset train_18_30 \
        --out runs/ref_stage2
    python scripts/test.py --preset train_18_30 --ckpt runs/ref_stage2
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--strip-lora", action="store_true")
    p.add_argument("--stage2", action="store_true",
                   help="checkpoint is a full stage-2 model state_dict "
                        "(ref train.py:1219-1224), not the stage-1 MLLM")
    p.add_argument("--preset", default="train_18_30",
                   help="preset giving the horizons/model config the "
                        "checkpoint was trained with (--stage2 only)")
    args = p.parse_args()
    import torch
    import jax
    from tsue_tpu.config import get_preset
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.models.torch_import import convert_reference_mllm, merge_into
    from tsue_tpu.train.checkpoint import save_pytree, strip_lora
    import jax.numpy as jnp
    import dataclasses

    cfg = apply_overrides(get_preset(args.preset), args)
    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    if args.stage2:
        from tsue_tpu.models.torch_import import convert_reference_stage2
        from tsue_tpu.models.tsue import TrajectoryModel
        import __graft_entry__ as ge
        d = cfg.data
        model = TrajectoryModel(cfg.model, d.seq_len, d.out_len)
        batch = ge._make_batch(cfg, 1)
        vs = jax.jit(lambda b: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            b, False))(batch)
        converted = convert_reference_stage2(sd, cfg.model, d.seq_len,
                                             d.out_len)
        params = merge_into(vs["params"], converted)
        save_pytree(args.out, params)
        finish({"out": args.out, "stage2": True,
                "leaves": len(jax.tree.leaves(params))})
        return

    llama_cfg = cfg.model.llama
    if args.strip_lora:
        llama_cfg = dataclasses.replace(llama_cfg, use_lora=False)
    mllm = MultiModalLLM(llama=llama_cfg, qformer=cfg.model.qformer)
    d = cfg.data
    vs = mllm.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, d.seq_len, d.vision_dim)),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
    converted = convert_reference_mllm(sd, cfg.model.qformer, llama_cfg)
    if args.strip_lora:
        converted = strip_lora(converted)
    params = merge_into(vs["params"], converted)
    save_pytree(args.out, params)
    finish({"out": args.out,
            "leaves": len(jax.tree.leaves(params))})


if __name__ == "__main__":
    main()
