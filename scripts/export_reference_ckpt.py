"""Export a tsue_tpu checkpoint to the reference's torch state_dict format.

The inverse of import_reference_ckpt.py: a model fine-tuned HERE becomes
an artifact the reference scripts load with their strict=True
``load_state_dict`` — so migration is a two-way door.

Stage-1 MLLM (default): produces the ``mllm_lora_ddp_finetuned.pt``
layout (consumed at ref scripts/train.py:1137-1138):

    python scripts/export_reference_ckpt.py \
        --ckpt runs/stage1/ckpt/best --out mllm_lora_ddp_finetuned.pt

--stage2 exports a full stage-2 checkpoint (frozen-regime best artifacts
hold only the trainable subtree; the frozen remainder is rebuilt
deterministically, or supplied with --mllm-ckpt exactly as the eval CLIs
do) to the reference's ``MultiModalTrajectoryModel`` state_dict (the
best-val artifact layout of ref scripts/train.py:1219-1224):

    python scripts/export_reference_ckpt.py --stage2 \
        --ckpt runs/train_18_30/ckpt/best --preset train_18_30 \
        --out best_val_checkpoint.pt
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--stage2", action="store_true",
                   help="checkpoint is a stage-2 TrajectoryModel tree "
                        "(else: a stage-1 MLLM tree)")
    p.add_argument("--preset", default="train_18_30",
                   help="preset giving the model config the checkpoint "
                        "was trained with")
    p.add_argument("--mllm-ckpt", default=None,
                   help="stage-1 MLLM artifact the stage-2 training "
                        "imported (frozen-regime checkpoints omit the "
                        "frozen subtree)")
    args = p.parse_args()
    import torch
    import jax
    import jax.numpy as jnp
    from tsue_tpu.config import get_preset
    from tsue_tpu.models.torch_export import (
        export_reference_mllm, export_reference_stage2, to_torch_state_dict)
    from tsue_tpu.train.checkpoint import import_mllm, restore_merge

    cfg = apply_overrides(get_preset(args.preset), args)

    if args.stage2:
        from tsue_tpu.models.tsue import TrajectoryModel
        import __graft_entry__ as ge
        d = cfg.data
        model = TrajectoryModel(cfg.model, d.seq_len, d.out_len)
        batch = ge._make_batch(cfg, 1)
        vs = jax.jit(lambda b: model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            b, False))(batch)
        params = vs["params"]
        if args.mllm_ckpt:
            params = import_mllm(params, args.mllm_ckpt)
        params = restore_merge(args.ckpt, params)
        exported = export_reference_stage2(params)
    else:
        from tsue_tpu.models.fusion import MultiModalLLM
        d = cfg.data
        if not cfg.model.use_vision:
            # the reference's stage-1 artifact always carries the
            # Q-Former/vision weights (ref scripts/train.py:1137-1138);
            # a no-vision tree would export random init in their place
            raise SystemExit(
                f"preset {cfg.name!r} has use_vision=False — its MLLM "
                "checkpoints have no vision weights to export into the "
                "reference stage-1 layout")
        mllm = MultiModalLLM(llama=cfg.model.llama, qformer=cfg.model.qformer)
        vs = mllm.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            jnp.zeros((1, d.seq_len, d.vision_dim)),
            jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
        params = restore_merge(args.ckpt, vs["params"])
        exported = export_reference_mllm(params)

    torch.save(to_torch_state_dict(exported), args.out)
    finish({"out": args.out, "stage2": args.stage2, "keys": len(exported)})


if __name__ == "__main__":
    main()
