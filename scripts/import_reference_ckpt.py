"""Migrate a reference torch checkpoint into this framework.

Converts the reference's stage-1 MLLM artifact (``mllm_lora_ddp_finetuned.pt``,
a torch state_dict of its LlamaMultiModal module) into an Orbax checkpoint
that ``scripts/train.py --mllm-ckpt`` consumes directly:

    python scripts/import_reference_ckpt.py \
        --torch-ckpt mllm_lora_ddp_finetuned.pt --out runs/mllm_imported
    python scripts/train.py --mllm-ckpt runs/mllm_imported

Use --strip-lora for the no-LoRA ablation target
(ref scripts/ablation_study_without_lora.py:1070-1084 key surgery).
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--strip-lora", action="store_true")
    args = p.parse_args()
    import torch
    import jax
    from tsue_tpu.config import get_preset
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.models.torch_import import convert_reference_mllm, merge_into
    from tsue_tpu.train.checkpoint import save_pytree, strip_lora
    import jax.numpy as jnp
    import dataclasses

    cfg = apply_overrides(get_preset("train_18_30"), args)
    sd = torch.load(args.torch_ckpt, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

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
