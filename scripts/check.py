"""Parameter-count utility — mirrors ref modify_scripts/check.py:1350-1418.

Builds the full TSUE model (CPU, no training) and prints total / per-group
/ trainable parameter counts for a chosen freeze regime.
"""
from _common import apply_overrides, base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--regime", default="frozen_mllm",
                   choices=("frozen_mllm", "joint", "lora_only",
                            "full_freeze"))
    p.add_argument("--no-llm", action="store_true")
    args = p.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp
    from tsue_tpu.config import get_preset
    from tsue_tpu.models.tsue import TrajectoryModel
    from tsue_tpu.train.trainer import freeze_label
    from tsue_tpu.utils.debug import count_params
    from __graft_entry__ import _make_batch

    cfg = apply_overrides(get_preset("train_18_30"), args)
    if args.no_llm:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_llm=False))
    model = TrajectoryModel(cfg.model, cfg.data.seq_len, cfg.data.out_len)
    batch = _make_batch(cfg, 2)
    variables = jax.eval_shape(
        lambda b: model.init({"params": jax.random.key(0),
                              "dropout": jax.random.key(1)}, b, False),
        batch)
    counts = count_params(variables["params"],
                          lambda s: freeze_label(s, args.regime))
    print(f"regime={args.regime}")
    for g, n in sorted(counts["groups"].items()):
        print(f"  {g:24s} {n/1e6:10.2f} M")
    print(f"  {'TOTAL':24s} {counts['total']/1e6:10.2f} M")
    print(f"  {'trainable':24s} {counts['trainable']/1e6:10.2f} M")
    finish({"total": counts["total"], "trainable": counts["trainable"]})


if __name__ == "__main__":
    main()
