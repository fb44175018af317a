"""Publication figure: test trajectories over the ROI map —
mirrors ref scripts/plot.py (which implicitly depended on graph.py's
globals; here the ROI comes from the data or the synthetic map).
"""
from _common import (add_roi_args, apply_overrides, base_parser, finish,
                     resolve_roi)


def main():
    p = base_parser(__doc__)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--max-samples", type=int, default=32)
    add_roi_args(p)
    args = p.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tsue_tpu.config import get_preset
    from tsue_tpu.data import BatchIterator, get_tokenizer
    from tsue_tpu.models.tsue import TrajectoryModel
    from tsue_tpu.runner import prepare_data
    from tsue_tpu.train.losses import denorm
    from tsue_tpu.viz import plot_trajectories_over_map

    cfg = apply_overrides(get_preset("train_18_30"), args)
    tok = get_tokenizer(args.tokenizer)
    _, _, dte = prepare_data(cfg, args.data, tok, args.synthetic_tracks)
    model = TrajectoryModel(cfg.model, cfg.data.seq_len, cfg.data.out_len)
    it = BatchIterator(dte, 16, shuffle=False)
    params = None
    predict = None
    samples = []
    for batch in it:  # walk the whole test set up to --max-samples
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        if params is None:
            vs = model.init({"params": jax.random.key(0),
                             "dropout": jax.random.key(1)}, b, False)
            params = vs["params"]
            if args.ckpt:
                from tsue_tpu.train.checkpoint import restore_pytree
                params = restore_pytree(args.ckpt, target=params)
            predict = jax.jit(
                lambda p, bb: model.apply({"params": p}, bb, True))
        pred = predict(params, b)
        ns = b["norm_stat"]
        past = np.asarray(denorm(b["traj_in"], ns))
        gt = np.asarray(denorm(b["traj_out"], ns))
        pd = np.asarray(denorm(pred, ns))
        for i in range(pred.shape[0]):
            if not batch["valid"][i]:
                continue
            samples.append({"past": past[i], "gt": gt[i], "pred": pd[i]})
            if len(samples) >= args.max_samples:
                break
        if len(samples) >= args.max_samples:
            break
    path = plot_trajectories_over_map(samples, resolve_roi(args),
                                      args.out_dir,
                                      site=args.site, zone=args.zone)
    finish({"figure": path, "samples": len(samples)})


if __name__ == "__main__":
    main()
