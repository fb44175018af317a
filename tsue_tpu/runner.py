"""Experiment runner: the reference's per-script main()/train_ddp flow as
one reusable pipeline.

Replaces the copy-a-whole-file experiment pattern (30 monolithic scripts,
SURVEY.md §2.7) with: preset config -> data build -> jitted DP train loop ->
best-val checkpoint -> ADE/FDE + K-candidate eval -> visualization, shared
by every CLI in scripts/.

Call stack parity with ref scripts/train.py:1044-1328 (train_ddp): same
stages, but the split is seeded (rank-safe), preprocessing happens once per
host, batches are device-sharded over the mesh's data axis, and eval
candidates are vmapped on-device.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tsue_tpu.config import ExperimentConfig
from tsue_tpu.data import (BatchIterator, build_windows, check_data_sanity,
                           get_tokenizer, make_synthetic_tracks, split_tracks)
from tsue_tpu.data.schema import load_tracks
from tsue_tpu.eval.metrics import (ade_fde, candidate_rollout,
                                   fast_candidate_rollout, min_ade_fde_rmse)
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.parallel.mesh import is_primary, make_mesh, shard_batch
from tsue_tpu.train.checkpoint import BestCheckpointer, import_mllm
from tsue_tpu.train.trainer import (TrainState, make_eval_step,
                                    make_optimizer, make_train_step)
from tsue_tpu.train.losses import denorm
from tsue_tpu.utils import MetricLogger, seed_everything


def prepare_data(cfg: ExperimentConfig, data_path: Optional[str],
                 tokenizer, synthetic_tracks: int = 40,
                 synthetic_len: int = 600, return_tracks: bool = False):
    """pickle -> sanity -> seeded split -> windows; synthetic fallback."""
    if data_path and os.path.exists(data_path):
        tracks = load_tracks(data_path)
    else:
        if data_path and is_primary():
            print(f"[warn] {data_path} not found; using synthetic fixture")
        tracks = make_synthetic_tracks(num_tracks=synthetic_tracks,
                                       track_len=synthetic_len,
                                       vision_dim=cfg.data.vision_dim,
                                       seed=cfg.data.split_seed)
    tracks = check_data_sanity(tracks)
    tr, va, te = split_tracks(tracks, cfg.data.train_ratio,
                              cfg.data.val_ratio, cfg.data.test_ratio,
                              seed=cfg.data.split_seed)
    out = (build_windows(tr, cfg.data, tokenizer),
           build_windows(va, cfg.data, tokenizer),
           build_windows(te, cfg.data, tokenizer))
    if return_tracks:
        return out + ((tr, va, te),)
    return out


def _to_device(batch: Dict, mesh=None) -> Dict:
    """Host batch -> device arrays (sharded over the mesh when given)."""
    arrays = {k: jnp.asarray(v) for k, v in batch.items()}
    return shard_batch(arrays, mesh) if mesh is not None else arrays


def _batches(ds, cfg, shuffle, epoch=0, batch_size=None):
    it = BatchIterator(ds, batch_size or cfg.train.batch_size,
                       shuffle=shuffle, seed=cfg.train.seed,
                       process_index=jax.process_index(),
                       process_count=jax.process_count(),
                       length_buckets=cfg.data.length_buckets)
    it.set_epoch(epoch)
    return it


def _check_restore_meta(restore_ckpt: str, mllm_ckpt: Optional[str]):
    """Fail fast when evaluating a checkpoint whose training imported a
    stage-1 MLLM but the eval invocation did not pass --mllm-ckpt.

    Frozen-regime best checkpoints store only the trainable subtree; the
    frozen MLLM is reconstructed by the deterministic init + optional
    ``import_mllm``.  Without the same import, the restore would succeed
    shape-wise and silently evaluate a RANDOM-init LLM.  ``run_stage2``
    records a meta.json next to the artifact at train time so this
    mismatch is loud instead."""
    import json
    meta_path = os.path.join(os.path.dirname(os.path.abspath(restore_ckpt)),
                             "meta.json")
    if not os.path.exists(meta_path):
        return
    with open(meta_path) as f:
        meta = json.load(f)
    trained_with = meta.get("mllm_ckpt")
    if trained_with and not mllm_ckpt:
        raise RuntimeError(
            f"checkpoint {restore_ckpt} was trained with a stage-1 MLLM "
            f"import ({trained_with}) but this eval run passes no "
            "--mllm-ckpt; the frozen MLLM subtree would be re-initialized "
            "randomly and the metrics would be silently wrong.  Pass "
            f"--mllm-ckpt {trained_with} (or the equivalent artifact).")
    if trained_with and mllm_ckpt and \
            os.path.abspath(mllm_ckpt) != os.path.abspath(trained_with) \
            and is_primary():
        print(f"[warn] eval --mllm-ckpt {mllm_ckpt} differs from the one "
              f"recorded at train time ({trained_with})")


def run_stage2(cfg: ExperimentConfig, data_path: Optional[str] = None,
               out_dir: str = "runs", mllm_ckpt: Optional[str] = None,
               epochs: Optional[int] = None, eval_candidates: int = 0,
               save_viz: bool = True, synthetic_tracks: int = 40,
               restore_ckpt: Optional[str] = None,
               viz_every: int = 0, candidate_mode: str = "fast",
               tokenizer_path: Optional[str] = None,
               save_every: int = 0, resume: bool = False) -> Dict:
    """Full stage-2 pipeline.  Returns final metrics dict.

    ``save_every=N`` checkpoints the FULL train state (params + optimizer
    + step + epoch + best-val) every N epochs; ``resume=True`` restores
    it and continues — an interrupted run reproduces the uninterrupted
    one exactly (per-step RNG folds on state.step, per-epoch shuffles on
    the epoch index).  The reference saves best-val params only and
    cannot resume (SURVEY §5 checkpoint gaps).
    """
    if restore_ckpt:
        _check_restore_meta(restore_ckpt, mllm_ckpt)
    seed_everything(cfg.train.seed)
    out_dir = os.path.join(out_dir, cfg.name)
    logger = MetricLogger(out_dir)
    tokenizer = get_tokenizer(tokenizer_path)
    dtr, dva, dte = prepare_data(cfg, data_path, tokenizer, synthetic_tracks)
    if is_primary():
        print(f"windows: train={len(dtr)} val={len(dva)} test={len(dte)}")

    mesh = make_mesh(cfg.mesh.model_parallel)
    model, params = build_model_and_params(cfg, dtr, tokenizer, mllm_ckpt)
    if restore_ckpt:  # eval-only flows (ref test.py:1273-1276)
        # frozen-regime best checkpoints hold only the trainable subtree;
        # restore_merge reads the on-disk structure and merges it over the
        # deterministic init (build_model_and_params reproduces the frozen
        # subtree bit-for-bit)
        from tsue_tpu.train.checkpoint import restore_merge
        params = restore_merge(restore_ckpt, params)

    if jax.device_count() > 1:
        # place params per the partition rules: replicated for pure DP,
        # Megatron TP when cfg.mesh.model_parallel > 1, ZeRO-3-style
        # param/moment sharding when cfg.mesh.fsdp (the optimizer state
        # below inherits placement through tx.init's zeros_like)
        from tsue_tpu.parallel.sharding import shard_params
        params = shard_params(params, mesh, fsdp=cfg.mesh.fsdp)

    def apply_fn(vs, b, det, rngs=None, **kw):
        return model.apply(vs, b, det, rngs=rngs, **kw)

    tx = make_optimizer(cfg, params)
    state = TrainState.create(apply_fn, params, tx)
    train_step = jax.jit(make_train_step(cfg), donate_argnums=0)
    eval_step = jax.jit(make_eval_step(cfg))
    # best-val artifact = trainable params only: frozen subtrees never
    # change, and pulling the full 1.3B tree off-device per save is
    # minutes through a remote-tunnel TPU
    from tsue_tpu.train.trainer import freeze_label
    tfilter = lambda p: freeze_label(p, cfg.train.freeze_regime) == "train"
    ckpt = BestCheckpointer(os.path.join(out_dir, "ckpt"),
                            trainable_filter=tfilter)
    # rng_impl="rbg" swaps in the hardware PRNG for the dropout stream
    # (equally random, -11% on the 1B frozen train step; TrainConfig)
    rng = jax.random.key(cfg.train.seed, impl=cfg.train.rng_impl)

    n_epochs = epochs if epochs is not None else cfg.train.epochs
    if n_epochs > 0 and is_primary():
        # provenance for eval-time safety (_check_restore_meta): which
        # stage-1 artifact (if any) rebuilt the frozen subtree
        import json
        with open(os.path.join(out_dir, "ckpt", "meta.json"), "w") as f:
            json.dump({"name": cfg.name,
                       "freeze_regime": cfg.train.freeze_regime,
                       "use_llm": cfg.model.use_llm,
                       "seq_len": cfg.data.seq_len,
                       "out_len": cfg.data.out_len,
                       "mllm_ckpt": (os.path.abspath(mllm_ckpt)
                                     if mllm_ckpt else None)}, f)
    best_params_mem = None
    gen_cache: Dict = {}
    state_dir = os.path.join(out_dir, "ckpt", "state")
    start_epoch = 0
    if resume:
        from tsue_tpu.train.checkpoint import (restore_train_state,
                                               train_state_path)
        if train_state_path(state_dir):
            state, extra = restore_train_state(
                state_dir, state, trainable_filter=tfilter)
            start_epoch = extra["epoch"]
            ckpt.best_val = extra["best_val"]
            if is_primary():
                print(f"[resume] epoch {start_epoch}, step "
                      f"{int(state.step)}, best_val {ckpt.best_val:.6g}")
        elif is_primary():
            # loud: a mistyped --out-dir or a pre-first-save crash would
            # otherwise silently restart at epoch 0 over old artifacts
            print(f"[resume] nothing to resume at {state_dir}; "
                  "training from scratch")
    with mesh:
        for epoch in range(start_epoch, n_epochs):
            # per-step losses stay ON DEVICE during the epoch so step
            # dispatch pipelines with host-side batch prep; the host
            # fetches happen once per epoch on already-computed buffers
            # (SURVEY §7 "zero host round-trips" — the reference .item()s
            # every batch, ref scripts/train.py:1155-1183)
            step_losses = []
            for batch in _batches(dtr, cfg, True, epoch):
                state, m = train_step(state, _to_device(batch, mesh), rng)
                step_losses.append(m["loss"])
            val_losses = [eval_step(state, _to_device(batch, mesh))["loss"]
                          for batch in _batches(dva, cfg, False)]
            train_loss = (sum(float(x) for x in step_losses)
                          / max(len(step_losses), 1))
            # empty val split: NaN (never "best") instead of a misleading 0
            val_loss = (sum(float(x) for x in val_losses) / len(val_losses)
                        if val_losses else float("nan"))
            logger.log(epoch, train_loss=train_loss, val_loss=val_loss)
            if ckpt.maybe_save(val_loss, state.params) and \
                    jax.process_count() > 1:
                # disk ckpt lives on host 0 only; keep an in-memory copy so
                # every process can restore the best params.  Must be a REAL
                # copy: train_step donates state, so aliased buffers from
                # state.params get deleted on the next step.
                best_params_mem = jax.tree.map(jnp.copy, state.params)

            # per-epoch qualitative sample (ref train.py:1226-1247, T7).
            # Single-process only: params live as global-mesh arrays, and
            # a primary-only computation cannot consume them (the
            # reference's rank-0 sample works because DDP replicates the
            # module per rank); multi-process runs get the post-training
            # generation harness instead.
            if viz_every and epoch % viz_every == 0 and is_primary() \
                    and jax.process_count() == 1 and len(dva):
                from tsue_tpu.viz import plot_one_sample
                vb = _to_device(next(iter(_batches(dva, cfg, False))))
                pred = eval_step(state, vb)["pred"]
                ns = vb["norm_stat"]
                plot_one_sample(
                    np.asarray(denorm(vb["traj_in"], ns))[0],
                    np.asarray(denorm(vb["traj_out"], ns))[0],
                    np.asarray(denorm(pred, ns))[0],
                    os.path.join(out_dir, "viz"),
                    prefix=f"epoch{epoch:04d}")
                # per-epoch qualitative TEXT sample (ref train.py:1231-1241)
                if cfg.model.use_llm and "input_ids" in vb:
                    text = _epoch_text_sample(
                        model, state.params, tokenizer, vb, gen_cache,
                        jax.random.fold_in(jax.random.key(777), epoch))
                    print(f"[epoch {epoch}] generated sample: {text}")
                    with open(os.path.join(out_dir,
                                           "generated_samples.txt"),
                              "a") as f:
                        f.write(f"[epoch {epoch}] {text}\n")

            # periodic full-state checkpoint (collective; resume=True
            # restores it and continues exactly)
            if save_every and (epoch + 1) % save_every == 0:
                from tsue_tpu.train.checkpoint import save_train_state
                save_train_state(state_dir, state, epoch=epoch + 1,
                                 best_val=ckpt.best_val,
                                 trainable_filter=tfilter)

        # restore best before test (ref train.py:1249-1252)
        if n_epochs > 0 and ckpt.best_val < float("inf"):
            if best_params_mem is not None:
                state = state.replace(params=best_params_mem)
            else:
                state = state.replace(
                    params=ckpt.restore_best(state.params))

        # test: ADE/FDE and optional K-candidate metrics
        metrics = evaluate(model, state.params, dte, cfg, mesh,
                           eval_candidates, out_dir if save_viz else None,
                           candidate_mode)
    logger.log(n_epochs, **metrics)
    logger.close()
    return metrics


def _epoch_text_sample(model, params, tokenizer, batch, cache, rng,
                       max_new_tokens: int = 48) -> str:
    """Generate one traffic-context paragraph from a val row (T7 parity:
    the reference prints a generated sample each epoch on rank 0, ref
    scripts/train.py:1231-1241).

    ``cache`` holds the jitted generate fn across epochs (one compile).
    Prompt masking and decode trimming are the SAME helpers the stage-1
    generation harness uses (eval/generation.py prompt_only /
    trim_and_decode), so the per-epoch sample can't skew from it.
    """
    from tsue_tpu.eval.generation import (make_generate_fn, prompt_only,
                                          trim_and_decode)
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.ops.sampling import SamplingConfig

    ids, prompt_mask = prompt_only(
        {k: v[:1] for k, v in batch.items()
         if k in ("attention_mask", "labels", "input_ids")})
    key = ("gen", ids.shape[1])  # prompt width is baked into the compiled
    if key not in cache:         # program (length buckets can vary it)
        mcfg = model.cfg
        dtype = jnp.bfloat16 if mcfg.dtype == "bfloat16" else jnp.float32
        mllm = MultiModalLLM(llama=mcfg.llama, qformer=mcfg.qformer,
                             use_vision=mcfg.use_vision, dtype=dtype)
        cache[key] = make_generate_fn(
            mllm, SamplingConfig(), max_new_tokens, ids.shape[1],
            tokenizer.eos_id, tokenizer.pad_id)
    vision = jnp.asarray(batch["vision"][:1]) if "vision" in batch else None
    out = np.asarray(cache[key]({"params": params["mllm"]}, vision,
                                jnp.asarray(ids),
                                jnp.asarray(prompt_mask), rng))
    return trim_and_decode(out[0], tokenizer)


def build_model_and_params(cfg: ExperimentConfig, dtr, tokenizer,
                           mllm_ckpt: Optional[str] = None):
    """Deterministic model construction + param init.

    The single shared recipe (tokenizer-driven vocab resize, init on the
    first train batch with fixed PRNG keys, bf16 cast, optional stage-1
    MLLM import) — ``run_stage2`` and ``rebuild_for_eval`` MUST both go
    through here: frozen-regime checkpoints store only the trainable
    subset, so a post-training rebuild reproduces the frozen subtree
    correctly only if this init is bit-for-bit identical.
    """
    model_cfg = cfg.model
    if model_cfg.llama.vocab_size != tokenizer.vocab_size and \
            model_cfg.use_llm:
        model_cfg = dataclasses.replace(
            model_cfg, llama=dataclasses.replace(
                model_cfg.llama, vocab_size=tokenizer.vocab_size))
    model = TrajectoryModel(model_cfg, cfg.data.seq_len, cfg.data.out_len)
    b0 = next(iter(_batches(dtr, cfg, False)))
    b0 = {k: jnp.asarray(v) for k, v in b0.items()}
    variables = model.init({"params": jax.random.key(cfg.train.seed),
                            "dropout": jax.random.key(1)}, b0, False)
    params = variables["params"]
    if cfg.model.dtype == "bfloat16":
        from tsue_tpu.utils.precision import cast_params
        params = cast_params(params)
    if mllm_ckpt:
        params = import_mllm(params, mllm_ckpt)  # stage-1 handoff (T1)
    return model, params


def rebuild_for_eval(cfg: ExperimentConfig, data_path: Optional[str],
                     out_dir: str, tokenizer_path: Optional[str] = None,
                     synthetic_tracks: int = 40,
                     mllm_ckpt: Optional[str] = None):
    """Rebuild the model/data exactly as ``run_stage2`` did and restore its
    best-val checkpoint (shared init: ``build_model_and_params``).
    Returns (model, params, (dtr, dva, dte)).  Used by the post-training
    eval flows (scripts/study_fast_vs_parity.py, tests/test_fast_vs_parity.py).
    """
    seed_everything(cfg.train.seed)
    tokenizer = get_tokenizer(tokenizer_path)
    dtr, dva, dte = prepare_data(cfg, data_path, tokenizer, synthetic_tracks)
    model, params = build_model_and_params(cfg, dtr, tokenizer, mllm_ckpt)
    from tsue_tpu.train.trainer import freeze_label
    ckpt = BestCheckpointer(
        os.path.join(out_dir, cfg.name, "ckpt"),
        trainable_filter=lambda p: freeze_label(
            p, cfg.train.freeze_regime) == "train")
    params = ckpt.restore_best(params)
    return model, params, (dtr, dva, dte)


def evaluate(model, params, dte, cfg, mesh, eval_candidates: int = 0,
             viz_dir: Optional[str] = None,
             candidate_mode: str = "fast", eval_seed: int = 1000) -> Dict:
    """Test loop (ref train.py:1256-1328 / test.py:1279-1396).

    candidate_mode: "fast" computes the MLLM context once per batch and
    vmaps only the stochastic forecaster; "parity" vmaps the whole
    stochastic model like the reference's train()-mode forwards.
    eval_seed seeds the per-batch candidate dropout keys (the fast-vs-parity
    study, scripts/study_fast_vs_parity.py, sweeps it).
    """
    # sample-weighted accumulation (the reference averages total error
    # over total samples; per-batch-mean averaging would overweight the
    # wrap-padded tail batch).  Per-batch metric scalars stay on device
    # until the loop ends so batch prep pipelines with device compute —
    # the reference host-syncs every batch (ref scripts/test.py:1327-1368).
    per_batch = []                 # [ade, fde, nv(, min_ade, min_fde, min_rmse)]
    first_batch = None
    first_pred = None
    first_cands = None
    single_process = jax.process_count() == 1
    apply_det = jax.jit(lambda p, b: model.apply({"params": p}, b, True))

    def cand_fn(p, b, rng):
        if candidate_mode == "fast" and getattr(model.cfg, "use_llm", False):
            return fast_candidate_rollout(model, {"params": p}, b,
                                          eval_candidates, rng)
        return candidate_rollout(
            lambda v, bb, det, rngs: model.apply(v, bb, det, rngs=rngs),
            {"params": p}, b, eval_candidates, rng)
    cand_fn = jax.jit(cand_fn) if eval_candidates else None

    for i, batch in enumerate(_batches(dte, cfg, False)):
        batch = _to_device(batch, mesh)
        pred = apply_det(params, batch)
        # metrics on sharded batches are GLOBAL (eager SPMD): every
        # process computes identical fully-replicated scalars
        a, f = ade_fde(pred, batch["traj_out"], batch["norm_stat"],
                       batch["valid"])
        entry = [a, f, batch["valid"].sum()]
        if eval_candidates:
            cands = cand_fn(params, batch, jax.random.key(eval_seed + i))
            entry.extend(min_ade_fde_rmse(cands, batch["traj_out"],
                                          batch["norm_stat"],
                                          batch["valid"]))
            if first_cands is None and single_process:
                first_cands = cands
        per_batch.append(entry)
        if first_batch is None and single_process:
            # viz arrays are host-fetched AFTER the loop; only valid
            # single-process
            first_batch = batch
            first_pred = pred

    # one host fetch over completed buffers (same arithmetic as the old
    # per-batch float() accumulation: identical products, same order)
    ade_sum = fde_sum = n_sum = 0.0
    min_sums = np.zeros(3)
    for entry in per_batch:
        vals = [float(x) for x in entry]
        nv = vals[2]
        ade_sum += vals[0] * nv
        fde_sum += vals[1] * nv
        n_sum += nv
        if eval_candidates:
            min_sums += np.array(vals[3:6]) * nv
    if first_batch is not None:
        first_batch = {k: np.asarray(v) for k, v in first_batch.items()}
        first_pred = np.asarray(first_pred)
        if first_cands is not None:
            first_cands = np.asarray(first_cands)

    n = max(n_sum, 1.0)
    out = {"test_ade": ade_sum / n if n_sum else float("nan"),
           "test_fde": fde_sum / n if n_sum else float("nan")}
    if eval_candidates and n_sum:
        m = min_sums / n
        out.update(min_ade=float(m[0]), min_fde=float(m[1]),
                   min_rmse=float(m[2]), K=eval_candidates)

    if viz_dir and first_batch is not None and is_primary():
        from tsue_tpu.viz import (plot_best_of_k, plot_candidates,
                                  plot_one_sample, plot_xy_time)
        d = os.path.join(viz_dir, "viz")
        ns = jnp.asarray(first_batch["norm_stat"])
        past = np.asarray(denorm(jnp.asarray(first_batch["traj_in"]), ns))
        gt = np.asarray(denorm(jnp.asarray(first_batch["traj_out"]), ns))
        pd = np.asarray(denorm(jnp.asarray(first_pred), ns))
        plot_one_sample(past[0], gt[0], pd[0], d, prefix="test")
        plot_xy_time(gt[0], [pd[0]], d, prefix="test_xy_time")
        if first_cands is not None:
            K = first_cands.shape[1]
            cd = np.asarray(denorm(
                jnp.asarray(first_cands[0]),
                jnp.repeat(ns[:1], K, axis=0)))
            plot_candidates(past[0], gt[0], cd, d,
                            prefix="test_candidates")
            # best-of-K highlight (ref seed_fix_train.py:929-1000)
            plot_best_of_k(past[0], gt[0], cd, d, prefix="test_best_of_k")
    return out


def run_baseline(name: str, cfg: ExperimentConfig,
                 data_path: Optional[str] = None, out_dir: str = "runs",
                 epochs: Optional[int] = None, eval_candidates: int = 0,
                 synthetic_tracks: int = 40) -> Dict:
    """Baseline pipeline (ref scripts/baseline_*.py main flows)."""
    import optax
    from tsue_tpu.models.baselines import BASELINE_REGISTRY, cv_candidates
    from tsue_tpu.train.baseline_steps import (make_baseline_eval_fn,
                                               make_baseline_train_step)

    seed_everything(cfg.train.seed)
    out_dir = os.path.join(out_dir, f"baseline_{name}")
    logger = MetricLogger(out_dir)
    data_cfg = dataclasses.replace(cfg.data, use_text=False,
                                   use_vision=False)
    cfg = dataclasses.replace(cfg, data=data_cfg)
    dtr, dva, dte = prepare_data(cfg, data_path, None, synthetic_tracks)
    if is_primary():
        print(f"windows: train={len(dtr)} val={len(dva)} test={len(dte)}")

    if name == "cv":  # no training (ref baseline_cv.py)
        K = eval_candidates or 10
        ade_sum = fde_sum = n_sum = 0.0
        min_sums = np.zeros(3)
        for i, b in enumerate(_batches(dte, cfg, False)):
            b = _to_device(b)
            cands = cv_candidates(b["traj_in"], cfg.data.out_len,
                                  jax.random.key(i), K, 0.1)
            ms = min_ade_fde_rmse(cands, b["traj_out"], b["norm_stat"],
                                  b["valid"])
            a, f = ade_fde(cands[:, 0], b["traj_out"], b["norm_stat"],
                           b["valid"])
            nv = float(b["valid"].sum())
            min_sums += np.array([float(x) for x in ms]) * nv
            ade_sum += float(a) * nv; fde_sum += float(f) * nv; n_sum += nv
        n = max(n_sum, 1.0)
        m = min_sums / n if n_sum else [float("nan")] * 3
        out = {"test_ade": ade_sum / n if n_sum else float("nan"),
               "test_fde": fde_sum / n if n_sum else float("nan"),
               "min_ade": float(m[0]), "min_fde": float(m[1]),
               "min_rmse": float(m[2]), "K": K}
        logger.log(0, **out)
        logger.close()
        return out

    if name == "gail":
        return _run_gail(cfg, dtr, dte, logger, epochs, eval_candidates)

    model = BASELINE_REGISTRY[name](seq_len=cfg.data.seq_len,
                                    out_len=cfg.data.out_len)
    b0 = _to_device(next(iter(_batches(dtr, cfg, False))))
    rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
            "latent": jax.random.key(2), "noise": jax.random.key(3)}
    variables = dict(model.init(rngs, b0, True))
    tx = optax.adamw(cfg.train.lr, weight_decay=cfg.train.weight_decay)
    step = jax.jit(make_baseline_train_step(model, tx))
    opt_state = tx.init(variables["params"])
    n_epochs = epochs if epochs is not None else cfg.train.epochs
    for epoch in range(n_epochs):
        losses = []  # device scalars; fetched once per epoch (no per-step sync)
        for si, b in enumerate(_batches(dtr, cfg, True, epoch)):
            variables, opt_state, m = step(
                variables, opt_state, _to_device(b),
                jax.random.fold_in(jax.random.key(epoch), si))
            losses.append(m["loss"])
        logger.log(epoch, train_loss=(
            sum(float(x) for x in losses) / max(len(losses), 1)))

    # test (sample-weighted like evaluate())
    ade_sum = fde_sum = n_sum = 0.0
    min_sums = np.zeros(3)
    eval_fn = jax.jit(make_baseline_eval_fn(model), static_argnums=3)
    det_fn = jax.jit(lambda v, b: model.apply(v, b, True))
    for i, b in enumerate(_batches(dte, cfg, False)):
        b = _to_device(b)
        pred = det_fn(variables, b)
        a, f = ade_fde(pred, b["traj_out"], b["norm_stat"], b["valid"])
        nv = float(b["valid"].sum())
        ade_sum += float(a) * nv; fde_sum += float(f) * nv; n_sum += nv
        if eval_candidates:
            cands = eval_fn(variables, b, jax.random.key(100 + i),
                            eval_candidates)
            ms = min_ade_fde_rmse(cands, b["traj_out"], b["norm_stat"],
                                  b["valid"])
            min_sums += np.array([float(x) for x in ms]) * nv
    n = max(n_sum, 1.0)
    out = {"test_ade": ade_sum / n if n_sum else float("nan"),
           "test_fde": fde_sum / n if n_sum else float("nan")}
    if eval_candidates and n_sum:
        m = min_sums / n
        out.update(min_ade=float(m[0]), min_fde=float(m[1]),
                   min_rmse=float(m[2]), K=eval_candidates)
    if eval_candidates and is_primary() and len(dte):
        # candidate visualization (ref test_baseline_stgcnn.py:342-489)
        from tsue_tpu.viz import plot_candidates
        b = {k: jnp.asarray(v)
             for k, v in next(iter(_batches(dte, cfg, False))).items()}
        cands = eval_fn(variables, b, jax.random.key(99), eval_candidates)
        ns = b["norm_stat"]
        K = eval_candidates
        cd = np.asarray(denorm(cands[0], jnp.repeat(ns[:1], K, axis=0)))
        plot_candidates(np.asarray(denorm(b["traj_in"], ns))[0],
                        np.asarray(denorm(b["traj_out"], ns))[0],
                        cd, os.path.join(out_dir, "viz"),
                        prefix=f"{name}_candidates")
    logger.log(n_epochs, **out)
    logger.close()
    return out


def _run_gail(cfg, dtr, dte, logger, epochs, eval_candidates: int = 0):
    import optax
    from tsue_tpu.models.baselines import GAILDiscriminator, GAILGenerator
    from tsue_tpu.train.baseline_steps import make_gail_train_step
    gen = GAILGenerator(seq_len=cfg.data.seq_len, out_len=cfg.data.out_len)
    disc = GAILDiscriminator(seq_len=cfg.data.seq_len,
                             out_len=cfg.data.out_len)
    b0 = _to_device(next(iter(_batches(dtr, cfg, False))))
    gvs = gen.init({"params": jax.random.key(0)}, b0, True)
    dvs = disc.init({"params": jax.random.key(1)}, b0["traj_in"],
                    b0["traj_out"])
    g_tx = optax.adam(cfg.train.lr)
    d_tx = optax.adam(cfg.train.lr)
    step = jax.jit(make_gail_train_step(gen, disc, g_tx, d_tx))
    gp, dp = gvs["params"], dvs["params"]
    go, do = g_tx.init(gp), d_tx.init(dp)
    n_epochs = epochs if epochs is not None else cfg.train.epochs
    for epoch in range(n_epochs):
        gls, dls = [], []  # device scalars; fetched once per epoch
        for si, b in enumerate(_batches(dtr, cfg, True, epoch)):
            gp, dp, go, do, m = step(
                gp, dp, go, do, _to_device(b),
                jax.random.fold_in(jax.random.key(epoch), si))
            gls.append(m["g_loss"]); dls.append(m["d_loss"])
        n = max(len(gls), 1)
        logger.log(epoch, g_loss=sum(float(x) for x in gls) / n,
                   d_loss=sum(float(x) for x in dls) / n)
    ade_sum = fde_sum = n_sum = 0.0
    min_sums = np.zeros(3)
    det = jax.jit(lambda p, b: gen.apply({"params": p}, b, True))

    def noisy_candidates(p, b, rng, K):
        # K candidates via generator output noise, noise_scale=0.05
        # (ref scripts/baseline_GAIL.py:441-460)
        keys = jax.random.split(rng, K)
        preds = jax.vmap(lambda k: gen.apply(
            {"params": p}, b, True, noise_scale=0.05,
            rngs={"noise": k}))(keys)
        return jnp.swapaxes(preds, 0, 1)
    cand_fn = jax.jit(noisy_candidates, static_argnums=3)         if eval_candidates else None

    for i, b in enumerate(_batches(dte, cfg, False)):
        b = _to_device(b)
        pred = det(gp, b)
        a, f = ade_fde(pred, b["traj_out"], b["norm_stat"], b["valid"])
        nv = float(b["valid"].sum())
        ade_sum += float(a) * nv; fde_sum += float(f) * nv; n_sum += nv
        if eval_candidates:
            from tsue_tpu.eval.metrics import min_ade_fde_rmse as _mins
            cands = cand_fn(gp, b, jax.random.key(500 + i), eval_candidates)
            ms = _mins(cands, b["traj_out"], b["norm_stat"], b["valid"])
            min_sums += np.array([float(x) for x in ms]) * nv
    n = max(n_sum, 1.0)
    out = {"test_ade": ade_sum / n if n_sum else float("nan"),
           "test_fde": fde_sum / n if n_sum else float("nan")}
    if eval_candidates and n_sum:
        m = min_sums / n
        out.update(min_ade=float(m[0]), min_fde=float(m[1]),
                   min_rmse=float(m[2]), K=eval_candidates)
    logger.log(n_epochs, **out)
    logger.close()
    return out


def run_diffusion(cfg: ExperimentConfig, data_path: Optional[str] = None,
                  out_dir: str = "runs", epochs: Optional[int] = None,
                  cfg_scale: float = 3.0, n_timestep: int = 1000,
                  n_samples: int = 5, synthetic_tracks: int = 40) -> Dict:
    """DDPM generate mode (ref capstone_project.py:1138-1423): train the
    conditional UNet on future trajectories scaled to [-1, 1], sample
    n_samples reverse chains, dump X/Y-vs-time plots."""
    import optax
    from tsue_tpu.models.diffusion import (ConditionalUNet, DDPMSchedule,
                                           make_diffusion_train_step,
                                           p_sample_loop)
    from tsue_tpu.viz import plot_xy_time

    seed_everything(cfg.train.seed)
    out_dir = os.path.join(out_dir, "diffusion")
    logger = MetricLogger(out_dir)
    data_cfg = dataclasses.replace(cfg.data, use_text=False,
                                   use_vision=False)
    cfg = dataclasses.replace(cfg, data=data_cfg)
    dtr, _, dte = prepare_data(cfg, data_path, None, synthetic_tracks)

    model = ConditionalUNet()
    sched = DDPMSchedule.create("cosine", n_timestep)
    T = cfg.data.out_len
    x0_init = jnp.zeros((2 * cfg.train.batch_size, 2, T))
    cond_init = jnp.zeros((2 * cfg.train.batch_size, 128))
    vs = model.init({"params": jax.random.key(0)}, x0_init, cond_init)
    params = vs["params"]
    ema_params = jax.tree.map(jnp.copy, params)
    # ref: torch.optim.Adam(lr=diffusion_lr=1e-4, weight_decay=1e-4),
    # capstone_project.py:1194-1196 — torch Adam's weight_decay is L2 added
    # to the gradient BEFORE the moment estimates, hence decay-then-adam
    # (optax.adamw would decay decoupled, after)
    tx = optax.chain(optax.add_decayed_weights(1e-4), optax.adam(1e-4))
    opt_state = tx.init(params)
    step = jax.jit(make_diffusion_train_step(model, sched, tx, cfg_scale))

    def to_pm1(x):  # [0,1] -> [-1,1] (sampling clamps at +-1)
        return x * 2.0 - 1.0

    n_epochs = epochs if epochs is not None else 20  # ref diffusion_epochs=20
    tl, tn = 0.0, 0
    for epoch in range(n_epochs):
        losses = []  # device scalars; fetched once per epoch
        for tn_i, b in enumerate(_batches(dtr, cfg, True, epoch)):
            x0 = to_pm1(jnp.asarray(b["traj_out"]))
            cond = jnp.zeros((x0.shape[0], 128))  # placeholder cond (ref :1218-1221)
            params, opt_state, ema_params, m = step(
                params, opt_state, ema_params, x0, cond,
                jax.random.key(epoch * 1000 + tn_i))
            losses.append(m["loss"])
        tl = sum(float(x) for x in losses)
        tn = len(losses)
        logger.log(epoch, diff_loss=tl / max(tn, 1))

    # sampling with EMA params (ref ema.apply_shadow, :1282)
    cond = jnp.zeros((2 * n_samples, 128))
    out = p_sample_loop(model, {"params": ema_params}, sched,
                        (2 * n_samples, 2, T), cond, jax.random.key(7),
                        cfg_scale)
    guided = np.asarray(out[n_samples:])          # cond half (CFG-combined)
    if is_primary() and len(dte):
        gt = (np.asarray(dte.traj_out[0]) * 2.0 - 1.0)
        plot_xy_time(gt, list(guided), os.path.join(out_dir, "viz"),
                     prefix="ddpm_samples")
    metrics = {"final_diff_loss": tl / max(tn, 1) if n_epochs else float("nan"),
               "samples": int(n_samples)}
    logger.log(n_epochs, **metrics)
    logger.close()
    return metrics


def run_stage1(cfg: ExperimentConfig, data_path: Optional[str] = None,
               out_dir: str = "runs", epochs: Optional[int] = None,
               export_path: Optional[str] = None,
               synthetic_tracks: int = 20,
               generation_dump: Optional[str] = None,
               tokenizer_path: Optional[str] = None) -> Dict:
    """Stage-1 MLLM LM fine-tune + generation eval
    (ref scripts/check_generation.py flow, training included)."""
    import dataclasses as dc
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.train.checkpoint import save_pytree
    from tsue_tpu.train.stage1 import (make_stage1_eval_step,
                                       make_stage1_optimizer,
                                       make_stage1_train_step)

    seed_everything(cfg.train.seed)
    out_dir = os.path.join(out_dir, f"stage1_{cfg.name}")
    logger = MetricLogger(out_dir)
    tokenizer = get_tokenizer(tokenizer_path)
    dtr, dva, dte, raw = prepare_data(cfg, data_path, tokenizer,
                                      synthetic_tracks, return_tracks=True)
    llama_cfg = dc.replace(cfg.model.llama,
                           vocab_size=tokenizer.vocab_size)
    mllm = MultiModalLLM(llama=llama_cfg, qformer=cfg.model.qformer,
                         use_vision=cfg.model.use_vision)
    b0 = _to_device(next(iter(_batches(dtr, cfg, False))))
    variables = mllm.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        b0["vision"], b0["input_ids"], b0["attention_mask"])
    params = variables["params"]
    pp = cfg.mesh.pipeline_parallel
    if pp > 1:
        # GPipe pipeline over the decoder depth (parallel/pipeline.py):
        # layer stack sharded over the "pipe" axis, front-end/head
        # replicated, microbatched lax.scan schedule with ppermute hops.
        from tsue_tpu.parallel.pipeline import (make_pipeline_mesh,
                                                make_pipelined_stage1_step,
                                                place_pipeline_params,
                                                split_llama_layers)
        mesh = make_pipeline_mesh(pp)
        dp = mesh.shape["data"]
        if cfg.train.batch_size % dp:
            raise ValueError(f"batch_size={cfg.train.batch_size} must be "
                             f"divisible by the data-parallel degree {dp}")
        # clamp microbatches to the largest divisor of the per-data-shard
        # batch (MeshConfig.microbatches is an upper bound)
        n_micro = max(m for m in range(1, cfg.mesh.microbatches + 1)
                      if cfg.train.batch_size % (m * dp) == 0)
        if is_primary():
            print(f"pipeline: pp={pp} dp={dp} microbatches={n_micro}")
        params = place_pipeline_params(
            dict(zip(("outer", "layers"), split_llama_layers(params, pp))),
            mesh)
        pinit, step, ev = make_pipelined_stage1_step(mllm, cfg, mesh,
                                                     n_micro, params)
        opt_state = pinit(params)
    else:
        tx = make_stage1_optimizer(cfg, params)
        opt_state = tx.init(params)
        step = jax.jit(make_stage1_train_step(mllm, tx))
        ev = jax.jit(make_stage1_eval_step(mllm))
    n_epochs = epochs if epochs is not None else cfg.train.epochs
    tl, tn = 0.0, 0
    for epoch in range(n_epochs):
        losses = []  # device scalars; fetched once per epoch
        # rng_impl="rbg" applies here too: hardware-PRNG dropout keys
        # measured -4.7% on the 1.31B stage-1 step (PARITY.md)
        epoch_key = jax.random.key(epoch, impl=cfg.train.rng_impl)
        for si, b in enumerate(_batches(dtr, cfg, True, epoch)):
            params, opt_state, m = step(
                params, opt_state, _to_device(b),
                jax.random.fold_in(epoch_key, si))
            losses.append(m["lm_loss"])
        tl = sum(float(x) for x in losses)
        tn = len(losses)
        vl = [float(ev(params, _to_device(b))["lm_loss"])
              for b in _batches(dva, cfg, False)]
        logger.log(epoch, lm_loss=tl / max(tn, 1),
                   val_lm_loss=float(np.mean(vl)) if vl else float("nan"))
    if pp > 1:
        # back to the standard per-layer tree: export artifacts and the
        # generation path are pipeline-layout-agnostic
        from tsue_tpu.parallel.pipeline import join_llama_layers
        params = join_llama_layers(jax.device_get(params["outer"]),
                                   jax.device_get(params["layers"]))
    if export_path:
        save_pytree(export_path, params)  # stage-2 consumes via import_mllm
    out = {"final_lm_loss": tl / max(tn, 1) if n_epochs else float("nan")}
    if generation_dump:
        from tsue_tpu.eval.generation import distributed_generate_and_save
        refs = {}
        for t in raw[2]:
            tid = t.get("track_id", t.get("id", -1))
            try:
                refs[int(tid)] = t.get("context_str", "")
            except (TypeError, ValueError):
                pass
        recs = distributed_generate_and_save(
            mllm, {"params": params}, tokenizer, dte,
            os.path.join(out_dir, generation_dump), jax.random.key(9),
            max_new_tokens=48, reference_texts=refs)
        out["generated"] = len(recs)
    logger.close()
    return out
