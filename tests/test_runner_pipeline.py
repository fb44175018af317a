"""End-to-end runner pipeline under pytest (tiny no-LLM config).

Guards the full data -> train -> best-ckpt -> eval -> viz orchestration the
CLIs depend on (the LLM-enabled path is covered by the CLI drives and
model-level tests; keeping the LLM out keeps suite time bounded).
"""
import dataclasses
import os

import numpy as np

from tsue_tpu.config import (DataConfig, LaneEncoderConfig, LTSFConfig,
                             ModelConfig, TrainConfig, get_preset)
from tsue_tpu.runner import run_baseline, run_stage2


def _tiny_cfg():
    cfg = get_preset("mllm_free_18_18")
    return dataclasses.replace(
        cfg,
        data=DataConfig(seq_len=6, out_len=6, max_length=64,
                        use_text=False, use_vision=False),
        model=ModelConfig(use_llm=False,
                          lane=LaneEncoderConfig(d_model=16, nhead=2,
                                                 num_layers=1),
                          ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
        train=TrainConfig(batch_size=8, lr=1e-3, freeze_regime="joint"))


def test_run_stage2_pipeline(tmp_path):
    cfg = _tiny_cfg()
    m = run_stage2(cfg, None, str(tmp_path), epochs=2, eval_candidates=3,
                   viz_every=1, synthetic_tracks=8)
    assert m["test_ade"] > 0 and m["test_fde"] > 0
    # min over K STOCHASTIC (dropout-on) candidates need not beat the
    # deterministic forward (and ref RMSE averages over coords AND time,
    # so no ade<=rmse ordering either); pin finiteness + the only real
    # invariant: rmse_k >= ade_k/sqrt(2) per candidate carries to mins
    import math
    assert all(math.isfinite(m[k]) and m[k] > 0
               for k in ("min_ade", "min_fde", "min_rmse"))
    assert m["min_rmse"] >= m["min_ade"] / (2 ** 0.5) - 1e-6
    root = tmp_path / cfg.name
    assert (root / "metrics.jsonl").exists()
    assert (root / "ckpt" / "best").exists()
    viz = sorted(os.listdir(root / "viz"))
    assert any(v.startswith("epoch") for v in viz)
    assert any(v.startswith("test_candidates") for v in viz)


def test_train_rbg_rng_impl(tmp_path):
    """TrainConfig.rng_impl='rbg' (hardware-RNG dropout stream, the -11%
    train-step knob) trains end-to-end; rbg lowers via RngBitGenerator on
    CPU too, so the pipeline must be impl-agnostic."""
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, rng_impl="rbg"))
    m = run_stage2(cfg, None, str(tmp_path), epochs=1, save_viz=False,
                   synthetic_tracks=8)
    assert np.isfinite(m["test_ade"]) and m["test_ade"] > 0


def test_run_stage2_resume_reproduces_uninterrupted(tmp_path):
    """run_stage2(save_every=1) interrupted after 1 of 3 epochs, then
    resume=True for the rest == one uninterrupted 3-epoch run (per-step
    RNG folds on state.step, per-epoch shuffles on the epoch index).
    This is the RUNNER/CLI-level integration of the save/restore_train_state
    primitives test_resume.py pins."""
    cfg = _tiny_cfg()
    m_full = run_stage2(cfg, None, str(tmp_path / "full"), epochs=3,
                        save_viz=False, synthetic_tracks=8)
    m_part = run_stage2(cfg, None, str(tmp_path / "part"), epochs=1,
                        save_every=1, save_viz=False, synthetic_tracks=8)
    m_res = run_stage2(cfg, None, str(tmp_path / "part"), epochs=3,
                       save_every=1, resume=True, save_viz=False,
                       synthetic_tracks=8)
    assert m_part["test_ade"] != m_res["test_ade"]  # training continued
    np.testing.assert_allclose(m_res["test_ade"], m_full["test_ade"],
                               rtol=1e-5)
    np.testing.assert_allclose(m_res["test_fde"], m_full["test_fde"],
                               rtol=1e-5)


def test_run_baseline_cv(tmp_path):
    cfg = _tiny_cfg()
    m = run_baseline("cv", cfg, None, str(tmp_path), eval_candidates=4,
                     synthetic_tracks=8)
    assert m["K"] == 4
    assert m["min_ade"] <= m["test_ade"] + 1e-6


def test_cv_metrics_sample_weighted(tmp_path):
    """Pins the review fix: metrics are total-error/total-samples, immune
    to the wrap-padded tail batch (17 windows -> batches of 16 + 1)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tsue_tpu.data import build_windows, make_synthetic_tracks
    from tsue_tpu.eval.metrics import min_ade_fde_rmse
    from tsue_tpu.models.baselines import cv_candidates
    from tsue_tpu.runner import run_baseline
    from tsue_tpu.data.schema import split_tracks

    cfg = _tiny_cfg()
    m = run_baseline("cv", cfg, None, str(tmp_path), eval_candidates=4,
                     synthetic_tracks=8)
    # recompute directly over the whole un-batched test split
    tracks = make_synthetic_tracks(num_tracks=8, track_len=600,
                                   vision_dim=cfg.data.vision_dim,
                                   seed=cfg.data.split_seed)
    _, _, te = split_tracks(tracks, seed=cfg.data.split_seed)
    import dataclasses
    dcfg = dataclasses.replace(cfg.data, use_text=False, use_vision=False)
    dte = build_windows(te, dcfg)
    bs = cfg.train.batch_size
    assert len(dte) % bs != 0  # the scenario under test: ragged tail
    # same per-batch keys as run_baseline, applied to the same batch splits,
    # but weighted by hand over ALL samples
    from tsue_tpu.data import BatchIterator
    tot = np.zeros(3); n = 0.0
    for i, b in enumerate(BatchIterator(dte, bs, shuffle=False,
                                        seed=cfg.train.seed)):
        b = {k: jnp.asarray(v) for k, v in b.items()}
        cands = cv_candidates(b["traj_in"], dcfg.out_len,
                              jax.random.key(i), 4, 0.1)
        ms = min_ade_fde_rmse(cands, b["traj_out"], b["norm_stat"],
                              b["valid"])
        nv = float(b["valid"].sum())
        tot += np.array([float(x) for x in ms]) * nv
        n += nv
    np.testing.assert_allclose(m["min_ade"], tot[0] / n, rtol=1e-6)
    np.testing.assert_allclose(m["min_rmse"], tot[2] / n, rtol=1e-6)
