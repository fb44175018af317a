"""Pinned fast-vs-parity candidate-eval equivalence (VERDICT r1 item 4).

"parity" candidate mode reproduces the reference's train()-inside-no_grad
sampling (dropout active in the WHOLE model, ref scripts/test.py:1308-1309);
"fast" mode computes the MLLM context deterministically and samples only
forecaster dropout.  This test trains a small stack JOINTLY (so Q-Former
and LoRA dropout have trained weights to perturb), evaluates K=10
minADE/minFDE/minRMSE in both modes across seeds, and pins that the mode
means agree within a small relative tolerance.  The full mid-size study
(5 seeds, 30 epochs) lives in scripts/study_fast_vs_parity.py and its
results are tabulated in PARITY.md.
"""
import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # ~8 min: real joint training

from tsue_tpu.config import (LaneEncoderConfig, LlamaConfig, LTSFConfig,
                             ModelConfig, QFormerConfig, get_preset)

N_SEEDS = 3
K = 10


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from tsue_tpu.runner import rebuild_for_eval, run_stage2

    cfg = get_preset("train_18_30")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, seq_len=6, out_len=6,
                                 max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
        train=dataclasses.replace(cfg.train, batch_size=8,
                                  freeze_regime="joint"))
    out_dir = str(tmp_path_factory.mktemp("fvp"))
    run_stage2(cfg, None, out_dir, epochs=6, eval_candidates=0,
               save_viz=False, synthetic_tracks=12)
    model, params, (_, _, dte) = rebuild_for_eval(cfg, None, out_dir,
                                                  synthetic_tracks=12)
    return cfg, model, params, dte


def _mode_metrics(trained, mode):
    from tsue_tpu.parallel.mesh import make_mesh
    from tsue_tpu.runner import evaluate

    cfg, model, params, dte = trained
    mesh = make_mesh(1)
    rows = []
    with mesh:
        for s in range(N_SEEDS):
            m = evaluate(model, params, dte, cfg, mesh, eval_candidates=K,
                         viz_dir=None, candidate_mode=mode,
                         eval_seed=5000 + 977 * s)
            rows.append([m["min_ade"], m["min_fde"], m["min_rmse"]])
    return np.asarray(rows)


def test_fast_matches_parity_statistics(trained):
    fast = _mode_metrics(trained, "fast")
    parity = _mode_metrics(trained, "parity")
    assert np.isfinite(fast).all() and np.isfinite(parity).all()
    rel = np.abs(fast.mean(axis=0) - parity.mean(axis=0)) / parity.mean(axis=0)
    # the modes sample different (deliberately documented) distributions;
    # equivalence claim = the K-candidate metrics agree to a few percent
    assert (rel < 0.10).all(), (
        f"fast vs parity mean metrics diverge: fast={fast.mean(axis=0)}, "
        f"parity={parity.mean(axis=0)}, rel={rel}")


def test_parity_mode_really_samples_llm_dropout(trained):
    """Sanity: parity candidates differ when ONLY LLM-side rngs differ.

    Guards against parity mode silently sharing fast mode's deterministic
    context (the r1 honesty gap) — the LLM/Q-Former dropout must
    contribute to candidate diversity in parity mode.
    """
    import jax
    from tsue_tpu.eval.metrics import candidate_rollout, fast_candidate_rollout
    from tsue_tpu.runner import _batches, _to_device

    cfg, model, params, dte = trained
    batch = _to_device(next(iter(_batches(dte, cfg, False))))
    rng = jax.random.key(0)
    par = candidate_rollout(
        lambda v, b, det, rngs: model.apply(v, b, det, rngs=rngs),
        {"params": params}, batch, 4, rng)
    fast = fast_candidate_rollout(model, {"params": params}, batch, 4, rng)
    # same rng => forecaster dropout identical; any candidate difference
    # comes from the LLM-side dropout parity mode additionally samples
    assert not np.allclose(np.asarray(par), np.asarray(fast), atol=1e-6)
