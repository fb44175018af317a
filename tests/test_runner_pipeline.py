"""End-to-end runner pipeline under pytest (tiny no-LLM config).

Guards the full data -> train -> best-ckpt -> eval -> viz orchestration the
CLIs depend on (the LLM-enabled path is covered by the CLI drives and
model-level tests; keeping the LLM out keeps suite time bounded).
"""
import dataclasses
import os

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
    assert m["min_ade"] <= m["test_ade"] + 1e-6  # min over K can't be worse
    root = tmp_path / cfg.name
    assert (root / "metrics.jsonl").exists()
    assert (root / "ckpt" / "best").exists()
    viz = sorted(os.listdir(root / "viz"))
    assert any(v.startswith("epoch") for v in viz)
    assert any(v.startswith("test_candidates") for v in viz)


def test_run_baseline_cv(tmp_path):
    cfg = _tiny_cfg()
    m = run_baseline("cv", cfg, None, str(tmp_path), eval_candidates=4,
                     synthetic_tracks=8)
    assert m["K"] == 4
    assert m["min_ade"] <= m["test_ade"] + 1e-6
