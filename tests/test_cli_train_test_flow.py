"""README-quickstart CLI pair regression: train.py -> test.py --ckpt.

Round-2 verdict: frozen-regime best checkpoints store only the trainable
subtree (train/checkpoint.py BestCheckpointer), but the eval CLIs restored
against the full tree and crashed with an orbax structure mismatch.  This
test runs the REAL CLI code path (subprocess, like a user would) with a
tiny LLM under the canonical frozen_mllm regime — the exact configuration
that used to crash — and pins the fix (checkpoint.restore_merge).

Ref flow: scripts/train.py:1219-1224 best-ckpt save ->
scripts/test.py:1273-1276 load-best-then-test.
"""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy  # ~8 min: real CLI subprocesses

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    env = dict(os.environ)
    env["TSUE_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=1500)
    assert out.returncode == 0, (
        f"{script} failed\nSTDOUT:\n{out.stdout}\nSTDERR:\n{out.stderr[-4000:]}")
    # finish() prints one JSON line last
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_readme_train_then_test_frozen_regime(tmp_path):
    out_dir = str(tmp_path)
    m_train = _run("train.py", "--tiny", "--preset", "train_18_30",
                   "--epochs", "1", "--batch-size", "8", "--viz-every", "1",
                   "--synthetic-tracks", "6", "--out-dir", out_dir)
    assert "test_ade" in m_train
    ckpt = os.path.join(out_dir, "train_18_30", "ckpt", "best")
    assert os.path.exists(ckpt), "best checkpoint was not written"
    # T7: per-epoch qualitative sample = PNG + generated context paragraph
    # (ref scripts/train.py:1226-1247), reachable from the canonical CLI
    run_root = os.path.join(out_dir, "train_18_30")
    viz = os.listdir(os.path.join(run_root, "viz"))
    assert any(v.startswith("epoch") for v in viz)
    txt = os.path.join(run_root, "generated_samples.txt")
    assert os.path.exists(txt)
    with open(txt) as f:
        assert "[epoch 0]" in f.read()

    # the README pair: evaluate that checkpoint through scripts/test.py
    # (preset must match the training horizons — README documents this)
    m_test = _run("test.py", "--tiny", "--preset", "train_18_30",
                  "--ckpt", ckpt, "--k", "2", "--batch-size", "8",
                  "--synthetic-tracks", "6", "--out-dir", out_dir)
    assert m_test["test_ade"] > 0 and m_test["K"] == 2
    # min over K STOCHASTIC (dropout-on) candidates need not beat the
    # deterministic forward, so only pin finiteness here
    import math
    assert math.isfinite(m_test["min_ade"]) and m_test["min_ade"] > 0


def test_eval_requires_train_time_mllm_ckpt(tmp_path):
    """Review finding: a frozen-regime checkpoint trained with
    --mllm-ckpt omits the frozen subtree; evaluating it without the same
    stage-1 artifact would silently score a random-init LLM.  The
    meta.json provenance guard must fail FAST (before any data/model
    build) with an actionable message."""
    import json
    import pytest
    from tsue_tpu.config import get_preset
    from tsue_tpu.runner import run_stage2

    ck = tmp_path / "ckpt"
    ck.mkdir()
    (ck / "meta.json").write_text(json.dumps(
        {"name": "train_18_30", "freeze_regime": "frozen_mllm",
         "mllm_ckpt": "/runs/mllm"}))
    with pytest.raises(RuntimeError, match="mllm-ckpt"):
        run_stage2(get_preset("test_18_18"), None, str(tmp_path),
                   epochs=0, restore_ckpt=str(ck / "best"))


def test_restore_merge_shape_mismatch_is_loud(tmp_path):
    """A checkpoint trained at one horizon evaluated under another must
    raise a shape-mismatch error naming the preset fix, not an opaque
    orbax failure."""
    import numpy as np
    import pytest
    from tsue_tpu.train.checkpoint import restore_merge, save_pytree

    path = str(tmp_path / "ck")
    save_pytree(path, {"dec": {"kernel": np.ones((18, 30), np.float32)}})
    target = {"dec": {"kernel": np.zeros((18, 18), np.float32)},
              "other": np.zeros((3,), np.float32)}
    with pytest.raises(ValueError, match="preset"):
        restore_merge(path, target)


def test_restore_merge_subset_and_full(tmp_path):
    import numpy as np
    from tsue_tpu.train.checkpoint import restore_merge, save_pytree

    full = {"a": {"x": np.full((2,), 1.0, np.float32)},
            "b": np.full((3,), 2.0, np.float32)}
    # subset checkpoint: only "a" stored (the frozen-regime artifact shape)
    sub_path = str(tmp_path / "sub")
    save_pytree(sub_path, {"a": {"x": np.full((2,), 9.0, np.float32)}})
    target = {"a": {"x": np.zeros((2,), np.float32)},
              "b": np.full((3,), 5.0, np.float32)}
    merged = restore_merge(sub_path, target)
    assert merged["a"]["x"][0] == 9.0      # restored leaf
    assert merged["b"][0] == 5.0           # target leaf kept

    full_path = str(tmp_path / "full")
    save_pytree(full_path, full)
    merged = restore_merge(full_path, target)
    assert merged["a"]["x"][0] == 1.0 and merged["b"][0] == 2.0
