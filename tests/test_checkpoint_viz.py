"""Checkpointing (orbax) and visualization artifacts."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.data.schema import make_synthetic_lane_roi
from tsue_tpu.train.checkpoint import (BestCheckpointer, export_mllm,
                                       import_mllm, restore_pytree,
                                       save_pytree, strip_lora)
from tsue_tpu.viz import (plot_best_of_k, plot_candidates, plot_lane_roi_map,
                          plot_one_sample, plot_trajectories_over_map,
                          plot_xy_time)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
                "b": {"c": np.ones((4,), np.int32)}}
        save_pytree(str(tmp_path / "ck"), tree)
        out = restore_pytree(str(tmp_path / "ck"), target=tree)
        np.testing.assert_array_equal(out["a"], tree["a"])
        np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])

    def test_best_checkpointer_protocol(self, tmp_path):
        bc = BestCheckpointer(str(tmp_path / "best_dir"))
        p1 = {"w": np.ones(3, np.float32)}
        p2 = {"w": np.full(3, 2.0, np.float32)}
        assert bc.maybe_save(10.0, p1)
        assert not bc.maybe_save(11.0, p2)   # worse: not saved
        assert bc.maybe_save(5.0, p2)        # better: saved
        out = bc.restore_best(target=p1)
        np.testing.assert_array_equal(out["w"], p2["w"])

    def test_mllm_handoff(self, tmp_path):
        params = {"mllm": {"qformer": {"w": np.ones((2, 2), np.float32)}},
                  "ltsf": {"w": np.zeros(2, np.float32)}}
        export_mllm(params, str(tmp_path / "mllm_ck"))
        fresh = {"mllm": {"qformer": {"w": np.zeros((2, 2), np.float32)}},
                 "ltsf": {"w": np.full(2, 7.0, np.float32)}}
        loaded = import_mllm(fresh, str(tmp_path / "mllm_ck"))
        np.testing.assert_array_equal(loaded["mllm"]["qformer"]["w"],
                                      np.ones((2, 2)))
        np.testing.assert_array_equal(loaded["ltsf"]["w"], fresh["ltsf"]["w"])

    def test_strip_lora(self):
        params = {"llama": {"q_proj": {"kernel": np.ones(2),
                                       "lora_a": np.ones(2),
                                       "lora_b": np.ones(2)},
                            "k_proj": {"kernel": np.ones(2)}}}
        out = strip_lora(params)
        assert "lora_a" not in out["llama"]["q_proj"]
        assert "kernel" in out["llama"]["q_proj"]
        assert "kernel" in out["llama"]["k_proj"]


class TestViz:
    def _trajs(self):
        t = np.linspace(0, 1, 10)
        past = np.stack([100 + 50 * t, 200 + 5 * t])
        gt = np.stack([150 + 50 * t, 205 + 5 * t])
        pred = gt + np.random.default_rng(0).normal(0, 2, gt.shape)
        return past, gt, pred

    def test_all_plot_artifacts(self, tmp_path):
        d = str(tmp_path)
        past, gt, pred = self._trajs()
        cands = np.stack([pred + i for i in range(4)])
        roi = make_synthetic_lane_roi()
        paths = [
            plot_one_sample(past, gt, pred, d,
                            polygon=np.asarray(roi["Site C"]["A"]["1"])),
            plot_candidates(past, gt, cands, d),
            plot_best_of_k(past, gt, cands, d),
            plot_xy_time(gt, [pred, pred + 1], d),
            plot_lane_roi_map(roi, d),
            plot_trajectories_over_map(
                [{"past": past, "gt": gt, "pred": pred}] * 3, roi, d),
        ]
        for p in paths:
            assert os.path.exists(p) and os.path.getsize(p) > 1000, p


class TestTrainableOnlyCheckpoint:
    def test_subset_save_and_merged_restore(self, tmp_path):
        from tsue_tpu.train.checkpoint import BestCheckpointer
        params = {"mllm": {"w": np.zeros(3, np.float32)},
                  "ltsf": {"w": np.ones(3, np.float32)}}
        bc = BestCheckpointer(str(tmp_path / "c"),
                              trainable_filter=lambda p: "mllm" not in p)
        assert bc.maybe_save(1.0, params)
        # later params: both subtrees moved, but only ltsf was saved
        later = {"mllm": {"w": np.full(3, 9.0, np.float32)},
                 "ltsf": {"w": np.full(3, 5.0, np.float32)}}
        out = bc.restore_best(target=later)
        np.testing.assert_array_equal(out["ltsf"]["w"], np.ones(3))   # best
        np.testing.assert_array_equal(out["mllm"]["w"],
                                      np.full(3, 9.0))                 # kept
