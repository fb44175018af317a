"""Golden-value pinning of the data pipeline + pickle --data round-trip."""
import pickle

import numpy as np
import pytest

from tsue_tpu.config import DataConfig
from tsue_tpu.data import build_windows
from tsue_tpu.data.schema import make_synthetic_lane_roi, make_synthetic_tracks


def _track(xs, ys, lane=1, direction="L2R", tid=0):
    traj = np.stack([xs, ys], axis=1).astype(np.float32)
    phr = "left to right" if direction == "L2R" else "right to left"
    return {"raw_trajectory": traj,
            "context_str": f"A{lane}: ego in lane A{lane} moving from {phr}.",
            "lane_roi": make_synthetic_lane_roi(),
            "track_id": tid}


class TestGoldenWindowing:
    def test_hand_computed_window(self):
        """One strictly linear track, downsample=1 semantics emulated by
        pre-downsampling: every normalized value is exactly computable."""
        # downsample=5 keeps indices 0,5,10,...: craft raw so the kept
        # points are x = 0, 40, 80, ... (dx=8 per raw step; the kept step
        # of 40 px stays under the 50 px abnormality gate)
        n_raw = 5 * 12
        xs = 8.0 * np.arange(n_raw)
        ys = np.full(n_raw, 100.0)
        cfg = DataConfig(seq_len=4, out_len=2, stride=6, min_range_x=10.0,
                         use_text=False, use_vision=False)
        ds = build_windows([_track(xs, ys)], cfg)
        # downsampled track: x = 0, 40, ..., 40*(12-1); window = 6 points,
        # starts at 0 and 6 (stride 6)
        assert len(ds) == 2
        # window 0: x in [0, 200]; min=0 max=200
        np.testing.assert_allclose(ds.norm_stat[0], [0.0, 200.0, 100.0,
                                                     100.0])
        # normalized in x: 0, .2, .4, .6; out: .8, 1.0
        np.testing.assert_allclose(ds.traj_in[0, 0],
                                   [0.0, 0.2, 0.4, 0.6], atol=1e-6)
        np.testing.assert_allclose(ds.traj_out[0, 0], [0.8, 1.0], atol=1e-6)
        # y is constant: range_y -> 1.0 fallback, normalized y = 0
        np.testing.assert_allclose(ds.traj_in[0, 1], 0.0, atol=1e-6)
        # window 1 starts at downsampled idx 6: min_x = 240, max_x = 440
        np.testing.assert_allclose(ds.norm_stat[1, 0], 240.0)
        np.testing.assert_allclose(ds.norm_stat[1, 1], 440.0)

    def test_range_gate_exact_boundary(self):
        """range_x exactly at min_range_x passes; just below fails."""
        n_raw = 5 * 6
        cfg = DataConfig(seq_len=4, out_len=2, stride=6, min_range_x=100.0,
                         use_text=False, use_vision=False)
        # kept dx per downsampled step = 5*dx_raw; range over 6pts = 5 steps
        ds_pass = build_windows(
            [_track(4.0 * np.arange(n_raw), np.full(n_raw, 5.0))], cfg)
        assert len(ds_pass) == 1      # range = 5 * 20 = 100 >= 100
        ds_fail = build_windows(
            [_track(3.5 * np.arange(n_raw), np.full(n_raw, 5.0))], cfg)
        assert len(ds_fail) == 0      # range = 87.5 < 100


class TestPickleRoundTrip:
    def test_data_path_flow(self, tmp_path):
        """The real --data flow: pickle -> load_tracks -> windows."""
        from tsue_tpu.data.schema import load_tracks
        tracks = make_synthetic_tracks(num_tracks=5, track_len=300, seed=6)
        p = tmp_path / "all_data.pkl"
        with open(p, "wb") as f:
            pickle.dump(tracks, f)
        loaded = load_tracks(str(p))
        assert len(loaded) == 5
        cfg = DataConfig(seq_len=6, out_len=6, use_text=False,
                         use_vision=False)
        a = build_windows(loaded, cfg)
        b = build_windows(tracks, cfg)
        np.testing.assert_array_equal(a.traj_in, b.traj_in)

    def test_torch_tensor_payload(self, tmp_path):
        """The reference pickle stores torch tensors for vision embeddings;
        the pipeline must accept them transparently."""
        torch = pytest.importorskip("torch")
        tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=7)
        for t in tracks:
            t["vision_embeddings"] = torch.tensor(t["vision_embeddings"])
            t["raw_trajectory"] = torch.tensor(t["raw_trajectory"])
        p = tmp_path / "torch_data.pkl"
        with open(p, "wb") as f:
            pickle.dump(tracks, f)
        from tsue_tpu.data.schema import load_tracks
        cfg = DataConfig(seq_len=6, out_len=6, use_text=False)
        ds = build_windows(load_tracks(str(p)), cfg)
        assert len(ds) > 0
        assert np.isfinite(ds.vision).all()
