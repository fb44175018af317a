"""C++ native preprocessing: build, parity with the NumPy path, speed."""
import time

import numpy as np
import pytest

from tsue_tpu import native
from tsue_tpu.config import DataConfig
from tsue_tpu.data.filters import is_trajectory_abnormal
from tsue_tpu.data.schema import make_synthetic_tracks
from tsue_tpu.data.tokenizer import ByteTokenizer
from tsue_tpu.data.windowing import build_windows

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


class TestNativeKernels:
    def test_abnormal_parity(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            n = int(rng.integers(2, 60))
            traj = np.cumsum(rng.normal(0, 15, (n, 2)), axis=0).astype(
                np.float32)
            for d in (None, "R2L", "L2R"):
                ref = is_trajectory_abnormal(traj, d, 50.0, 30.0)
                nat = native.is_abnormal(traj, 50.0, 30.0, d)
                assert ref == nat, (d, traj[:4])

    def test_window_parity_bitwise(self):
        tracks = make_synthetic_tracks(num_tracks=10, track_len=500, seed=4)
        cfg = DataConfig(seq_len=6, out_len=6, max_length=640)
        tok = ByteTokenizer()
        a = build_windows(tracks, cfg, tok, use_native=True)
        b = build_windows(tracks, cfg, tok, use_native=False)
        assert len(a) == len(b) and len(a) > 0
        np.testing.assert_array_equal(a.traj_in, b.traj_in)
        np.testing.assert_array_equal(a.traj_out, b.traj_out)
        np.testing.assert_array_equal(a.norm_stat, b.norm_stat)
        np.testing.assert_array_equal(a.vision, b.vision)
        np.testing.assert_array_equal(a.track_id, b.track_id)

    def test_range_gate_parity(self):
        # slow track: every window fails the range_x gate in both paths
        t = np.stack([np.linspace(0, 30, 300),
                      np.full(300, 100.0)], axis=1).astype(np.float32)
        tin, tout, st, starts = native.build_track_windows(t, 6, 6, 6, 100.0)
        assert len(starts) == 0

    def test_native_kernel_faster_on_long_tracks(self):
        """Kernel-only comparison (the shared Python row-append path
        dominates end-to-end timings and makes them noisy)."""
        from tsue_tpu.data.windowing import _numpy_track_windows
        rng = np.random.default_rng(6)
        raw = np.cumsum(rng.normal(3, 1, (20000, 2)), axis=0).astype(
            np.float32)
        cfg = DataConfig(seq_len=18, out_len=30, stride=1)
        t0 = time.time()
        for _ in range(3):
            tin, tout, st, starts = native.build_track_windows(
                raw, 18, 30, 1, 100.0)
        t_nat = (time.time() - t0) / 3
        t0 = time.time()
        ref = _numpy_track_windows(raw, cfg)
        t_np = time.time() - t0
        assert len(starts) == len(ref) > 10000
        np.testing.assert_array_equal(tin[0], ref[0][1])
        assert t_nat < t_np, (t_nat, t_np)
