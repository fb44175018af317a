"""Data layer tests: filters, splitting, windowing, batching, tokenizer."""
import numpy as np
import pytest

from tsue_tpu.config import DataConfig
from tsue_tpu.data.filters import (
    check_data_sanity, filter_context, parse_lane_from_context,
    get_polygon_from_lane_roi, is_trajectory_abnormal)
from tsue_tpu.data.schema import (
    make_synthetic_tracks, make_synthetic_lane_roi, split_tracks)
from tsue_tpu.data.tokenizer import ByteTokenizer
from tsue_tpu.data.windowing import build_windows, IGNORE_LABEL
from tsue_tpu.data.dataset import BatchIterator


class TestFilters:
    def test_filter_context_empty(self):
        assert filter_context("") == ("No context provided", "R2L")

    def test_filter_context_rejects_a4_a6(self):
        assert filter_context("A4: something") == (None, None)
        assert filter_context("A1: ok\nA5: bad") == (None, None)

    def test_filter_context_keeps_a1_a3_and_direction(self):
        ctx = "A2: vehicle moving from left to right\nB1: ignored"
        filtered, direction = filter_context(ctx)
        assert filtered == "A2: vehicle moving from left to right"
        assert direction == "L2R"
        _, d2 = filter_context("A1: moving from right to left")
        assert d2 == "R2L"
        _, d3 = filter_context("A1: no direction words")
        assert d3 == "R2L"  # default

    def test_parse_lane(self):
        assert parse_lane_from_context("in lane A2 at Site C") == "2"
        assert parse_lane_from_context("in lane safe zone") == "safe"
        assert parse_lane_from_context("no lane info") is None

    def test_polygon_lookup(self):
        roi = make_synthetic_lane_roi()
        p = get_polygon_from_lane_roi(roi, "2")
        assert p.ndim == 2 and p.shape[1] == 2 and p.dtype == np.float32
        assert get_polygon_from_lane_roi(roi, None).shape == (0, 2)
        assert get_polygon_from_lane_roi(roi, "99").shape == (0, 2)

    def test_abnormal_step(self):
        traj = np.array([[0, 0], [10, 0], [200, 0]], dtype=np.float32)
        assert is_trajectory_abnormal(traj)  # 190px step > 50

    def test_abnormal_monotonicity(self):
        traj = np.array([[0, 0], [10, 0], [5, 0]], dtype=np.float32)
        assert is_trajectory_abnormal(traj, lane_label="L2R")
        traj_r2l = traj[::-1].copy()
        assert is_trajectory_abnormal(traj_r2l, lane_label="R2L")
        assert not is_trajectory_abnormal(
            np.array([[0, 0], [10, 0], [20, 0]], dtype=np.float32),
            lane_label="L2R")

    def test_sanity(self):
        good = {"raw_trajectory": np.zeros((5, 2))}
        nan = {"raw_trajectory": np.full((5, 2), np.nan)}
        huge = {"raw_trajectory": np.full((5, 2), 1e7)}
        out = check_data_sanity([good, nan, huge, {}])
        assert out == [good]


class TestSplit:
    def test_deterministic_split(self):
        tracks = [{"i": i} for i in range(100)]
        a = split_tracks(tracks, seed=42)
        b = split_tracks(tracks, seed=42)
        assert [t["i"] for t in a[0]] == [t["i"] for t in b[0]]
        assert len(a[0]) == 70 and len(a[1]) == 20 and len(a[2]) == 10
        c = split_tracks(tracks, seed=1)
        assert [t["i"] for t in c[0]] != [t["i"] for t in a[0]]


class TestTokenizer:
    def test_roundtrip(self):
        tok = ByteTokenizer()
        text = "A1: hello, 차량! \n"
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        assert max(ids) < tok.vocab_size
        assert tok.vocab_size % 128 == 0

    def test_truncation(self):
        tok = ByteTokenizer()
        assert len(tok.encode("x" * 100, max_length=10)) == 10


class TestWindowing:
    def test_shapes(self, small_windows, small_data_cfg):
        ds, cfg = small_windows, small_data_cfg
        n = len(ds)
        assert ds.traj_in.shape == (n, 2, cfg.seq_len)
        assert ds.traj_out.shape == (n, 2, cfg.out_len)
        assert ds.vision.shape == (n, cfg.seq_len, cfg.vision_dim)
        assert ds.polygon.shape == (n, cfg.max_polygon_points, 2)
        assert ds.input_ids.shape == (n, cfg.max_length)
        assert ds.norm_stat.shape == (n, 4)

    def test_normalization_in_unit_box(self, small_windows):
        assert small_windows.traj_in.min() >= -1e-6
        assert small_windows.traj_in.max() <= 1 + 1e-6
        assert small_windows.traj_out.min() >= -1e-6
        assert small_windows.traj_out.max() <= 1 + 1e-6

    def test_denormalization_recovers_pixels(self, small_windows):
        ds = small_windows
        ns = ds.norm_stat
        x = ds.traj_in[:, 0, :] * (ns[:, 1:2] - ns[:, 0:1]) + ns[:, 0:1]
        # windows were built from tracks with |vx| in [2,5] px/frame,
        # downsample 5 -> per-step dx in [10,25] px
        dx = np.abs(np.diff(x, axis=1))
        assert dx.min() > 5.0 and dx.max() < 30.0

    def test_range_x_gate(self, synthetic_tracks, tokenizer):
        # huge min_range_x filters everything
        cfg = DataConfig(seq_len=6, out_len=6, min_range_x=1e9, max_length=32)
        ds = build_windows(synthetic_tracks, cfg, tokenizer)
        assert len(ds) == 0

    def test_labels_mask_prompt(self, small_windows):
        ds = small_windows
        # prompt region must be IGNORE_LABEL, some answer region must not
        assert (ds.labels[:, 0] == IGNORE_LABEL).all()
        assert (ds.labels != IGNORE_LABEL).any()
        # labels match input_ids where not ignored
        mask = ds.labels != IGNORE_LABEL
        assert (ds.input_ids[mask] == ds.labels[mask]).all()

    def test_anomalous_tracks_dropped(self, tokenizer):
        tracks = make_synthetic_tracks(num_tracks=8, seed=3,
                                       anomaly_fraction=1.0)
        cfg = DataConfig(seq_len=6, out_len=6, max_length=32)
        ds = build_windows(tracks, cfg, tokenizer)
        assert len(ds) == 0  # all have a 200px teleport step


class TestBatchIterator:
    def test_batches_cover_dataset(self, small_windows):
        it = BatchIterator(small_windows, batch_size=8, shuffle=True, seed=0)
        total_valid = 0
        for batch in it:
            assert batch["traj_in"].shape[0] == 8
            total_valid += int(batch["valid"].sum())
        assert total_valid == len(small_windows)

    def test_process_sharding_partitions(self, small_windows):
        full = BatchIterator(small_windows, batch_size=8, shuffle=True, seed=0)
        sh0 = BatchIterator(small_windows, batch_size=8, shuffle=True, seed=0,
                            process_index=0, process_count=2)
        sh1 = BatchIterator(small_windows, batch_size=8, shuffle=True, seed=0,
                            process_index=1, process_count=2)
        for bf, b0, b1 in zip(full, sh0, sh1):
            assert b0["traj_in"].shape[0] == 4
            # CONTIGUOUS shards: concatenated process shards reproduce the
            # single-process global batch row order exactly (this is what
            # makes 2x4 == 1x8 bit-comparable, tests/test_two_process.py)
            merged = np.concatenate([b0["traj_in"], b1["traj_in"]])
            np.testing.assert_array_equal(merged, bf["traj_in"])

    @pytest.fixture(scope="class")
    def roomy_windows(self, synthetic_tracks, tokenizer):
        # max_length well above the real row lengths so buckets can bite
        cfg = DataConfig(seq_len=6, out_len=6, stride=6, max_length=1024)
        return build_windows(synthetic_tracks, cfg, tokenizer)

    def test_length_buckets_trim_text(self, roomy_windows):
        """Text arrays shrink to the smallest bucket covering the batch's
        longest row; trajectory arrays are untouched."""
        ds = roomy_windows
        full_w = ds.input_ids.shape[1]
        longest = int(ds.attention_mask.sum(axis=1).max())
        assert longest < full_w
        bucket = ((longest + 63) // 64) * 64
        it = BatchIterator(ds, batch_size=8, shuffle=False,
                           length_buckets=(bucket, full_w))
        for b in it:
            assert b["input_ids"].shape[1] == bucket
            assert b["attention_mask"].shape[1] == bucket
            assert b["labels"].shape[1] == bucket
            assert b["traj_in"].shape[2] == ds.traj_in.shape[2]
            # nothing real was cut
            assert int(b["attention_mask"].sum(axis=1).max()) <= bucket

    def test_length_buckets_global_across_processes(self, roomy_windows):
        """Both process shards of one global batch pick the SAME bucket
        (jit programs must agree across processes), chosen from the
        GLOBAL batch rows, not the local shard."""
        full_w = roomy_windows.input_ids.shape[1]
        buckets = tuple(range(64, full_w + 64, 64))
        kw = dict(batch_size=8, shuffle=True, seed=0,
                  length_buckets=buckets, process_count=2)
        for b0, b1 in zip(
                BatchIterator(roomy_windows, process_index=0, **kw),
                BatchIterator(roomy_windows, process_index=1, **kw)):
            assert b0["input_ids"].shape == b1["input_ids"].shape

    def test_epoch_reshuffle(self, small_windows):
        it = BatchIterator(small_windows, batch_size=8, shuffle=True, seed=0)
        b0 = next(iter(it))
        it.set_epoch(1)
        b1 = next(iter(it))
        assert not np.array_equal(b0["track_id"], b1["track_id"]) or \
            not np.array_equal(b0["traj_in"], b1["traj_in"])


class TestWrapUnderfill:
    def test_dataset_smaller_than_half_batch(self, small_windows):
        """Regression: n < batch_size/2 must still yield full-size batches."""
        tiny = small_windows.slice(np.arange(3))
        it = BatchIterator(tiny, batch_size=16, shuffle=True, seed=0)
        batches = list(it)
        assert len(batches) == 1
        b = batches[0]
        assert b["traj_in"].shape[0] == 16
        assert b["valid"].shape[0] == 16
        assert int(b["valid"].sum()) == 3
