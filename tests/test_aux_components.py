"""Auxiliary parity components: track-group sampling, stage-1 per-track
dataset, debug/param-count utilities."""
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import DataConfig
from tsue_tpu.data import BatchIterator
from tsue_tpu.data.schema import make_synthetic_tracks
from tsue_tpu.data.text_dataset import build_track_text_dataset
from tsue_tpu.data.tokenizer import ByteTokenizer
from tsue_tpu.utils.debug import count_params, nan_probe


class TestTrackGroupSampler:
    def test_groups_stay_contiguous(self, small_windows):
        it = BatchIterator(small_windows, batch_size=4, shuffle=True,
                           seed=3, group_by_track=True)
        seen = []
        for b in it:
            seen.extend(int(t) for t, v in zip(b["track_id"], b["valid"])
                        if v)
        # within the traversal, each track's windows form one contiguous run
        runs = []
        for t in seen:
            if not runs or runs[-1] != t:
                runs.append(t)
        assert len(runs) == len(set(runs)), f"track split across runs: {runs}"

    def test_reshuffles_groups_by_epoch(self, small_windows):
        it = BatchIterator(small_windows, batch_size=4, shuffle=True,
                           seed=3, group_by_track=True)

        def traversal():
            return [int(t) for b in it for t in b["track_id"]]

        orders = []
        for e in range(6):
            it.set_epoch(e)
            orders.append(tuple(traversal()))
        # same epoch is deterministic...
        it.set_epoch(0)
        assert tuple(traversal()) == orders[0]
        # ...and at least one of several epochs produces a new group order
        assert len(set(orders)) > 1


class TestTrackTextDataset:
    def test_build(self):
        tok = ByteTokenizer()
        tracks = make_synthetic_tracks(num_tracks=5, track_len=300, seed=2)
        cfg = DataConfig(max_length=640)
        ds = build_track_text_dataset(tracks, cfg, tok, max_frames=32)
        assert len(ds) == 5
        assert ds.vision.shape == (5, 32, 512)
        assert (ds.vision_len <= 32).all() and (ds.vision_len > 0).all()
        assert len(ds.reference_text) == 5
        # one row per track, labels carry the answer span
        assert ((ds.labels != -100).sum(axis=1) > 0).all()
        sl = ds.slice([1, 3])
        assert len(sl) == 2 and sl.reference_text[0] == ds.reference_text[1]

    def test_skips_tracks_without_context_or_vision(self):
        tok = ByteTokenizer()
        tracks = [{"context_str": "", "vision_embeddings": np.ones((10, 4))},
                  {"context_str": "A1: x", "vision_embeddings": None},
                  {"context_str": "A1: ok",
                   "vision_embeddings": np.ones((10, 4)), "track_id": 7}]
        ds = build_track_text_dataset(tracks, DataConfig(max_length=640), tok,
                                      max_frames=8)
        assert len(ds) == 1 and int(ds.track_id[0]) == 7


class TestDebugUtils:
    def test_count_params(self):
        params = {"a": {"w": np.zeros((3, 4))}, "b": {"w": np.zeros(5)}}
        c = count_params(params)
        assert c["total"] == 17
        assert c["groups"] == {"a": 12, "b": 5}
        c2 = count_params(params, lambda s: "freeze" if s[0] == "a" else "train")
        assert c2["trainable"] == 5

    def test_nan_probe_passthrough(self):
        x = jnp.ones((3,))
        y = nan_probe(x, "x")
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestXplaneReader:
    """utils/xplane.py: the self-contained trace reader behind
    scripts/profile_ops.py (SURVEY §5 tracing; no TensorBoard in image)."""

    def test_parse_real_trace(self, tmp_path):
        import jax

        f = jax.jit(lambda x: jnp.sin(x) @ x.T)
        x = jnp.ones((64, 64))
        f(x).block_until_ready()
        jax.profiler.start_trace(str(tmp_path))
        f(x).block_until_ready()
        jax.profiler.stop_trace()

        from tsue_tpu.utils.xplane import (find_xplane, op_durations,
                                           summarize)
        pb = find_xplane(str(tmp_path))
        agg = op_durations(pb, plane_filter="", line_filter="")
        assert agg, "no events parsed from a real trace"
        assert all(r["ps"] >= 0 and r["count"] >= 1 for r in agg.values())
        text = summarize(agg, top=5)
        assert "total leaf device time" in text and "by opcode" in text

    def test_wire_parser_roundtrip(self):
        # hand-built message: field 1 varint 300, field 2 bytes "ab",
        # field 3 fixed64, field 4 fixed32
        import struct
        buf = (bytes([0x08, 0xAC, 0x02]) + bytes([0x12, 0x02]) + b"ab"
               + bytes([0x19]) + struct.pack("<Q", 7)
               + bytes([0x25]) + struct.pack("<I", 9))
        from tsue_tpu.utils.xplane import parse_message
        fields = parse_message(buf)
        assert fields == [(1, 0, 300), (2, 2, b"ab"), (3, 1, 7), (4, 5, 9)]
