"""Ingesting lane-ROI tables in the reference's formats.

The reference ships its Site C zone-A survey polygons as a Python literal
``lane_roi = {...}`` inside scripts/graph.py (ref scripts/graph.py:7-216)
and draws the publication figure over them (ref scripts/plot.py:1019-1078).
These tests write a table in that EXACT source format (tiny synthetic
coordinates, not the reference's survey data), load it without executing
the file, and render both figures from it.
"""
import json
import os
import pickle

import numpy as np
import pytest

from tsue_tpu.data.schema import load_lane_roi, make_synthetic_lane_roi

# graph.py-format source: module with imports, a lane_roi literal, helpers
GRAPHPY_SRC = """\
import matplotlib.pyplot as plt
import numpy as np

# -------------------------------
# lane ROI table
# -------------------------------
lane_roi = {
    "Site C": {
        "A": {
            "1": [
                [0.0, 100.0],
                [400.0, 110.0],
                [400.0, 160.0],
                [0.0, 150.0]
            ],
            "2": [
                [0.0, 160.0],
                [400.0, 170.0],
                [400.0, 220.0],
                [0.0, 210.0]
            ],
            "safe": [
                [0.0, 300.0],
                [400.0, 300.0],
                [400.0, 380.0],
                [0.0, 380.0]
            ]
        }
    }
}

def plot_lane_polygons(lane_roi, site="Site C"):
    raise RuntimeError("must never execute")  # loader parses, never imports
"""


@pytest.fixture()
def roi_py(tmp_path):
    p = tmp_path / "ref_graph.py"
    p.write_text(GRAPHPY_SRC)
    return str(p)


def test_load_graphpy_format(roi_py):
    roi = load_lane_roi(roi_py)
    lanes = roi["Site C"]["A"]
    assert set(lanes) == {"1", "2", "safe"}
    arr = np.asarray(lanes["1"])
    assert arr.shape == (4, 2)
    np.testing.assert_allclose(arr[1], [400.0, 110.0])


def test_load_json_and_pickle_roundtrip(tmp_path, roi_py):
    roi = load_lane_roi(roi_py)
    jp = tmp_path / "roi.json"
    jp.write_text(json.dumps(roi))
    assert load_lane_roi(str(jp)) == roi

    pp = tmp_path / "roi.pkl"
    with open(pp, "wb") as f:
        pickle.dump(roi, f)
    assert load_lane_roi(str(pp)) == roi

    # all_data-style: list of track dicts carrying lane_roi
    tp = tmp_path / "tracks.pkl"
    with open(tp, "wb") as f:
        pickle.dump([{"track_id": 1, "lane_roi": roi}], f)
    assert load_lane_roi(str(tp)) == roi


def test_load_rejects_bad_tables(tmp_path):
    p = tmp_path / "no_roi.py"
    p.write_text("x = 1\n")
    with pytest.raises(ValueError, match="lane_roi"):
        load_lane_roi(str(p))

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"Site C": {"A": {"1": [[0, 0], [1, 1]]}}}))
    with pytest.raises(ValueError, match="N>=3"):
        load_lane_roi(str(bad))

    with pytest.raises(ValueError, match="format"):
        load_lane_roi(str(tmp_path / "roi.txt"))


def test_render_figures_from_reference_format(tmp_path, roi_py):
    """The graph.py map and the plot.py publication figure both render from
    a reference-format table."""
    from tsue_tpu.viz import plot_lane_roi_map, plot_trajectories_over_map
    roi = load_lane_roi(roi_py)
    out = plot_lane_roi_map(roi, str(tmp_path), image_size=(400, 400))
    assert os.path.exists(out) and os.path.getsize(out) > 0

    t = np.linspace(0, 1, 10)
    samples = [{"past": np.stack([t * 100, 120 + 5 * t]),
                "gt": np.stack([100 + t * 100, 125 + 5 * t]),
                "pred": np.stack([100 + t * 100, 127 + 4 * t])}]
    out2 = plot_trajectories_over_map(samples, roi, str(tmp_path),
                                      image_size=(400, 400))
    assert os.path.exists(out2) and os.path.getsize(out2) > 0


def test_site_zone_selection_never_silently_empty(tmp_path):
    """A table keyed other than 'Site C'/'A' must raise (naming the
    available keys) or auto-select, never render a blank map."""
    from tsue_tpu.viz import plot_lane_roi_map
    roi = {"Site A": {"B": make_synthetic_lane_roi()["Site C"]["A"]}}
    with pytest.raises(ValueError, match="Site A"):
        plot_lane_roi_map(roi, str(tmp_path))  # default 'Site C' missing
    # single-site/zone tables auto-select with site=None/zone=None
    out = plot_lane_roi_map(roi, str(tmp_path), site=None, zone=None,
                            image_size=(400, 400))
    assert os.path.exists(out) and os.path.getsize(out) > 0
    # ambiguous: two sites, no explicit key
    two = {"S1": roi["Site A"], "S2": roi["Site A"]}
    with pytest.raises(ValueError, match="S1"):
        plot_lane_roi_map(two, str(tmp_path), site=None, zone=None)
    out2 = plot_lane_roi_map(two, str(tmp_path), site="S2", zone=None,
                             image_size=(400, 400), name="s2.png")
    assert os.path.exists(out2)


def test_vendored_site_c_table_golden(tmp_path):
    """The vendored Site-C table (package data, ref scripts/graph.py:7-216)
    carries the reference's exact 7 polygons — golden-pinned point counts
    plus spot coordinates — and renders with zero flags (the graph.py CLI's
    default path)."""
    from tsue_tpu.data.schema import load_vendored_lane_roi
    from tsue_tpu.viz import plot_lane_roi_map

    roi = load_vendored_lane_roi()
    assert set(roi) == {"Site C"}
    assert set(roi["Site C"]) == {"A"}
    lanes = roi["Site C"]["A"]
    assert {k: len(v) for k, v in lanes.items()} == {
        "1": 33, "2": 32, "3": 22, "4": 36, "5": 39, "6": 14, "safe": 14}
    # spot values straight from the reference table
    np.testing.assert_allclose(lanes["1"][0], [0.0, 962.3529411764706])
    np.testing.assert_allclose(lanes["safe"][-1],
                               [2853.75191424196, 1118.9739663093414])
    out = plot_lane_roi_map(roi, str(tmp_path))  # default Site C / A keys
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_synthetic_roi_passes_validation(tmp_path):
    """The parametric fixture is itself a valid table in the same schema."""
    roi = make_synthetic_lane_roi()
    jp = tmp_path / "syn.json"
    jp.write_text(json.dumps(roi))
    assert set(load_lane_roi(str(jp))["Site C"]["A"]) >= {"1", "safe"}
