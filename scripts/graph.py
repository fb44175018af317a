"""Render the lane-ROI polygon map — mirrors ref scripts/graph.py.

Reads the ROI either from a pickle track file (--data) or generates the
synthetic parametric map.
"""
from _common import base_parser, finish


def main():
    p = base_parser(__doc__)
    p.add_argument("--out", default="lane_roi_map.png")
    p.add_argument("--roi", default=None,
                   help="lane-ROI table: reference graph.py-format .py, "
                        ".json, or .pkl (overrides --data)")
    p.add_argument("--site", default=None,
                   help="site key in the ROI table (default: auto when the "
                        "table has exactly one site, else an error listing "
                        "the available keys)")
    p.add_argument("--zone", default=None, help="zone key (same defaulting)")
    args = p.parse_args()
    from tsue_tpu.data.schema import (load_lane_roi, load_tracks,
                                      make_synthetic_lane_roi)
    from tsue_tpu.viz import plot_lane_roi_map
    if args.roi:
        roi = load_lane_roi(args.roi)
    elif args.data:
        roi = load_tracks(args.data)[0]["lane_roi"]
    else:
        roi = make_synthetic_lane_roi()
    path = plot_lane_roi_map(roi, args.out_dir, site=args.site,
                             zone=args.zone, name=args.out)
    finish({"map": path})


if __name__ == "__main__":
    main()
