"""Render the lane-ROI polygon map — mirrors ref scripts/graph.py.

Reads the ROI from a --roi table, a pickle track file (--data), or the
synthetic parametric map.
"""
from _common import add_roi_args, base_parser, finish, resolve_roi


def main():
    p = base_parser(__doc__)
    p.add_argument("--out", default="lane_roi_map.png")
    add_roi_args(p)
    args = p.parse_args()
    from tsue_tpu.viz import plot_lane_roi_map
    path = plot_lane_roi_map(resolve_roi(args), args.out_dir, site=args.site,
                             zone=args.zone, name=args.out)
    finish({"map": path})


if __name__ == "__main__":
    main()
