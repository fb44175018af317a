from tsue_tpu.viz.plots import (
    plot_one_sample, plot_candidates, plot_best_of_k, plot_xy_time,
    plot_lane_roi_map, plot_trajectories_over_map)
