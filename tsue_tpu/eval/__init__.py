from tsue_tpu.eval.metrics import ade_fde, min_ade_fde_rmse, candidate_rollout
