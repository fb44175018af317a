from tsue_tpu.utils.logging import MetricLogger, seed_everything
