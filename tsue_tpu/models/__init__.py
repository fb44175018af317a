from tsue_tpu.models.lane_encoder import LanePolygonEncoder
from tsue_tpu.models.ltsf import (
    SelfAttentionBlock, NLinearEncoder, NLinearDecoder, TransformerLTSF)
from tsue_tpu.models.tsue import TrajectoryModel
