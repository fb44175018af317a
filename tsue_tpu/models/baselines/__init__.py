"""Baseline trajectory models (SURVEY.md §2.4 B1-B7).

All share the framework batch dict and the denormalized-MSE loss; each is a
Flax module with ``__call__(batch, deterministic=True, ...) -> (B, 2, T_out)``
except the parameter-free constant-velocity predictor (a pure function).
"""
from tsue_tpu.models.baselines.cv import cv_candidates
from tsue_tpu.models.baselines.lstm import CSLSTM, SocialLSTM
from tsue_tpu.models.baselines.stgcnn import SocialSTGCNN
from tsue_tpu.models.baselines.trajectron import TrajectronPP
from tsue_tpu.models.baselines.mmtrans import MMTrans
from tsue_tpu.models.baselines.gail import GAILGenerator, GAILDiscriminator

BASELINE_REGISTRY = {
    "cs_lstm": CSLSTM,
    "social_lstm": SocialLSTM,
    "stgcnn": SocialSTGCNN,
    "trajectron": TrajectronPP,
    "mmtrans": MMTrans,
}
