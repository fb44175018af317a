"""Top-level TSUE trajectory model.

Parity with ref scripts/train.py:847-964 (``MultiModalTrajectoryModel``):
lane polygon encoder + (optional) multimodal LLM hidden states + LTSF
forecaster + last-input-position residual.

The denormalized-MSE loss lives in ``tsue_tpu.train.losses`` as a pure
function (the reference computes it inside ``forward``, ref :945-961).

Ablation matrix:
- ``use_llm=False``  -> no-LLM ablation (ref scripts/ablation_study.py:455-530)
- ``use_vision=False``-> dummy-text/no-vision ablation handled in the fusion
  module (ref modify_scripts/modify_train2.py:645-759)
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.config import ModelConfig
from tsue_tpu.models.lane_encoder import LanePolygonEncoder
from tsue_tpu.models.ltsf import TransformerLTSF


class TrajectoryModel(nn.Module):
    cfg: ModelConfig
    seq_len: int
    out_len: int

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True):
        """batch: dict with traj_in (B,2,T), polygon (B,P,2), polygon_len (B,)
        and, when use_llm, vision (B,T,Dv) + input_ids/attention_mask (B,L).
        Returns pred (B,2,out_len) in normalized coords."""
        cfg = self.cfg
        x = batch["traj_in"]

        poly_emb = LanePolygonEncoder(
            d_model=cfg.lane.d_model, num_heads=cfg.lane.nhead,
            num_layers=cfg.lane.num_layers, max_points=cfg.lane.max_points,
            dropout=cfg.lane.dropout, name="lane_encoder")(
            batch["polygon"], batch["polygon_len"], deterministic)

        final_hidden = None
        hidden_mask = None
        cross_dim = cfg.llama.hidden_size
        if cfg.use_llm:
            from tsue_tpu.models.fusion import MultiModalLLM
            final_hidden, hidden_mask = MultiModalLLM(
                llama=cfg.llama, qformer=cfg.qformer,
                use_vision=cfg.use_vision, name="mllm")(
                vision=batch["vision"],
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                deterministic=deterministic)

        pred = TransformerLTSF(
            seq_len=self.seq_len, out_len=self.out_len,
            d_model=cfg.ltsf.d_model, individual=cfg.ltsf.individual,
            feature_size=cfg.ltsf.feature_size,
            polygon_embed_dim=cfg.lane.d_model,
            use_post_mlp=cfg.ltsf.use_post_mlp,
            post_mlp_hidden_dim=cfg.ltsf.post_mlp_hidden_dim,
            nhead=cfg.ltsf.nhead, dropout=cfg.ltsf.dropout,
            cross_dim=cross_dim, cross_nhead=cfg.ltsf.cross_nhead,
            use_cross_attn=cfg.use_llm, name="ltsf")(
            x, poly_emb, final_hidden, hidden_mask, deterministic)

        # last-input-position residual over the horizon (ref :941-943)
        last = x[:, :, -1:]
        return pred + last
