"""Top-level TSUE trajectory model.

Parity with ref scripts/train.py:847-964 (``MultiModalTrajectoryModel``):
lane polygon encoder + (optional) multimodal LLM hidden states + LTSF
forecaster + last-input-position residual.

The forward is split into two stages that ``__call__`` composes:
- ``encode_context``: lane embedding + MLLM final hidden states — the
  expensive, deterministic-at-eval part;
- ``forecast``: the LTSF forecaster whose dropout drives MC-candidate
  diversity.
K-candidate evaluation vmaps only ``forecast`` over dropout keys ("fast"
mode), computing the LLM hidden once per batch instead of the reference's
K sequential full forwards (ref scripts/test.py:1327-1339); strict-parity
mode still vmaps the whole model.

The denormalized-MSE loss lives in ``tsue_tpu.train.losses`` as a pure
function (the reference computes it inside ``forward``, ref :945-961).

Ablation matrix:
- ``use_llm=False``   -> no-LLM ablation (ref scripts/ablation_study.py:455-530)
- ``use_vision=False`` -> dummy-text/no-vision ablation handled in the
  fusion module (ref modify_scripts/modify_train2.py:645-759)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.config import ModelConfig
from tsue_tpu.models.lane_encoder import LanePolygonEncoder
from tsue_tpu.models.ltsf import TransformerLTSF


class TrajectoryModel(nn.Module):
    cfg: ModelConfig
    seq_len: int
    out_len: int

    def setup(self):
        cfg = self.cfg
        self.lane_encoder = LanePolygonEncoder(
            d_model=cfg.lane.d_model, num_heads=cfg.lane.nhead,
            num_layers=cfg.lane.num_layers, max_points=cfg.lane.max_points,
            dropout=cfg.lane.dropout, name="lane_encoder")
        if cfg.use_llm:
            from tsue_tpu.models.fusion import MultiModalLLM
            import jax.numpy as jnp_
            dtype = jnp_.bfloat16 if cfg.dtype == "bfloat16" else jnp_.float32
            self.mllm = MultiModalLLM(
                llama=cfg.llama, qformer=cfg.qformer,
                use_vision=cfg.use_vision, dtype=dtype, name="mllm")
        self.ltsf = TransformerLTSF(
            seq_len=self.seq_len, out_len=self.out_len,
            d_model=cfg.ltsf.d_model, individual=cfg.ltsf.individual,
            feature_size=cfg.ltsf.feature_size,
            polygon_embed_dim=cfg.lane.d_model,
            use_post_mlp=cfg.ltsf.use_post_mlp,
            post_mlp_hidden_dim=cfg.ltsf.post_mlp_hidden_dim,
            nhead=cfg.ltsf.nhead, dropout=cfg.ltsf.dropout,
            cross_dim=cfg.llama.hidden_size, cross_nhead=cfg.ltsf.cross_nhead,
            use_cross_attn=cfg.use_llm, name="ltsf")

    def encode_context(self, batch: dict, deterministic: bool = True,
                       stop_llm_grad: bool = False):
        """(final_hidden, hidden_mask, poly_emb) — the per-batch context.

        ``stop_llm_grad=True`` severs the gradient at the MLLM output: in
        the frozen-MLLM regime (ref scripts/train.py:1141-1142) the
        reference still backprops through the 1B Llama and throws the
        grads away (hence DDP find_unused_parameters); stopping here skips
        that entire backward — pure training-throughput win at identical
        updates (tested).
        """
        poly_emb = self.lane_encoder(batch["polygon"], batch["polygon_len"],
                                     deterministic)
        final_hidden, hidden_mask = None, None
        if self.cfg.use_llm:
            final_hidden, hidden_mask = self.mllm(
                vision=batch.get("vision") if self.cfg.use_vision else None,
                input_ids=batch["input_ids"],
                attention_mask=batch["attention_mask"],
                deterministic=deterministic)
            if stop_llm_grad:
                final_hidden = jax.lax.stop_gradient(final_hidden)
        return final_hidden, hidden_mask, poly_emb

    def encode_context_kv(self, batch: dict, deterministic: bool = True):
        """Fast-eval context with PREPROJECTED cross-attention K/V.

        Returns (cross_kv, hidden_mask, poly_emb): the deterministic
        hidden states are projected through the decoder's cross-attention
        K/V heads once per batch, so vmapped candidates skip those
        (544, 2048)x(2048, 2048) matmuls entirely.
        """
        final_hidden, hidden_mask, poly_emb = self.encode_context(
            batch, deterministic)
        cross_kv = None
        if final_hidden is not None:
            cross_kv = self.ltsf.project_cross_kv(final_hidden)
        return cross_kv, hidden_mask, poly_emb

    def forecast_kv(self, batch: dict, cross_kv, hidden_mask, poly_emb,
                    deterministic: bool = True):
        """Forecast from a preprojected context (fast K-candidate eval)."""
        x = batch["traj_in"]
        pred = self.ltsf(x, poly_emb, None, hidden_mask, deterministic,
                         cross_kv=cross_kv)
        return pred + x[:, :, -1:]

    def forecast(self, batch: dict, final_hidden, hidden_mask, poly_emb,
                 deterministic: bool = True):
        """LTSF decode + last-input-position residual (ref :941-943)."""
        x = batch["traj_in"]
        pred = self.ltsf(x, poly_emb, final_hidden, hidden_mask,
                         deterministic)
        return pred + x[:, :, -1:]

    def __call__(self, batch: dict, deterministic: bool = True,
                 stop_llm_grad: bool = False):
        """batch -> pred (B, 2, out_len) in normalized coords."""
        final_hidden, hidden_mask, poly_emb = self.encode_context(
            batch, deterministic, stop_llm_grad)
        return self.forecast(batch, final_hidden, hidden_mask, poly_emb,
                             deterministic)
