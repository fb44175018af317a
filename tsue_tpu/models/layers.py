"""Shared transformer building blocks (Flax linen).

Post-LN encoder/decoder blocks matching torch ``nn.TransformerEncoderLayer``/
``DecoderLayer`` semantics as instantiated by the reference (norm_first=False,
ReLU FFN, and torch's default ``dim_feedforward=2048`` regardless of d_model —
the reference never overrides it, e.g. ref scripts/train.py:358,403).  All
attention goes through ``tsue_tpu.ops.dot_product_attention`` so the Pallas
flash kernel swaps in at one place.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.ops.attention import dot_product_attention


class MHA(nn.Module):
    """Multi-head attention.

    ``project_kv``/``attend`` expose the K/V projection separately so
    deterministic memories (e.g. frozen-LLM hidden states) can be projected
    ONCE per batch instead of once per vmapped candidate (fast K-candidate
    eval).  Param names (q/k/v/o) are stable — the torch importer and
    checkpoints depend on them.
    """
    d_model: int
    num_heads: int
    dropout: float = 0.0

    def setup(self):
        H = self.num_heads
        Dh = self.d_model // H
        self.q_proj = nn.DenseGeneral((H, Dh), name="q")
        self.k_proj = nn.DenseGeneral((H, Dh), name="k")
        self.v_proj = nn.DenseGeneral((H, Dh), name="v")
        self.o_proj = nn.DenseGeneral(self.d_model, axis=(-2, -1), name="o")
        self.drop = nn.Dropout(self.dropout)

    def project_kv(self, kv_in):
        return self.k_proj(kv_in), self.v_proj(kv_in)

    def attend(self, q_in, k, v, mask=None, is_causal=False,
               deterministic=True):
        q = self.q_proj(q_in)
        # torch nn.MultiheadAttention(dropout=p) drops the softmax PROBS;
        # the surrounding torch TransformerEncoder/DecoderLayer additionally
        # drops the attention OUTPUT (dropout1/dropout2) — self.drop below.
        rng = (self.make_rng("dropout")
               if not deterministic and self.dropout > 0.0 else None)
        out = dot_product_attention(q, k, v, mask=mask, is_causal=is_causal,
                                    dropout_rate=self.dropout,
                                    dropout_rng=rng)
        out = self.o_proj(out)
        return self.drop(out, deterministic=deterministic)

    def __call__(self, q_in, kv_in, mask=None, is_causal=False,
                 deterministic=True):
        k, v = self.project_kv(kv_in)
        return self.attend(q_in, k, v, mask, is_causal, deterministic)


class FFN(nn.Module):
    d_model: int
    dim_ff: int
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.dim_ff)(x)
        h = nn.relu(h) if self.activation == "relu" else nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model)(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class EncoderBlock(nn.Module):
    """Post-LN transformer encoder block (torch TransformerEncoderLayer)."""
    d_model: int
    num_heads: int
    dim_ff: Optional[int] = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic=True):
        dim_ff = self.dim_ff or 2048  # torch nn.Transformer*Layer default
        attn = MHA(self.d_model, self.num_heads, self.dropout)(
            x, x, mask=key_mask, deterministic=deterministic)
        x = nn.LayerNorm()(x + attn)
        ff = FFN(self.d_model, dim_ff, self.dropout)(
            x, deterministic=deterministic)
        return nn.LayerNorm()(x + ff)


class DecoderBlock(nn.Module):
    """Post-LN transformer decoder block with self + cross attention."""
    d_model: int
    num_heads: int
    dim_ff: Optional[int] = None
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, memory, memory_mask=None, deterministic=True):
        dim_ff = self.dim_ff or 2048  # torch nn.Transformer*Layer default
        sa = MHA(self.d_model, self.num_heads, self.dropout, name="self_attn")(
            x, x, deterministic=deterministic)
        x = nn.LayerNorm()(x + sa)
        ca = MHA(self.d_model, self.num_heads, self.dropout, name="cross_attn")(
            x, memory, mask=memory_mask, deterministic=deterministic)
        x = nn.LayerNorm()(x + ca)
        ff = FFN(self.d_model, dim_ff, self.dropout)(
            x, deterministic=deterministic)
        return nn.LayerNorm()(x + ff)
