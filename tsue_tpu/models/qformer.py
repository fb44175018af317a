"""BLIP-2-style Q-Former: compress per-frame vision embeddings to query tokens.

Parity with ref scripts/train.py:388-414 (``BlipQFormer``): Dense vision
projection -> N-layer encoder over the frame axis -> learned query tokens
cross-attending via an N-layer decoder -> (B, num_query_tokens, hidden).
Encoder/decoder depth 4+4 canonical, 2+2 in the joint variants
(ref scripts/im_kim_train_GRN.py:427-428).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.config import QFormerConfig
from tsue_tpu.models.layers import DecoderBlock, EncoderBlock


class QFormer(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(self, vision_embs, deterministic=True):
        """vision_embs: (B, Tv, vision_dim) -> (B, Q, hidden)."""
        c = self.cfg
        B = vision_embs.shape[0]
        x = nn.Dense(c.hidden_size, name="vision_proj")(vision_embs)
        for i in range(c.num_encoder_layers):
            x = EncoderBlock(c.hidden_size, c.num_heads, dropout=c.dropout,
                             name=f"enc_{i}")(x, deterministic=deterministic)
        query = self.param("query_tokens", nn.initializers.normal(1.0),
                           (c.num_query_tokens, c.hidden_size))
        q = jnp.broadcast_to(query[None], (B,) + query.shape)
        for i in range(c.num_decoder_layers):
            q = DecoderBlock(c.hidden_size, c.num_heads, dropout=c.dropout,
                             name=f"dec_{i}")(q, x, deterministic=deterministic)
        return q
