"""Lane polygon geometry encoder.

Capability parity with ref scripts/train.py:352-383 (``LanePolygonEncoder``):
Linear(2->d) + learned positional embedding + N post-LN encoder blocks with
key-padding mask + masked mean-pool -> (B, d) embedding; zero vector for
empty polygons.

TPU-first deltas: the per-sample Python loops building the pad mask and the
mean pool (ref :367-380) become vectorized mask arithmetic — no host loops,
fully batched under jit.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.models.layers import EncoderBlock


class LanePolygonEncoder(nn.Module):
    d_model: int = 64
    num_heads: int = 4
    num_layers: int = 2
    max_points: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, polygon, polygon_len, deterministic=True):
        """polygon: (B, P, 2) raw pixel coords; polygon_len: (B,) int."""
        B, P, _ = polygon.shape
        x = nn.Dense(self.d_model, name="input_proj")(polygon)
        pos = self.param("pos_embedding", nn.initializers.zeros,
                         (1, self.max_points, self.d_model))
        x = x + pos[:, :P, :]
        valid = (jnp.arange(P)[None, :] < polygon_len[:, None])  # (B, P)
        for i in range(self.num_layers):
            x = EncoderBlock(self.d_model, self.num_heads,
                             dropout=self.dropout, name=f"block_{i}")(
                x, key_mask=valid, deterministic=deterministic)
        w = valid[..., None].astype(x.dtype)
        denom = jnp.maximum(w.sum(axis=1), 1.0)
        pooled = (x * w).sum(axis=1) / denom
        # empty polygon -> zero embedding (ref :377-379)
        return jnp.where((polygon_len > 0)[:, None], pooled, 0.0)
