"""LTSF-NLinear + self-attention trajectory forecaster.

Capability parity with ref scripts/train.py:659-842 (SelfAttentionBlock,
LTSF_NLinearEncoder, LTSF_NLinearDecoder, TransformerLTSF), redesigned for
the MXU:

- the reference's ``individual=True`` per-channel Linear is a Python loop of
  64 tiny (T,T) matmuls (ref :703-709); here it is ONE batched einsum
  ``bct,cto->bco`` over a (C, T_in, T_out) weight — a single MXU-friendly
  contraction (and the target of the fused Pallas NLinear kernel);
- channel-time layout stays (B, C, T) at the interface for parity, with
  (B, T, C) used internally where attention wants time-major.

Reference quirks preserved deliberately:
- SelfAttentionBlock's first residual adds the *normalized* input
  (ref :677-681: ``res1 = x_norm + attn_out``), not the raw input;
- the post-MLP REPLACES the decoded signal rather than adding to it
  (ref :787-791);
- cross-attention fusion adds to the pre-MLP/lane-adjusted decode via
  ``fused = dec_t + cross_to_d`` then LN+MLP fusion (ref :793-801).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.models.layers import MHA


def _per_channel_linear_init(key, shape, dtype=jnp.float32):
    # torch nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); fan_in = T_in
    import jax
    bound = shape[-2] ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class PerChannelLinear(nn.Module):
    """Independent Linear(T_in -> T_out) per channel, as one einsum."""
    channels: int
    t_in: int
    t_out: int

    @nn.compact
    def __call__(self, x):  # (B, C, T_in)
        w = self.param("kernel", _per_channel_linear_init,
                       (self.channels, self.t_in, self.t_out))
        b = self.param("bias", nn.initializers.zeros,
                       (self.channels, self.t_out))
        return jnp.einsum("bct,cto->bco", x, w,
                          preferred_element_type=jnp.float32) + b


class SelfAttentionBlock(nn.Module):
    """Pre-LN MHA + FFN over (B, C, T); parity with ref train.py:659-686."""
    d_model: int
    num_heads: int = 1
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):  # (B, C, T)
        h = jnp.swapaxes(x, 1, 2)               # (B, T, C=d_model)
        h_norm = nn.LayerNorm(name="norm1")(h)
        attn = MHA(self.d_model, self.num_heads, self.dropout, name="mha")(
            h_norm, h_norm, deterministic=deterministic)
        res1 = h_norm + attn                    # ref quirk: residual off x_norm
        res1n = nn.LayerNorm(name="norm2")(res1)
        ff = nn.Dense(self.d_model * 4, name="ffn1")(res1n)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="ffn2")(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        out = res1n + ff
        return jnp.swapaxes(out, 1, 2)          # (B, C, T)


class NLinearEncoder(nn.Module):
    """NLinear: subtract last step, per-channel Linear(T->T), add back."""
    window_size: int
    d_model: int
    individual: bool = True

    @nn.compact
    def __call__(self, x):  # (B, C, T)
        last = x[:, :, -1:]
        x_sub = x - last
        if self.individual:
            enc = PerChannelLinear(self.d_model, self.window_size,
                                   self.window_size, name="linears")(x_sub)
        else:
            enc = nn.Dense(self.window_size, name="linear")(x_sub)
        return enc + last


class NLinearDecoder(nn.Module):
    """NLinear decode T_in->T_out + lane bias + post-MLP + cross-attn fusion.

    Parity with ref scripts/train.py:718-806; ``use_cross_attn=False`` gives
    the no-LLM ablation decoder (ref scripts/ablation_study.py:357-421).
    """
    window_size: int
    forecast_size: int
    d_model: int
    individual: bool = True
    polygon_embed_dim: int = 64
    use_post_mlp: bool = True
    post_mlp_hidden_dim: int = 64
    dropout: float = 0.1
    cross_dim: int = 2048
    cross_nhead: int = 2
    output_feature_dim: int = 2
    use_cross_attn: bool = True

    def setup(self):
        C = self.d_model
        if self.individual:
            self.linears = PerChannelLinear(C, self.window_size,
                                            self.forecast_size,
                                            name="linears")
        else:
            self.linear = nn.Dense(self.forecast_size, name="linear")
        self.lane_fc = nn.Dense(C * self.forecast_size, name="lane_fc")
        if self.use_post_mlp:
            self.post_mlp1 = nn.Dense(self.post_mlp_hidden_dim,
                                      name="post_mlp1")
            self.post_mlp2 = nn.Dense(C * self.forecast_size,
                                      name="post_mlp2")
            self.post_drop = nn.Dropout(self.dropout)
        if self.use_cross_attn:
            self.dec_proj = nn.Dense(self.cross_dim, name="dec_proj")
            self.cross_attn = MHA(self.cross_dim, self.cross_nhead,
                                  self.dropout, name="cross_attn")
            self.dec_unproj = nn.Dense(C, name="dec_unproj")
        self.fusion_ln = nn.LayerNorm(name="fusion_ln")
        self.fusion_fc1 = nn.Dense(C, name="fusion_fc1")
        self.fusion_fc2 = nn.Dense(C, name="fusion_fc2")
        self.out_proj = nn.Dense(self.output_feature_dim, name="out_proj")

    def project_cross_kv(self, final_hidden):
        """Precompute cross-attention K/V of a (deterministic) memory."""
        return self.cross_attn.project_kv(final_hidden)

    def __call__(self, encoded, lane_polygon_emb,
                 final_hidden: Optional[jnp.ndarray] = None,
                 hidden_mask: Optional[jnp.ndarray] = None,
                 deterministic=True, cross_kv=None):
        B, C, T = encoded.shape
        F = self.forecast_size
        last = encoded[:, :, -1:]
        x_sub = encoded - last
        if self.individual:
            decoded = self.linears(x_sub)
        else:
            decoded = self.linear(x_sub)
        decoded = decoded + last                       # broadcast over F

        lane_adj = self.lane_fc(lane_polygon_emb)
        decoded = decoded + lane_adj.reshape(B, C, F)

        if self.use_post_mlp:
            flat = decoded.reshape(B, C * F)
            h = nn.relu(self.post_mlp1(flat))
            h = self.post_drop(h, deterministic=deterministic)
            decoded = self.post_mlp2(h).reshape(B, C, F)  # REPLACES (ref :787-791)

        dec_t = jnp.swapaxes(decoded, 1, 2)            # (B, F, C)
        if self.use_cross_attn and (final_hidden is not None
                                    or cross_kv is not None):
            q = self.dec_proj(dec_t)
            if cross_kv is None:
                cross_kv = self.cross_attn.project_kv(final_hidden)
            ca = self.cross_attn.attend(q, cross_kv[0], cross_kv[1],
                                        mask=hidden_mask,
                                        deterministic=deterministic)
            fused = dec_t + self.dec_unproj(ca)
        else:
            fused = dec_t
        h = self.fusion_ln(fused)
        h = nn.relu(self.fusion_fc1(h))
        h = self.fusion_fc2(h)
        out = self.out_proj(h)                          # (B, F, 2)
        return jnp.swapaxes(out, 1, 2)                  # (B, 2, F)


class TransformerLTSF(nn.Module):
    """Token conv -> NLinear enc -> +pos -> self-attn -> NLinear decoder.

    Parity with ref scripts/train.py:808-842.
    """
    seq_len: int
    out_len: int
    d_model: int = 64
    individual: bool = True
    feature_size: int = 2
    polygon_embed_dim: int = 64
    use_post_mlp: bool = True
    post_mlp_hidden_dim: int = 64
    nhead: int = 1
    dropout: float = 0.1
    cross_dim: int = 2048
    cross_nhead: int = 2
    use_cross_attn: bool = True

    def setup(self):
        self.token_proj = nn.Dense(self.d_model, name="token_proj")
        self.nlinear_encoder = NLinearEncoder(
            self.seq_len, self.d_model, self.individual,
            name="nlinear_encoder")
        self.pos_encoding = self.param(
            "pos_encoding", nn.initializers.zeros,
            (1, self.d_model, self.seq_len))
        self.attn_block = SelfAttentionBlock(
            self.d_model, self.nhead, self.dropout, name="attn_block")
        self.decoder = NLinearDecoder(
            self.seq_len, self.out_len, self.d_model,
            individual=self.individual,
            polygon_embed_dim=self.polygon_embed_dim,
            use_post_mlp=self.use_post_mlp,
            post_mlp_hidden_dim=self.post_mlp_hidden_dim,
            dropout=self.dropout, cross_dim=self.cross_dim,
            cross_nhead=self.cross_nhead,
            output_feature_dim=self.feature_size,
            use_cross_attn=self.use_cross_attn, name="decoder")

    def project_cross_kv(self, final_hidden):
        return self.decoder.project_cross_kv(final_hidden)

    def __call__(self, x, lane_polygon_emb, final_hidden=None,
                 hidden_mask=None, deterministic=True, cross_kv=None):
        # token_proj: Conv1d(feature,d,k=1) == Dense over the channel axis
        h = jnp.swapaxes(x, 1, 2)                      # (B, T, feature)
        h = self.token_proj(h)
        h = jnp.swapaxes(h, 1, 2)                      # (B, d, T)
        h = self.nlinear_encoder(h)
        h = h + self.pos_encoding[:, :, :h.shape[2]]
        h = self.attn_block(h, deterministic)
        return self.decoder(h, lane_polygon_emb, final_hidden, hidden_mask,
                            deterministic, cross_kv)
