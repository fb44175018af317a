"""Multimodal fusion: Q-Former image tokens + text embeddings -> Llama.

Parity with ref scripts/train.py:459-575 (``LlamaMultiModal``): image tokens
projected to the LLM width, plus learned vision/text modality embeddings,
input-level concat [img || text], extended attention mask, labels prefixed
with -100 over the image span, Llama forward returning last hidden states.

Deltas by design:
- the LM loss is only computed when asked (stage 1); stage 2 skips the
  vocab matmul entirely (the reference computes and discards it,
  ref scripts/train.py:547-554);
- cross-attention consumers receive the fused validity mask; the reference
  attends over pad positions (no key_padding_mask at ref :793-798) but pads
  only to the per-batch max — with our static 512-token padding, masking is
  the behavior-preserving choice;
- ``use_vision=False`` reproduces the no-vision/dummy-text ablation
  (ref modify_scripts/modify_train2.py:645-759) by feeding text only.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tsue_tpu.config import LlamaConfig, QFormerConfig
from tsue_tpu.models.llama import LlamaForCausalLM, causal_lm_loss
from tsue_tpu.models.qformer import QFormer

IGNORE_LABEL = -100


class MultiModalLLM(nn.Module):
    llama: LlamaConfig
    qformer: QFormerConfig
    use_vision: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.use_vision:
            self.qformer_mod = QFormer(self.qformer, name="qformer")
            if self.qformer.hidden_size != self.llama.hidden_size:
                self.q_proj = nn.Dense(self.llama.hidden_size, name="q_proj")
            else:
                self.q_proj = lambda x: x
            self.vision_modality_embedding = self.param(
                "vision_modality_embedding", nn.initializers.normal(1.0),
                (1, 1, self.llama.hidden_size))
        self.text_modality_embedding = self.param(
            "text_modality_embedding", nn.initializers.normal(1.0),
            (1, 1, self.llama.hidden_size))
        self.llama_mod = LlamaForCausalLM(self.llama, self.dtype, name="llama")

    def image_tokens(self, vision, deterministic=True):
        toks = self.qformer_mod(vision, deterministic)
        toks = self.q_proj(toks)
        return toks + self.vision_modality_embedding

    def fuse(self, vision, input_ids, attention_mask, deterministic=True):
        """Build fused embeddings/mask; returns (embeds, mask, n_img)."""
        text_embeds = self.llama_mod.embed(input_ids)
        text_embeds = text_embeds + self.text_modality_embedding
        if self.use_vision and vision is not None:
            img = self.image_tokens(vision, deterministic)
            n_img = img.shape[1]
            fused = jnp.concatenate([img.astype(text_embeds.dtype),
                                     text_embeds], axis=1)
            img_mask = jnp.ones((fused.shape[0], n_img),
                                attention_mask.dtype)
            mask = jnp.concatenate([img_mask, attention_mask], axis=1)
        else:
            fused, mask, n_img = text_embeds, attention_mask, 0
        return fused, mask, n_img

    def __call__(self, vision, input_ids, attention_mask,
                 deterministic=True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Stage-2 path: returns (final_hidden (B, n_img+L, D), fused_mask)."""
        fused, mask, _ = self.fuse(vision, input_ids, attention_mask,
                                   deterministic)
        out = self.llama_mod(fused, mask, deterministic=deterministic)
        return out["hidden"], mask

    # ------------------------------------------------------------------
    # Generation support (soft-prefix prefill + cached decode)
    # ------------------------------------------------------------------

    def prefill(self, vision, prompt_ids, prompt_mask, cache_len: int,
                deterministic=True):
        """Prefill the KV cache with the fused [img || prompt] prefix.

        The reference achieves soft-prefix generation by monkey-patching the
        LLM's input embedding module (ref scripts/train.py:606-623); here the
        prefix is simply embedding-level input to the decode stack.

        Returns (caches, last_hidden (B, D), prefix_valid_len (B,),
        fused_mask (B, P)).  ``cache_len`` is the total cache size
        (P + max_new_tokens).
        """
        import jax
        fused, fmask, n_img = self.fuse(vision, prompt_ids, prompt_mask,
                                        deterministic)
        B, P, D = fused.shape
        positions = jnp.maximum(jnp.cumsum(fmask, axis=1) - 1, 0)
        c = self.llama
        shape = (B, cache_len, c.num_kv_heads, c.head_dim)
        caches = [(jnp.zeros(shape, fused.dtype),
                   jnp.zeros(shape, fused.dtype))
                  for _ in range(c.num_layers)]
        # (B, 1, P, cache_len) mask: within-prefix causal AND key validity
        q_idx = jnp.arange(P)[:, None]
        k_idx = jnp.arange(cache_len)[None, :]
        causal = k_idx <= q_idx                          # (P, cache_len)
        fmask_cache = jnp.pad(fmask, ((0, 0), (0, cache_len - P)))
        key_valid = fmask_cache[:, None, :] > 0          # (B, 1, cache_len)
        mask = (causal[None] & key_valid)[:, None]       # (B, 1, P, cache_len)
        hidden, caches = self.llama_mod.model(
            fused, None, positions, deterministic, caches, 0, mask)
        valid_len = fmask.sum(axis=1)                    # (B,)
        last_hidden = jnp.take_along_axis(
            hidden, (valid_len - 1)[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        return caches, last_hidden, valid_len.astype(jnp.int32), fmask

    def decode_step(self, token, step_index, prefix_len, caches, fused_mask,
                    cache_len: int, deterministic=True):
        """One cached decode step.

        token (B,) int32; step_index scalar int32 (0-based decode step) OR
        (B,) int32 per-row steps (continuous batching: every slot advances
        on its own clock, serve_batching.py); prefix_len (B,) valid prefix
        lengths.  Generated tokens use the raw embedding WITHOUT the text
        modality embedding — matching the reference's patched-embedding
        behavior for new tokens (ref scripts/train.py:612-619).
        Returns (logits (B, V), new_caches).
        """
        hidden, caches = self.decode_hidden(
            token, step_index, prefix_len, caches, fused_mask, cache_len,
            deterministic)
        logits = self.llama_mod.logits_from_hidden(hidden, quant_ok=True)
        return logits, caches

    def decode_hidden(self, token, step_index, prefix_len, caches,
                      fused_mask, cache_len: int, deterministic=True):
        """``decode_step`` WITHOUT the LM head: returns (hidden (B, D),
        new_caches) for the fused LM-head+top-k sampler
        (ops/lmhead_topk.py), which streams the head weight itself and
        never materializes the (B, V) logits."""
        B = token.shape[0]
        P = fused_mask.shape[1]
        emb = self.llama_mod.embed(token[:, None])       # (B, 1, D)
        pos = (prefix_len + step_index)[:, None]         # (B, 1)
        slot = P + step_index                # cache write index, scalar|(B,)
        k_idx = jnp.arange(cache_len)[None, :]
        fmask_cache = jnp.pad(fused_mask, ((0, 0), (0, cache_len - P)))
        upper = slot[:, None] if getattr(slot, "ndim", 0) == 1 else slot
        kv_mask = ((k_idx < P) & (fmask_cache > 0)) | \
                  ((k_idx >= P) & (k_idx <= upper))      # (B, cache_len)
        hidden, caches = self.llama_mod.model(
            emb, None, pos, deterministic, caches, slot, kv_mask,
            quant_ok=True)
        return hidden[:, 0], caches

    def decode_window(self, tokens, step_index, prefix_len, caches,
                      fused_mask, cache_len: int, deterministic=True):
        """Cached decode over a W-token window (speculative decoding).

        tokens (B, W) int32 at per-row decode steps step_index..+W-1
        (step_index (B,) int32); the W queries attend causally within the
        window and to the row's valid cache.  Returns
        (logits (B, W, V), new_caches) — logits[:, j] conditions on the
        window prefix tokens[:, :j+1], so one forward scores every draft
        position (the weight stream is read once for all W rows, which is
        the entire speculative win; see eval/speculative.py).
        W=1 with squeezed logits is exactly ``decode_step``.
        """
        B, W = tokens.shape
        P = fused_mask.shape[1]
        emb = self.llama_mod.embed(tokens)               # (B, W, D)
        offs = jnp.arange(W)[None, :]
        pos = prefix_len[:, None] + step_index[:, None] + offs   # (B, W)
        slot = P + step_index                            # (B,) first write
        k_idx = jnp.arange(cache_len)[None, None, :]
        fmask_cache = jnp.pad(fused_mask, ((0, 0), (0, cache_len - P)))
        # query j of row b sees: the valid prefix, plus decode slots
        # P..slot[b]+j (its own slot inclusive — in-window causality)
        upper = (slot[:, None] + offs)[..., None]        # (B, W, 1)
        kv_mask = ((k_idx < P) & (fmask_cache[:, None, :] > 0)) | \
                  ((k_idx >= P) & (k_idx <= upper))      # (B, W, cache_len)
        hidden, caches = self.llama_mod.model(
            emb, None, pos, deterministic, caches, slot,
            kv_mask[:, None],                            # (B,1,W,cache_len)
            quant_ok=True)
        logits = self.llama_mod.logits_from_hidden(hidden, quant_ok=True)
        return logits, caches

    def lm_loss(self, vision, input_ids, attention_mask, labels,
                deterministic=True) -> jnp.ndarray:
        """Stage-1 path: causal LM loss over the fused sequence with -100
        prepended across the image-token span (ref scripts/train.py:534-543)."""
        fused, mask, n_img = self.fuse(vision, input_ids, attention_mask,
                                       deterministic)
        if n_img:
            pad = jnp.full((labels.shape[0], n_img), IGNORE_LABEL,
                           labels.dtype)
            labels = jnp.concatenate([pad, labels], axis=1)
        out = self.llama_mod(fused, mask, labels=labels,
                             deterministic=deterministic)
        return out["loss"]
