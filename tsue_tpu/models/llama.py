"""Minimal Llama-3.2-style causal LM in Flax, with first-class LoRA.

Replaces the reference's HF ``AutoModelForCausalLM`` + PEFT wrapper
(``LlamaWithCrossAttnPEFT``, ref scripts/train.py:419-453; LoRA config r=8,
alpha=32, dropout=0.1, target_modules=[q_proj, v_proj] per
ref modify_scripts/modify.py:512-521).  Differences by design:

- LoRA is a param-collection citizen (params named ``lora_a``/``lora_b``)
  so freeze regimes are optax masks, not ``requires_grad`` mutation;
- computation is ``W x + (alpha/r) * B (A x)`` without materializing the
  delta weight — fuses into two skinny matmuls on the MXU;
- everything is static-shape; attention masking covers padding, so one
  compilation serves all batch contents;
- bf16-friendly: matmuls honor the configured dtype, RMSNorm/softmax/rope
  run in fp32.

Weight ingestion from HF checkpoints lives in
``tsue_tpu.models.llama_loader`` (tied embeddings, GQA head layout, RoPE
scaling verified there).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tsue_tpu.config import LlamaConfig
from tsue_tpu.ops.attention import dot_product_attention


def _remat_policy(name: str):
    """Map LlamaConfig.remat_policy to a jax.checkpoint policy.

    "full" (None) recomputes the whole layer in the backward — minimum
    memory, +1 forward of FLOPs.  "dots" saves every matmul output
    (jax.checkpoint_policies.checkpoint_dots) so the backward recomputes
    only the cheap elementwise/norm/rope ops — costs activation memory
    (~0.4 GB/layer at B=16, T=528 for the 1B dims) to skip the MXU
    recompute.
    """
    if name in ("full", "", None):
        return None
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if name == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r} "
                     "(expected full|dots|dots_no_batch)")


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from tsue_tpu.ops.fused import (fused_enabled, fused_rmsnorm,
                                        rmsnorm_ref)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        if fused_enabled():
            # one-pass Pallas kernel (read once, write once); identical
            # f32 math to the XLA formulation below
            return fused_rmsnorm(x, scale, self.eps)
        return rmsnorm_ref(x, scale, self.eps)


def rope_inv_freq(cfg: LlamaConfig) -> np.ndarray:
    """Inverse frequencies with llama-3-style long-context scaling."""
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2,
                                              dtype=np.float64) / cfg.head_dim))
    if cfg.rope_scaling_factor and cfg.rope_scaling_factor != 1.0:
        low_wl = cfg.rope_original_max_position / cfg.rope_low_freq_factor
        high_wl = cfg.rope_original_max_position / cfg.rope_high_freq_factor
        wl = 2 * np.pi / inv
        # three bands: long wavelengths scaled down, short kept, mid smoothed
        smooth = ((cfg.rope_original_max_position / wl) - cfg.rope_low_freq_factor) / (
            cfg.rope_high_freq_factor - cfg.rope_low_freq_factor)
        smooth = np.clip(smooth, 0.0, 1.0)
        scaled = inv / cfg.rope_scaling_factor
        blended = (1 - smooth) * scaled + smooth * inv
        inv = np.where(wl > low_wl, scaled, np.where(wl < high_wl, inv, blended))
    return inv.astype(np.float32)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray,
               inv_freq: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, Dh); positions: (B, T) int32. fp32 internally."""
    dtype = x.dtype
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B,T,Dh/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x = x.astype(jnp.float32)
    x1, x2 = jnp.split(x, 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dtype)


class LoRADense(nn.Module):
    """Dense with optional additive low-rank adapter.

    Params: kernel (+bias) and, when enabled, ``lora_a`` (in, r) /
    ``lora_b`` (r, out) — the 'lora' substring is what freeze-regime masks
    key on (tsue_tpu.train.trainer.freeze_label).
    """
    features: int
    use_bias: bool = False
    lora_r: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True, swiglu_up=None,
                 quant_ok=False):
        in_f = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_f, self.features))
        # ``quant_ok`` is threaded down from the fusion decode methods
        # (decode_step / decode_window) ONLY — prefill and training keep
        # the bf16 weights even when the "quant" collection is attached
        # to the whole variables dict
        decode_quant = quant_ok and self.has_variable("quant", "w8")
        if swiglu_up is not None:
            # down-projection form: x is the gate, y = (silu(x)*up) @ W.
            # The opt-in fused kernel computes silu in f32 (documented
            # deviation); this default path keeps the original bf16 silu
            # numerics.  The int8 decode branch below takes precedence so
            # quantize_decode keeps its halved weight stream even under
            # TSUE_FUSED=on.
            from tsue_tpu.ops.fused import fused_enabled, swiglu_matmul
            if not decode_quant and fused_enabled() and self.lora_r == 0 \
                    and not self.use_bias:
                return swiglu_matmul(x, swiglu_up,
                                     kernel.astype(self.dtype))
            x = nn.silu(x) * swiglu_up
        if decode_quant:
            # int8 weight-only decode path (ops/quant.py): active for
            # cached decode calls only (single-token steps AND speculative
            # W-token windows) — prefill/training (compute-bound) keep
            # the bf16 weights
            from tsue_tpu.ops.quant import int8_matmul
            y = int8_matmul(x, self.get_variable("quant", "w8"),
                            self.get_variable("quant", "scale"))
        else:
            y = jnp.dot(x, kernel.astype(self.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        if self.lora_r > 0:
            # PEFT init: A ~ kaiming-uniform, B = 0 (adapter starts as no-op)
            a = self.param("lora_a", nn.initializers.he_uniform(),
                           (in_f, self.lora_r))
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.lora_r, self.features))
            h = nn.Dropout(self.lora_dropout)(x, deterministic=deterministic)
            delta = jnp.dot(jnp.dot(h, a.astype(self.dtype)),
                            b.astype(self.dtype))
            y = y + (self.lora_alpha / self.lora_r) * delta.astype(y.dtype)
        return y


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, positions, inv_freq, deterministic=True,
                 kv_cache: Optional[Tuple] = None, cache_index=None,
                 quant_ok=False):
        c = self.cfg
        B, T, _ = x.shape
        lr = c.lora_r if c.use_lora else 0
        lora_kw = dict(lora_alpha=c.lora_alpha, lora_dropout=c.lora_dropout,
                       dtype=self.dtype)
        q = LoRADense(c.num_heads * c.head_dim, name="q_proj",
                      lora_r=lr if "q_proj" in c.lora_targets else 0,
                      **lora_kw)(x, deterministic, quant_ok=quant_ok)
        k = LoRADense(c.num_kv_heads * c.head_dim, name="k_proj",
                      lora_r=lr if "k_proj" in c.lora_targets else 0,
                      **lora_kw)(x, deterministic, quant_ok=quant_ok)
        v = LoRADense(c.num_kv_heads * c.head_dim, name="v_proj",
                      lora_r=lr if "v_proj" in c.lora_targets else 0,
                      **lora_kw)(x, deterministic, quant_ok=quant_ok)
        q = q.reshape(B, T, c.num_heads, c.head_dim)
        k = k.reshape(B, T, c.num_kv_heads, c.head_dim)
        v = v.reshape(B, T, c.num_kv_heads, c.head_dim)

        is_causal = True
        rope = None
        if kv_cache is not None and len(kv_cache) == 4:
            # int8 KV cache (ops/kv_quant.py): quantize the new rows on
            # the way in, attend over the int8 cache (dequantized in
            # VMEM by the Pallas kernel) — the cache's HBM stream is
            # halved, which dominates the step at large decode batch
            from tsue_tpu.ops.kv_quant import attend_int8_kv, update_kv_int8
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)
            kv_cache = update_kv_int8(kv_cache, k, v, cache_index)
            out = attend_int8_kv(q, kv_cache, mask)
            out = out.reshape(B, T, c.num_heads * c.head_dim)
            out = LoRADense(c.hidden_size, name="o_proj",
                            lora_r=lr if "o_proj" in c.lora_targets else 0,
                            **lora_kw)(out, deterministic, quant_ok=quant_ok)
            return out, kv_cache
        if kv_cache is not None:
            # decode: the cache stores roped keys, so rope before appending
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)
            ck, cv = kv_cache
            if getattr(cache_index, "ndim", 0) == 1:
                # per-row write slots: every row lands at its own cache
                # offset (continuous batching, serve_batching) — and a
                # T-wide window writes T consecutive slots from each row's
                # offset (speculative decoding, eval/speculative.py)
                rows = jnp.arange(B)[:, None]
                cols = cache_index[:, None] + jnp.arange(T)[None, :]
                ck = ck.at[rows, cols].set(k)
                cv = cv.at[rows, cols].set(v)
            else:
                ck = jax.lax.dynamic_update_slice(ck, k,
                                                  (0, cache_index, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v,
                                                  (0, cache_index, 0, 0))
            k, v = ck, cv
            kv_cache = (ck, cv)
            is_causal = False  # mask supplied explicitly by caller
        else:
            # prefill/training self-attention: hand the rope to the
            # attention op as (cos, sin) so the Pallas kernel applies it in
            # VMEM (identical f32 math to apply_rope either way)
            angles = positions[..., None].astype(jnp.float32) * inv_freq
            rope = (jnp.cos(angles), jnp.sin(angles))

        out = dot_product_attention(q, k, v, mask=mask, is_causal=is_causal,
                                    rope=rope)
        out = out.reshape(B, T, c.num_heads * c.head_dim)
        out = LoRADense(c.hidden_size, name="o_proj",
                        lora_r=lr if "o_proj" in c.lora_targets else 0,
                        **lora_kw)(out, deterministic, quant_ok=quant_ok)
        return out, kv_cache


class LlamaMLP(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, quant_ok=False):
        c = self.cfg
        gate = LoRADense(c.intermediate_size, name="gate_proj",
                         dtype=self.dtype)(x, quant_ok=quant_ok)
        up = LoRADense(c.intermediate_size, name="up_proj",
                       dtype=self.dtype)(x, quant_ok=quant_ok)
        return LoRADense(c.hidden_size, name="down_proj",
                         dtype=self.dtype)(gate, swiglu_up=up,
                                           quant_ok=quant_ok)


class LlamaLayer(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, positions, inv_freq, deterministic=True,
                 kv_cache=None, cache_index=None, quant_ok=False):
        h, new_cache = LlamaAttention(self.cfg, self.dtype, name="attn")(
            RMSNorm(self.cfg.rms_norm_eps, name="input_norm")(x),
            mask, positions, inv_freq, deterministic, kv_cache, cache_index,
            quant_ok)
        x = x + h
        h = LlamaMLP(self.cfg, self.dtype, name="mlp")(
            RMSNorm(self.cfg.rms_norm_eps, name="post_attn_norm")(x),
            quant_ok)
        return x + h, new_cache


class LlamaModel(nn.Module):
    """Decoder stack over input embeddings.

    Takes ``inputs_embeds`` directly (not token ids): the multimodal fusion
    prepends Q-Former image tokens to text embeddings, which is the
    reference's input-level fusion (ref scripts/train.py:526-543), and the
    soft-prefix generation path needs embedding-level prefill
    (ref scripts/train.py:606-623 does it by monkey-patching; here it is
    just the natural API).
    """
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size,
                                     name="embed_tokens")
        layer_cls = LlamaLayer
        if c.remat:
            # trade recompute for activation memory (jax.checkpoint per
            # layer) — lets the 1B model train long sequences on one chip
            # static_argnums counts self at 0: deterministic is arg 5,
            # quant_ok arg 8 (both Python bools)
            layer_cls = nn.remat(LlamaLayer, static_argnums=(5, 8),
                                 policy=_remat_policy(c.remat_policy))
        self.layers = [layer_cls(c, self.dtype, name=f"layer_{i}")
                       for i in range(c.num_layers)]
        self.final_norm = RMSNorm(c.rms_norm_eps, name="final_norm")
        self._inv_freq = rope_inv_freq(c)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(self, inputs_embeds=None, attention_mask=None, positions=None,
                 deterministic=True, kv_caches=None, cache_index=None,
                 kv_mask=None, quant_ok=False, input_ids=None):
        """inputs_embeds: (B, T, D) (or ``input_ids`` (B, T) to embed here);
        attention_mask: (B, T) 1=real.

        Returns (hidden (B,T,D), new_kv_caches or None).
        In decode mode (kv_caches given) ``kv_mask`` (B, T_cache) marks
        valid cache slots and causality is handled by the caller's mask.
        ``quant_ok=True`` (decode calls only) lets the projections use the
        int8 "quant" collection when attached (ops/quant.py).
        """
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        B, T, _ = inputs_embeds.shape
        if positions is None:
            if attention_mask is not None:
                positions = jnp.cumsum(attention_mask, axis=1) - 1
                positions = jnp.maximum(positions, 0)
            else:
                positions = jnp.broadcast_to(jnp.arange(T), (B, T))
        x = inputs_embeds
        if kv_caches is None:
            mask = None
            if attention_mask is not None:
                mask = attention_mask.astype(bool)  # (B, Tk) key-validity
            new_caches = None
            for layer in self.layers:
                # full positional arg list: the remat wrapper's
                # static_argnums are positional indices, so every call
                # must supply the same arity
                x, _ = layer(x, mask, positions, self._inv_freq,
                             deterministic, None, None, False)
        else:
            mask = kv_mask.astype(bool) if kv_mask is not None else None
            new_caches = []
            for layer, cache in zip(self.layers, kv_caches):
                x, nc = layer(x, mask, positions, self._inv_freq,
                              deterministic, cache, cache_index, quant_ok)
                new_caches.append(nc)
        return self.final_norm(x), new_caches


class LlamaForCausalLM(nn.Module):
    """LlamaModel + (tied) LM head + masked LM loss."""
    cfg: LlamaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.model = LlamaModel(self.cfg, self.dtype, name="model")
        if not self.cfg.tie_word_embeddings:
            self.lm_head = nn.Dense(self.cfg.vocab_size, use_bias=False,
                                    name="lm_head")

    def embed(self, input_ids):
        return self.model.embed(input_ids)

    def logits_from_hidden(self, hidden, quant_ok=False):
        """``quant_ok=True`` on decode-side reads only (generation's
        logits0 / decode_step / decode_window): training forwards keep
        the bf16 head even when the collection is attached."""
        if quant_ok and self.has_variable("quant", "lm_head_w8"):
            # int8 decode path: the V-wide LM-head stream is the single
            # largest weight read of a decode step (ops/quant.py);
            # int8_matmul handles both the (B, D) step and the (B, W, D)
            # speculative-window hidden
            from tsue_tpu.ops.quant import int8_matmul
            return int8_matmul(hidden,
                               self.get_variable("quant", "lm_head_w8"),
                               self.get_variable("quant", "lm_head_scale"),
                               out_dtype=jnp.float32)
        if self.cfg.tie_word_embeddings:
            w = self.model.embed_tokens.embedding  # (V, D)
            return jnp.dot(hidden, w.T.astype(self.dtype),
                           preferred_element_type=jnp.float32)
        return self.lm_head(hidden).astype(jnp.float32)

    def _head_weight(self, hidden):
        """(D, V) LM-head weight as a plain array — safe to close over in
        checkpointed/scanned loss bodies, where calling a flax submodule
        would leak tracers (UnexpectedTracerError).  ``hidden`` is only
        used to create the lm_head params during init."""
        if self.cfg.tie_word_embeddings:
            return self.model.embed_tokens.embedding.T
        if self.is_initializing():
            self.lm_head(hidden[:, :1])
        return self.lm_head.variables["params"]["kernel"]

    def __call__(self, inputs_embeds=None, attention_mask=None, labels=None,
                 positions=None, deterministic=True, compute_logits=False,
                 input_ids=None):
        """Returns dict with hidden, and logits/loss when requested.

        Stage-2 training calls with compute_logits=False: the reference
        computes the HF LM loss and discards it (ref scripts/train.py:547-554)
        — skipping the (T,hidden->128256) matmul entirely is pure savings.
        """
        hidden, _ = self.model(inputs_embeds, attention_mask, positions,
                               deterministic, input_ids=input_ids)
        out = {"hidden": hidden}
        if labels is not None and self.cfg.loss_chunk and not compute_logits:
            w = self._head_weight(hidden).astype(self.dtype)
            out["loss"] = causal_lm_loss_chunked(
                hidden, labels,
                lambda h: jnp.dot(h, w, preferred_element_type=jnp.float32),
                self.cfg.loss_chunk)
        elif compute_logits or labels is not None:
            logits = self.logits_from_hidden(hidden)
            out["logits"] = logits
            if labels is not None:
                out["loss"] = causal_lm_loss(logits, labels)
        return out


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Next-token cross entropy with -100 ignore (HF semantics)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits, axis=-1)
    tok_logp = jnp.take_along_axis(shift_logits, safe[..., None],
                                   axis=-1)[..., 0]
    nll = (logz - tok_logp) * valid
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def causal_lm_loss_chunked(hidden: jnp.ndarray, labels: jnp.ndarray,
                           logits_fn, chunk: int) -> jnp.ndarray:
    """``causal_lm_loss`` without ever materializing the (B, T, V) logits.

    The dense path at real Llama scale holds ~2.2 GB of f32 logits plus an
    equal d_logits cotangent (bs8, T=528, V=128256); here the LM-head
    matmul + logsumexp run per sequence chunk inside a ``lax.scan``, with
    ``jax.checkpoint`` so the backward recomputes each chunk's logits
    transiently instead of saving them.  Identical value and gradients to
    the dense loss (pinned in tests/test_llama.py), peak memory
    O(B * chunk * V) instead of O(B * T * V).
    """
    s, n = causal_lm_ce_sum_chunked(hidden, labels, logits_fn, chunk)
    return s / jnp.maximum(n, 1)


def causal_lm_ce_sum_chunked(hidden: jnp.ndarray, labels: jnp.ndarray,
                             logits_fn, chunk: int):
    """(CE sum, valid-token count) form of :func:`causal_lm_loss_chunked`
    for callers that combine partial sums across shards before dividing
    (the pipelined stage-1 loss, parallel/pipeline.py)."""
    B, T, D = hidden.shape
    h = hidden[:, :-1]          # keep model dtype: the LM-head matmul
    y = labels[:, 1:]           # must see the same inputs as the dense path
    tm = T - 1
    pad = (-tm) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad)), constant_values=-100)
    n_chunks = (tm + pad) // chunk
    hc = jnp.moveaxis(h.reshape(B, n_chunks, chunk, D), 1, 0)
    yc = jnp.moveaxis(y.reshape(B, n_chunks, chunk), 1, 0)

    @jax.checkpoint
    def chunk_stats(hk, yk):
        logits = logits_fn(hk).astype(jnp.float32)      # (B, chunk, V)
        valid = yk != -100
        safe = jnp.where(valid, yk, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        tok = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        return ((logz - tok) * valid).sum(), valid.sum()

    def body(carry, xs):
        s, n = carry
        ds, dn = chunk_stats(*xs)
        return (s + ds, n + dn), None

    (s, n), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hc, yc))
    return s, n


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=jnp.float32):
    """Per-layer (k, v) buffers of shape (B, max_len, Hkv, Dh)."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(cfg.num_layers)]
