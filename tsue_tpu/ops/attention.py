"""Attention ops: single entry point used by every model in the framework.

All attention in the framework (Q-Former, Llama, LTSF cross/self attention,
lane encoder, MMTrans baseline) funnels through ``dot_product_attention`` so
the Pallas flash-attention kernel can be swapped in at ONE place.  The XLA
path is always available and is the reference for kernel parity tests.

Replaces torch.nn.MultiheadAttention / HF attention used throughout the
reference (e.g. ref scripts/train.py:662, 793-798).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import contextvars
import os

# "auto" | "xla" | "pallas".  A ContextVar, not a module global: scoped
# switches on one thread must never leak into a concurrent trace on
# another (e.g. the threaded HTTP server in scripts/serve.py) — each
# thread/context reads its own value, falling back to the env default.
_IMPL: contextvars.ContextVar = contextvars.ContextVar(
    "tsue_attention_impl", default=os.environ.get("TSUE_ATTENTION", "auto"))


def set_attention_impl(name: str):
    assert name in ("auto", "xla", "pallas")
    _IMPL.set(name)


def get_attention_impl() -> str:
    return _IMPL.get()


def resolve_attention_impl() -> str:
    """The impl "auto" picks at trace time: the Pallas flash kernel on real
    accelerators (measured faster than the XLA formulation across prefill,
    K-candidate eval and both train regimes on the v5e — see PARITY.md),
    the XLA path on CPU hosts where Pallas would run interpreted (tests
    opt in to interpret mode explicitly when they want kernel parity)."""
    impl = _IMPL.get()
    if impl != "auto":
        return impl
    return "xla" if jax.devices()[0].platform == "cpu" else "pallas"


class attention_impl:
    """Scoped implementation switch:

        with attention_impl("pallas"):
            step = jax.jit(make_train_step(cfg))   # trace INSIDE the scope
            step(...)

    CAVEAT: the switch is consulted at TRACE time. A function already
    traced/compiled under a different impl keeps its cached executable —
    build (or re-build) jitted callables inside the scope.  Scopes are
    per-context (contextvars): entering one on a server thread cannot
    flip a concurrent trace on another thread.
    """

    def __init__(self, name: str):
        assert name in ("auto", "xla", "pallas")
        self.name = name

    def __enter__(self):
        self._token = _IMPL.set(self.name)
        return self

    def __exit__(self, *exc):
        _IMPL.reset(self._token)
        return False


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          is_causal: bool = False,
                          scale: Optional[float] = None,
                          dropout_rate: float = 0.0,
                          dropout_rng: Optional[jax.Array] = None,
                          rope: Optional[tuple] = None
                          ) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q: (B, Tq, H, Dh)
      k, v: (B, Tk, Hkv, Dh) — Hkv may divide H (GQA)
      mask: optional boolean (B, 1|H, Tq, Tk) or (B, Tk) key-validity mask;
            True = attend.
      is_causal: add causal masking (decoder LM).
      dropout_rate/dropout_rng: dropout on the softmax probabilities (torch
        nn.MultiheadAttention semantics); active only when both are set.
        Training-time only — forces the XLA path (the flash kernel has no
        probs-dropout; inference/eval never passes an rng).
      rope: optional (cos, sin), each (B, T, Dh/2) f32 — apply the Llama
        rotary embedding to q and k before attending (self-attention only,
        Tq == Tk).  On the Pallas path this fuses the rope into the kernel
        (VMEM-resident, no f32 HBM round-trip); otherwise it is pre-applied
        with bit-identical math.
    Returns: (B, Tq, H, Dh)
    """
    B, Tq, H, Dh = q.shape
    Hkv = k.shape[2]
    if scale is None:
        scale = Dh ** -0.5

    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    # under "auto", single-query decode steps (Tq=1 against the KV cache)
    # stay on XLA: the kernel's per-call overhead dominates at one query
    # row — measured 1927 (XLA) vs 1629 (pallas) tok/s in the full decode
    # loop (scripts/ab_decode_attn.py, interleaved, bs16 Llama-1B).
    # An EXPLICIT "pallas" still takes the kernel (parity tests rely on it).
    auto_decode_xla = _IMPL.get() == "auto" and Tq == 1
    if resolve_attention_impl() == "pallas" and not use_dropout \
            and not auto_decode_xla:
        # GQA-native: the kernel folds per-group query heads into its row
        # axis, so K/V are passed with their Hkv heads (never repeated)
        from tsue_tpu.ops.flash import flash_attention
        return flash_attention(q, k, v, mask=mask, is_causal=is_causal,
                               scale=scale, rope=rope)
    if rope is not None:
        from tsue_tpu.ops.flash import rope_bthd
        q = rope_bthd(q, *rope)
        k = rope_bthd(k, *rope)
    return _xla_attention(q, k, v, mask, is_causal, scale,
                          dropout_rate if use_dropout else 0.0, dropout_rng)


def _xla_attention(q, k, v, mask, is_causal, scale,
                   dropout_rate=0.0, dropout_rng=None):
    B, Tq, H, Dh = q.shape
    Tk, Hkv = k.shape[1], k.shape[2]
    if Hkv != H:
        # GQA without materializing repeated K/V: fold the per-group query
        # heads into the q axis of the dot.  q head h attends kv group
        # h // rep — identical math (and head order) to jnp.repeat on K/V,
        # but the cache is read once instead of rep times (the repeat is
        # real HBM traffic in the decode hot loop: ~0.5 GB/step at Llama-1B
        # dims, bs16, cache 208).
        rep = H // Hkv
        qg = q.reshape(B, Tq, Hkv, rep, Dh)
        logits = jnp.einsum("bqhrd,bkhd->bhrqk", qg, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits.reshape(B, H, Tq, Tk)
        return _finish_attention(
            logits, mask, is_causal, dropout_rate, dropout_rng,
            lambda probs: jnp.einsum(
                "bhrqk,bkhd->bqhrd",
                probs.reshape(B, Hkv, rep, Tq, Tk).astype(v.dtype),
                v).reshape(B, Tq, H, Dh))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    return _finish_attention(
        logits, mask, is_causal, dropout_rate, dropout_rng,
        lambda probs: jnp.einsum("bhqk,bkhd->bqhd",
                                 probs.astype(v.dtype), v))


def _finish_attention(logits, mask, is_causal, dropout_rate,
                      dropout_rng, weighted_sum):
    Tq, Tk = logits.shape[2], logits.shape[3]
    neg = jnp.finfo(logits.dtype).min
    if mask is not None:
        if mask.ndim == 2:            # (B, Tk) key-validity
            mask = mask[:, None, None, :]
        logits = jnp.where(mask, logits, neg)
    if is_causal:
        causal = jnp.tril(jnp.ones((Tq, Tk), dtype=bool), k=Tk - Tq)
        logits = jnp.where(causal[None, None], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        # inverted dropout on attention weights (torch F.dropout semantics)
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return weighted_sum(probs)
