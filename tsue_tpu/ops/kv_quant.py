"""Int8 KV cache: halve the decode loop's cache stream.

After int8 weights (ops/quant.py), the KV cache is the remaining
B-proportional HBM stream of a decode step: at Llama-1B dims the bf16
cache read is ``B * S * Hkv * Dh * 2 (k+v) * 2 bytes * L`` — ~2.4 GB/step
at bs128/S=576, i.e. it overtakes the (fixed-size) weight stream as batch
grows.  This module stores the cache per-token-per-head symmetric int8
(``k ~ k8 * ks``); decode attention dequantizes on-chip (XLA fuses the
converts into the attention matmuls), so HBM only ever sees the int8
bytes — the cache footprint halves at step-time parity with bf16.

Design (mirrors ops/quant.py's opt-in discipline):

- Prefill is EXACT: the prefix is prefilled into a bf16 cache as always
  and :func:`quantize_cache` converts it once before the decode scan —
  prefill attention never sees quantization error, and the conversion
  cost amortizes over the whole generation.
- Decode writes quantize the new K/V rows on the way into the cache
  (same scatter patterns as the bf16 path: scalar slice, per-row slots,
  W-token windows), so the cache never holds bf16.
- Decode reads go through :func:`attend_int8_kv`: the XLA formulation
  over the dequantized cache (default — the converts fuse into the
  attention matmuls) or an opt-in Pallas VMEM-dequant kernel (grid over
  batch rows, whole-row (S, Hkv*Dh) int8 blocks, GQA-native lane
  slicing like ops/flash.py) kept as the parity reference; it measured
  slower (see ``_KV_IMPL`` note).  Same fp32 softmax(QK^T)V either way.

A cache layer is a 4-tuple ``(k8, ks, v8, vs)`` — models/llama.py's
attention branches on the tuple arity, everything else threads the cache
pytree opaquely.  Opt-in via ``serve.Predictor(quantize_kv=True)`` /
``make_generate_fn(..., quantize_kv=True)``; quality bound pinned by
tests/test_quant.py.

No reference equivalent (the reference serves fp32 HF generate,
ref scripts/train.py:606-654); this is a TPU-native serving lever.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# int8 decode-attention formulation: "xla" (default) = dequantize +
# ops/attention._xla_attention — XLA fuses the int8->f32 convert into
# the attention matmuls, so HBM still streams only int8 bytes; "kernel"
# = the Pallas VMEM-dequant kernel.  MEASURED (scripts/ab_kv_quant.py,
# real chip, interleaved, Llama-1B dims): the kernel is 0.58-0.77x the
# bf16 cache at bs16-128 (its whole-row (S, Hkv*D) VMEM blocks don't
# pipeline the S stream), while "xla" is 0.99-1.02x with HALF the cache
# HBM/footprint — so "xla" is the default and the kernel is a RETIRED
# EXPERIMENT kept only as the parity-tested reference formulation (see
# the post-mortem note above attend_int8_kv).  Read at TRACE time; a
# ContextVar so a scoped choice on one server thread cannot flip a
# concurrent trace on another (scripts/serve.py HTTP mode).
import contextvars

_KV_IMPL: contextvars.ContextVar = contextvars.ContextVar(
    "tsue_kv_attn_impl", default=os.environ.get("TSUE_KV_ATTN", "xla"))


class kv_attn_impl:
    """``with kv_attn_impl("xla"): ...`` — scope the int8 decode-attention
    formulation for everything traced inside (mirrors
    ops/attention.attention_impl).  Per-context (contextvars): concurrent
    traces on other threads are unaffected."""

    def __init__(self, name: str):
        assert name in ("kernel", "xla"), name
        self.name = name

    def __enter__(self):
        self._token = _KV_IMPL.set(self.name)
        return self

    def __exit__(self, *exc):
        _KV_IMPL.reset(self._token)
        return False


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., Dh) -> (int8 (..., Dh), f32 scale (...,)) — symmetric
    per-vector (per token, per head) so RoPE'd keys quantize on their own
    magnitude."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(a, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                  -127, 127).astype(jnp.int8)
    return x8, scale


def dequantize_kv(x8: jnp.ndarray, scale: jnp.ndarray,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    return (x8.astype(jnp.float32) * scale[..., None]).astype(dtype)


def quantize_cache(caches):
    """bf16 per-layer (k, v) list -> int8 per-layer (k8, ks, v8, vs) list.
    Called ONCE after prefill (generation) or admission (batching)."""
    out = []
    for k, v in caches:
        k8, ks = quantize_kv(k)
        v8, vs = quantize_kv(v)
        out.append((k8, ks, v8, vs))
    return out


def is_quantized_cache(layer_cache) -> bool:
    return layer_cache is not None and len(layer_cache) == 4


def update_kv_int8(layer_cache, k, v, cache_index):
    """Scatter new bf16 K/V rows (quantized on the way in) into an int8
    layer cache, mirroring the two write patterns of models/llama.py:
    scalar ``cache_index`` (dynamic slice at a shared offset) and per-row
    (B,) slots (continuous batching / speculative windows)."""
    k8n, ksn = quantize_kv(k)
    v8n, vsn = quantize_kv(v)
    k8, ks, v8, vs = layer_cache
    B, T = k.shape[0], k.shape[1]
    if getattr(cache_index, "ndim", 0) == 1:
        rows = jnp.arange(B)[:, None]
        cols = cache_index[:, None] + jnp.arange(T)[None, :]
        k8 = k8.at[rows, cols].set(k8n)
        ks = ks.at[rows, cols].set(ksn)
        v8 = v8.at[rows, cols].set(v8n)
        vs = vs.at[rows, cols].set(vsn)
    else:
        k8 = jax.lax.dynamic_update_slice(k8, k8n, (0, cache_index, 0, 0))
        ks = jax.lax.dynamic_update_slice(ks, ksn, (0, cache_index, 0))
        v8 = jax.lax.dynamic_update_slice(v8, v8n, (0, cache_index, 0, 0))
        vs = jax.lax.dynamic_update_slice(vs, vsn, (0, cache_index, 0))
    return (k8, ks, v8, vs)


# ---------------------------------------------------------------------
# Decode attention over the int8 cache
# ---------------------------------------------------------------------


def _attend_kernel(q_ref, k8_ref, ks_ref, v8_ref, vs_ref, mask_ref,
                   out_ref, *, scale: float, groups: int, head_dim: int,
                   kv_heads: int):
    """One batch row: all kv heads' int8 K/V dequantized in VMEM, GQA
    query heads as lane slices (same layout idea as ops/flash.py's
    group-lane path).  q/out: (1, Tq, Hq*D); k8/v8: (1, S, Hkv*D);
    ks/vs: (1, S, Hkv) f32; mask: (1, Tq, S) int32."""
    D = head_dim
    valid = mask_ref[0] > 0                          # (Tq, S)
    for h in range(kv_heads):                        # static unroll
        kh = k8_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32) \
            * ks_ref[0, :, h][:, None]               # (S, D) f32
        vh = v8_ref[0, :, h * D:(h + 1) * D].astype(jnp.float32) \
            * vs_ref[0, :, h][:, None]
        for g in range(groups):
            j = h * groups + g                       # query head index
            qg = q_ref[0, :, j * D:(j + 1) * D].astype(jnp.float32)
            logits = jax.lax.dot_general(
                qg, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale   # (Tq, S)
            logits = jnp.where(valid, logits, NEG_INF)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            p = p / jnp.maximum(s, 1e-30)
            out_ref[0, :, j * D:(j + 1) * D] = jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _attend_int8_impl(q, k8, ks, v8, vs, mask3, scale, interpret: bool):
    B, Tq, Hq, D = q.shape
    S, Hkv = k8.shape[1], k8.shape[2]
    G = Hq // Hkv
    cost = pl.CostEstimate(
        flops=4 * B * Hq * Tq * S * D,
        bytes_accessed=2 * B * S * Hkv * D + 2 * B * Tq * Hq * D * 2
        + 2 * B * S * Hkv * 4,
        transcendentals=B * Hq * Tq * S)
    out = pl.pallas_call(
        functools.partial(_attend_kernel, scale=scale, groups=G,
                          head_dim=D, kv_heads=Hkv),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Tq, Hq * D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv * D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv * D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, Hkv), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tq, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tq, Hq * D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq, Hq * D), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(q.reshape(B, Tq, Hq * D), k8.reshape(B, S, Hkv * D), ks,
      v8.reshape(B, S, Hkv * D), vs, mask3.astype(jnp.int32))
    return out.reshape(B, Tq, Hq, D)


@functools.lru_cache(maxsize=None)
def _partitioned_attend_int8(scale: float, interpret: bool):
    """GSPMD-partitionable wrapper (ops/flash.py ``_partitioned_fwd``
    pattern) for the opt-in VMEM-dequant kernel: batch ``b`` shards
    freely (the kernel's grid is per batch row); seq/head/dim factors
    are need_replication.  Keeps an explicit ``kv_attn_impl("kernel")``
    scope legal under a mesh instead of all-gathering or crashing."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(q, k8, ks, v8, vs, mask3):
        return _attend_int8_impl(q, k8, ks, v8, vs, mask3, scale,
                                 interpret)

    fn = custom_partitioning(impl)

    def _b(arg_shapes):
        spec = getattr(arg_shapes[0].sharding, "spec", None) or P()
        return spec[0] if len(spec) > 0 else None

    def partition(mesh, arg_shapes, result_shape):
        b = _b(arg_shapes)

        def sh(ndim):
            return NamedSharding(mesh, P(*((b,) + (None,) * (ndim - 1))))

        args = tuple(sh(s.shape and len(s.shape)) for s in arg_shapes)
        return mesh, impl, sh(4), args

    def infer(mesh, arg_shapes, shape):
        b = _b(arg_shapes)
        return NamedSharding(mesh, P(b, None, None, None))

    fn.def_partition(
        partition, infer_sharding_from_operands=infer,
        sharding_rule=("b t x d, b s h d, b s h, b s h d, b s h, b t s "
                       "-> b t x d"),
        need_replication_factors=("t", "x", "d", "s", "h"))
    return fn


def _mask3(mask, B, Tq, S):
    """Normalize the decode masks to (B, Tq, S) bool: (B, S) key-validity
    (decode_step) or (B, 1, Tq, S) per-query (decode_window)."""
    if mask is None:
        return jnp.ones((B, Tq, S), bool)
    if mask.ndim == 2:                               # (B, S)
        return jnp.broadcast_to(mask.astype(bool)[:, None, :], (B, Tq, S))
    if mask.ndim == 4:                               # (B, 1|H, Tq, S)
        return jnp.broadcast_to(mask.astype(bool)[:, 0], (B, Tq, S))
    return jnp.broadcast_to(mask.astype(bool), (B, Tq, S))


def attend_int8_kv(q, layer_cache, mask, scale: Optional[float] = None,
                   interpret: Optional[bool] = None) -> jnp.ndarray:
    """Decode attention over an int8 layer cache.

    q: (B, Tq, Hq, Dh) roped queries (Tq = 1 or a speculative window);
    layer_cache: (k8, ks, v8, vs); mask: the decode kv mask ((B, S) or
    (B, 1, Tq, S)).  Returns (B, Tq, Hq, Dh) in q.dtype.

    Default path is the XLA formulation over the dequantized cache: XLA
    fuses the int8->f32 converts into the attention matmuls, so HBM
    still streams only int8 bytes — measured at parity with the bf16
    cache's step time while halving its footprint.  The Pallas
    VMEM-dequant kernel is opt-in (``kv_attn_impl("kernel")`` /
    ``TSUE_KV_ATTN=kernel``, qualifying shapes only: G*Dh and Hkv*Dh
    lane-tiled); it measured 0.58-0.77x and is kept as the parity-tested
    reference formulation (CPU tests force interpret=True).  Both paths
    are the same fp32 softmax(QK^T)V math.
    """
    k8, ks, v8, vs = layer_cache
    B, Tq, Hq, D = q.shape
    S, Hkv = k8.shape[1], k8.shape[2]
    if scale is None:
        scale = D ** -0.5
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if _KV_IMPL.get() == "kernel" and Hq % Hkv == 0 \
            and ((Hq // Hkv) * D) % 128 == 0 and (Hkv * D) % 128 == 0:
        m3 = _mask3(mask, B, Tq, S)
        from tsue_tpu.ops.quant import _vma
        if jax.device_count() > 1 and not _vma(q, k8, ks, v8, vs, m3):
            fn = _partitioned_attend_int8(float(scale), bool(interpret))
            return fn(q, k8, ks, v8, vs, m3.astype(jnp.int32))
        return _attend_int8_impl(q, k8, ks, v8, vs, m3, float(scale),
                                 bool(interpret))
    from tsue_tpu.ops.attention import _xla_attention
    k = dequantize_kv(k8, ks, q.dtype)
    v = dequantize_kv(v8, vs, q.dtype)
    if mask is not None and mask.ndim == 2:
        mask = mask.astype(bool)
    return _xla_attention(q, k, v, mask, False, float(scale))
