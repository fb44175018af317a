"""Pallas TPU attention kernel.

Replaces the XLA path of ``tsue_tpu.ops.dot_product_attention`` for the
shapes this framework runs (T <= ~2k): one grid program per (batch*head,
q-block) computing fp32 logits for its q-block against the FULL K/V rows
held in VMEM (544x64 fp32 K is ~139 KB — far under the 16 MB VMEM budget),
with stable softmax and bf16 MXU matmuls.  Compared to the XLA path this
never materializes the (B, H, Tq, Tk) fp32 logit tensor in HBM, which is
the memory-bandwidth hot spot of the Llama prefill (SURVEY.md §7).

Training still differentiates through attention: ``flash_attention`` is a
``jax.custom_vjp`` whose backward recomputes gradients with the XLA
formulation (correct, and the bwd was HBM-bound either way).

Measured role (v5e-1, Llama-1B dims, bf16, text 512): inference speed is a
wash vs XLA (attention is ~8% of FLOPs), but TRAINING MEMORY is decisive —
the XLA path saves (B, H, T, T) fp32 logit residuals per layer for the
backward (16 x 660 MB at bs16) and OOMs the 16 GB chip on any full-backward
regime (joint / lora_only / full_freeze); with this kernel (no saved
logits; bwd recomputes transiently) + per-layer remat, the joint 1B train
step fits and runs at ~320 ms (bs8).  Enable via TSUE_ATTENTION=pallas or
set_attention_impl("pallas") together with LlamaConfig(remat=True).

Kernel-shape policy mirrors the pallas guide: last dim 128-aligned via
head_dim padding by the caller (Llama head_dim=64 is fine as the minor-most
dim of (8,128)-tiled fp32 blocks), q blocked at 128 rows, edge blocks
masked by construction.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
NEG_INF = -1e30


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *,
                      scale: float, is_causal: bool, block_q: int,
                      tq: int, tk: int):
    iq = pl.program_id(1)
    q = q_ref[0]                                   # (BQ, D)
    k = k_ref[0]                                   # (Tk, D)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, Tk)

    valid = mask_ref[0] > 0                        # (1, Tk)
    if is_causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) \
            + iq * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        # rows index q positions; with Tq<=Tk the diagonal sits at
        # cols - (tk - tq), matching jnp.tril(k=Tk-Tq)
        valid = valid & (cols <= rows + (tk - tq))
    logits = jnp.where(valid, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(s, 1e-30)
    out_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _flash_fwd_impl(q, k, v, mask, scale: float, is_causal: bool,
                    interpret: bool):
    """q: (B, Tq, H, D); k/v: (B, Tk, H, D) (heads already repeated);
    mask: (B, Tk) int32 key-validity."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    BQ = min(DEFAULT_BLOCK_Q, max(8, Tq))
    qh = jnp.moveaxis(q, 2, 1).reshape(B * H, Tq, D)
    kh = jnp.moveaxis(k, 2, 1).reshape(B * H, Tk, D)
    vh = jnp.moveaxis(v, 2, 1).reshape(B * H, Tk, D)
    maskh = jnp.repeat(mask, H, axis=0)[:, None, :]  # (B*H, 1, Tk)

    grid = (B * H, pl.cdiv(Tq, BQ))
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale,
                          is_causal=is_causal, block_q=BQ, tq=Tq, tk=Tk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, iq: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk), lambda bh, iq: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, iq: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq, D), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, maskh)
    return jnp.moveaxis(out.reshape(B, H, Tq, D), 1, 2)


def _xla_ref(q, k, v, mask, scale, is_causal):
    """XLA formulation used for the backward pass and parity tests."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    neg = jnp.finfo(jnp.float32).min
    m = mask[:, None, None, :].astype(bool)
    if is_causal:
        Tq, Tk = q.shape[1], k.shape[1]
        m = m & jnp.tril(jnp.ones((Tq, Tk), bool), k=Tk - Tq)[None, None]
    logits = jnp.where(m, logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, mask, scale, is_causal, interpret):
    return _flash_fwd_impl(q, k, v, mask, scale, is_causal, interpret)


def _flash_fwd(q, k, v, mask, scale, is_causal, interpret):
    return _flash_fwd_impl(q, k, v, mask, scale, is_causal, interpret), \
        (q, k, v, mask)


def _flash_bwd(scale, is_causal, interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_ref(q_, k_, v_, mask, scale,
                                                 is_causal), q, k, v)
    # upstream may hand a higher-precision cotangent than the bf16 output
    dq, dk, dv = vjp(g.astype(v.dtype))
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                    is_causal: bool = False, scale: Optional[float] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Drop-in for the XLA path of dot_product_attention (heads already
    GQA-repeated by the caller).  4-D masks fall back to XLA."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if mask is not None and mask.ndim != 2:
        from tsue_tpu.ops.attention import _xla_attention
        return _xla_attention(q, k, v, mask, is_causal, scale)
    B, Tk = k.shape[0], k.shape[1]
    if mask is None:
        mask = jnp.ones((B, Tk), jnp.int32)
    mask = mask.astype(jnp.int32)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return _flash(q, k, v, mask, float(scale), bool(is_causal),
                  bool(interpret))
