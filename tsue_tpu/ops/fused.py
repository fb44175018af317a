"""Fused elementwise Pallas kernels for the Llama block.

The r2 parity-mode profile (PARITY.md "Parity-mode eval profile") showed
the wide matmuls running at ~91% of MXU peak while the per-layer
elementwise families — RMSNorm and silu(gate)*up — cost ~48 ms of the
155 ms single forward, several times their bandwidth floor, because XLA
materializes fp32 intermediates and runs the reductions as separate HBM
passes.  Two kernels close most of that:

- ``fused_rmsnorm``: one pass — each row block is read into VMEM once,
  the variance reduction, rsqrt and scale all happen in registers, and
  only the cast result is written back.
- ``swiglu_matmul``: computes ``(silu(gate) * up) @ W`` without ever
  writing the (M, intermediate) activation product to HBM — the
  elementwise silu·up happens on K-tiles in VMEM feeding the MXU
  accumulation directly (the down-projection of the Llama MLP,
  ref modeling_llama ``down_proj(act_fn(gate_proj(x)) * up_proj(x))``).

Both are ``jax.custom_vjp`` with an XLA backward (joint training remats
the forward anyway; the backward was HBM-bound in either formulation).
Production entry points consult :func:`fused_enabled` (``TSUE_FUSED`` =
auto|on|off) and silently fall back to the XLA formulation for hostile
shapes, so tiny test models and CPU runs are unchanged.

MEASURED RESULT (r3, scripts/ab_fused.py on the real v5e, interleaved):
with the GQA-native flash-attention kernel already default, these fusions
move NOTHING — fast-mode eval 129.9 -> 129.7 traj/s, parity 13.41 ->
13.41 (within noise).  The elementwise share the r2 profile measured was
largely collateral of the XLA attention formulation (f32 rope round
trips, logit materialization); once attention went to Pallas, XLA fuses
the remaining norm/silu·up into adjacent ops about as well as these
kernels do.  ``auto`` therefore resolves to OFF: equal-but-more-complex
paths don't ship on by default.  The kernels stay parity+grad-tested
(tests/test_fused_kernels.py) as infrastructure for scales where the
balance may differ (longer sequences, wider models).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FUSED = os.environ.get("TSUE_FUSED", "auto")  # "auto" | "on" | "off"


def set_fused(name: str):
    global _FUSED
    assert name in ("auto", "on", "off")
    _FUSED = name


def fused_enabled() -> bool:
    """Trace-time switch.  ``auto`` = off: the interleaved A/B (module
    docstring) measured the fusions as a wash on every production
    workload once flash attention became the default, so they are
    opt-in (``TSUE_FUSED=on`` / ``fused_scope("on")``)."""
    return _FUSED == "on"


class fused_scope:
    """Scoped override, mirroring ops.attention.attention_impl (consulted
    at TRACE time — build jitted callables inside the scope)."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        global _FUSED
        self.prev = _FUSED
        set_fused(self.name)
        return self

    def __exit__(self, *exc):
        set_fused(self.prev)
        return False


# --------------------------------------------------------------------------
# fused RMSNorm
# --------------------------------------------------------------------------

def rmsnorm_ref(x: jnp.ndarray, scale: jnp.ndarray,
                eps: float) -> jnp.ndarray:
    """The XLA formulation (bit-matches models.llama.RMSNorm)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * scale).astype(dtype)


def _rmsnorm_kernel(x_ref, s_ref, o_ref, *, eps: float):
    xf = x_ref[...].astype(jnp.float32)            # (BM, K)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    o_ref[...] = (xf * jax.lax.rsqrt(var + eps)
                  * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def _rmsnorm_fwd_impl(x, scale, eps: float, interpret: bool):
    shape = x.shape
    K = shape[-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    BM = min(M, max(8, 2 * 2 ** 20 // (4 * K) // 8 * 8))  # ~2 MB f32 rows
    out = pl.pallas_call(
        functools.partial(_rmsnorm_kernel, eps=eps),
        grid=(pl.cdiv(M, BM),),
        in_specs=[
            pl.BlockSpec((BM, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, K), x.dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, K))
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rmsnorm(x, scale, eps, interpret):
    return _rmsnorm_fwd_impl(x, scale, eps, interpret)


def _rmsnorm_fwd(x, scale, eps, interpret):
    return _rmsnorm_fwd_impl(x, scale, eps, interpret), (x, scale)


def _rmsnorm_bwd(eps, interpret, res, g):
    x, scale = res
    _, vjp = jax.vjp(lambda x_, s_: rmsnorm_ref(x_, s_, eps), x, scale)
    dx, ds = vjp(g.astype(x.dtype))
    return dx, ds


_rmsnorm.defvjp(_rmsnorm_fwd, _rmsnorm_bwd)


def fused_rmsnorm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5,
                  interpret: Optional[bool] = None) -> jnp.ndarray:
    """One-pass RMSNorm over the last axis.  Falls back to the XLA
    formulation for shapes the (8, 128) tiling would pad wastefully."""
    K = x.shape[-1]
    M = 1
    for d in x.shape[:-1]:
        M *= d
    # M < 128 covers the decode hot loop (M = batch), where per-call
    # kernel overhead would exceed the trivial elementwise cost, and the
    # tiny encoder models; both keep the XLA formulation.
    if K % 128 != 0 or M < 128:
        return rmsnorm_ref(x, scale, eps)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return _rmsnorm(x, scale, float(eps), bool(interpret))


# --------------------------------------------------------------------------
# fused silu(gate) * up @ W  (Llama MLP down-projection)
# --------------------------------------------------------------------------

def swiglu_matmul_ref(gate: jnp.ndarray, up: jnp.ndarray,
                      w: jnp.ndarray) -> jnp.ndarray:
    """XLA formulation: silu in f32 (matches nn.silu on bf16 inputs up to
    the cast), product in input dtype, matmul with f32 accumulation."""
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    return jnp.dot(h, w, preferred_element_type=jnp.float32).astype(
        gate.dtype)


def _swiglu_kernel(g_ref, u_ref, w_ref, o_ref, acc_ref, *, k_steps: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gf = g_ref[...].astype(jnp.float32)            # (BM, BK)
    h = (jax.nn.sigmoid(gf) * gf).astype(u_ref.dtype) * u_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        h, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == k_steps - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _swiglu_fwd_impl(gate, up, w, interpret: bool):
    M, K = gate.shape
    N = w.shape[1]
    BM = min(M, 256)
    BN = min(N, 512)
    # BK must DIVIDE K: a partial trailing K block would fold undefined
    # padded-read data into the accumulation (unlike M/N edges, which are
    # write-side-only).  K % 128 == 0 is guaranteed by the caller, so the
    # scan below always terminates at a valid tile.
    BK = min(K, 2048)
    while K % BK:
        BK -= 128
    grid = (pl.cdiv(M, BM), pl.cdiv(N, BN), K // BK)
    return pl.pallas_call(
        functools.partial(_swiglu_kernel, k_steps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), gate.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(2 * M * K + K * N + M * N) * gate.dtype.itemsize,
            transcendentals=M * K),
        interpret=interpret,
    )(gate, up, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _swiglu(gate, up, w, interpret):
    return _swiglu_fwd_impl(gate, up, w, interpret)


def _swiglu_fwd(gate, up, w, interpret):
    return _swiglu_fwd_impl(gate, up, w, interpret), (gate, up, w)


def _swiglu_bwd(interpret, res, g):
    gate, up, w = res
    _, vjp = jax.vjp(swiglu_matmul_ref, gate, up, w)
    return vjp(g.astype(gate.dtype))


_swiglu.defvjp(_swiglu_fwd, _swiglu_bwd)


def swiglu_matmul(gate: jnp.ndarray, up: jnp.ndarray, w: jnp.ndarray,
                  interpret: Optional[bool] = None) -> jnp.ndarray:
    """``(silu(gate) * up) @ w`` with the activation product kept in VMEM.

    gate/up: (..., K); w: (K, N).  Falls back to the XLA formulation for
    shapes that don't tile (K or N not 128-multiples, tiny M).
    """
    K = gate.shape[-1]
    N = w.shape[1]
    lead = gate.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    # same M < 128 policy as fused_rmsnorm: decode steps stay on XLA
    if K % 128 != 0 or N % 128 != 0 or M < 128:
        return swiglu_matmul_ref(gate.reshape(M, K), up.reshape(M, K),
                                 w).reshape(*lead, N)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    out = _swiglu(gate.reshape(M, K), up.reshape(M, K), w, bool(interpret))
    return out.reshape(*lead, N)
