"""Fused LoRA matmul Pallas kernel.

Computes ``y = x W + (alpha/r) (x A) B`` in one kernel without writing the
intermediate ``xA`` (B, r) or the adapter delta to HBM (SURVEY.md §7 kernel
list).  The XLA path in tsue_tpu.models.llama.LoRADense is the default and
parity reference; this kernel is the building block for a fully fused
serving path.

Grid: (M/BM,) over rows of the flattened batch; W column-blocked inside the
kernel loop would be needed for very wide layers — at Llama-1B widths
(in=2048, out<=8192) a full W tile is 2048x8192 bf16 = 32 MB > VMEM, so we
block over the output dim in the grid too.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def lora_ref(x, w, a, b, scale: float):
    """XLA reference: x (M,K), w (K,N), a (K,r), b (r,N)."""
    base = jnp.dot(x, w, preferred_element_type=jnp.float32)
    delta = jnp.dot(jnp.dot(x, a, preferred_element_type=jnp.float32),
                    b, preferred_element_type=jnp.float32)
    return (base + scale * delta).astype(x.dtype)


def _lora_kernel(x_ref, w_ref, a_ref, b_ref, out_ref, *, scale):
    x = x_ref[:]
    base = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    xa = jnp.dot(x, a_ref[:], preferred_element_type=jnp.float32)
    delta = jnp.dot(xa.astype(x.dtype), b_ref[:],
                    preferred_element_type=jnp.float32)
    out_ref[:] = (base + scale * delta).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lora_matmul(x, w, a, b, scale, interpret=False):
    """x (M,K) @ [w (K,N) + scale * a (K,r) b (r,N)] -> (M,N)."""
    M, K = x.shape
    N = w.shape[1]
    BM = min(256, M) if M % 8 == 0 or M >= 8 else M
    BN = min(1024, N)
    grid = (pl.cdiv(M, BM), pl.cdiv(N, BN))
    return pl.pallas_call(
        functools.partial(_lora_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, a.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b.shape[0], BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
    )(x, w, a, b)


def _fwd(x, w, a, b, scale, interpret):
    return lora_matmul(x, w, a, b, scale, interpret), (x, w, a, b)


def _bwd(scale, interpret, res, g):
    x, w, a, b = res
    _, vjp = jax.vjp(lambda x_, w_, a_, b_: lora_ref(x_, w_, a_, b_, scale),
                     x, w, a, b)
    return vjp(g)


lora_matmul.defvjp(_fwd, _bwd)
