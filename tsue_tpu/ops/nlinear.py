"""Fused NLinear Pallas kernel.

NLinear = subtract-last -> per-channel Linear(T_in->T_out) -> add-last
(ref scripts/train.py:688-716/767-782).  The XLA path is one einsum plus
two elementwise ops over HBM; the Pallas kernel fuses all three so the
(B, C, T) activations make a single VMEM round-trip.  Shapes here are tiny
(C=64, T<=30) so this is a fusion/latency win, not a FLOPs one — the XLA
path remains the default and the reference for parity tests.

custom_vjp: backward uses the straightforward XLA formulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def nlinear_ref(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                broadcast_last: bool = True) -> jnp.ndarray:
    """XLA reference: x (B,C,Ti), w (C,Ti,To), b (C,To) -> (B,C,To)."""
    last = x[:, :, -1:]
    out = jnp.einsum("bct,cto->bco", x - last, w,
                     preferred_element_type=jnp.float32) + b
    return out + last


def _nlinear_kernel(x_ref, w_ref, b_ref, out_ref):
    x = x_ref[0]                       # (C, Ti)
    last = x[:, -1:]                   # (C, 1)
    xs = x - last
    # per-channel matmul: (C, Ti) x (C, Ti, To) -> (C, To)
    out = jax.lax.dot_general(
        xs, w_ref[:], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[0] = (out + b_ref[:] + last).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def nlinear_fused(x, w, b, interpret=False):
    B, C, Ti = x.shape
    To = w.shape[2]
    return pl.pallas_call(
        _nlinear_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, Ti), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Ti, To), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, To), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, To), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, To), x.dtype),
        interpret=interpret,
    )(x, w, b)


def _fwd(x, w, b, interpret):
    return nlinear_fused(x, w, b, interpret), (x, w, b)


def _bwd(interpret, res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x_, w_, b_: nlinear_ref(x_, w_, b_), x, w, b)
    return vjp(g)


nlinear_fused.defvjp(_fwd, _bwd)
