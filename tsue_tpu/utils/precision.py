"""Mixed-precision helpers.

Policy (SURVEY.md §7 numerics): bf16 params/matmuls on the MXU, fp32 for
RMSNorm/softmax/RoPE internals (the modules upcast) and fp32 losses.
The reference's fp16 AMP + GradScaler (diffusion only,
ref modify_scripts/capstone_project.py:1223-1252) has no bf16 analogue —
bf16's exponent range needs no loss scaling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(params, dtype=jnp.bfloat16):
    """Cast float params to ``dtype`` (int/bool leaves untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, params)


def cast_to_fp32(params):
    return cast_params(params, jnp.float32)
