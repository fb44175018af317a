"""Int8 weight-only decode: halve the HBM weight stream of the sampler.

The decode hot loop is weight-streaming-bound: every step reads the whole
2.62 GB bf16 Llama weight set for a few rows of activations (PARITY.md
decode roofline — ``steps/s <= HBM_BW / bytes_per_step``).  Weight-only
int8 halves those bytes: kernels are stored per-output-channel symmetric
int8 (``w8 * scale``), streamed as int8, and dequantized in VMEM on the
way into the bf16 MXU dot.  Activations stay bf16 — at decode M (= batch
<= 64) the matmuls are far below the arithmetic-intensity ridge, so the
win is pure bandwidth.

Plumbing is a flax variable collection: :func:`quantize_llama_params`
builds a ``"quant"`` tree mirroring the Llama projection modules (plus
the tied/untied LM head at the ``LlamaForCausalLM`` scope), and
:func:`with_quantized_decode` attaches it to a ``variables`` dict.  The
modules (``models.llama.LoRADense`` / ``logits_from_hidden``) use the
int8 path only when BOTH the collection is attached AND the call site
passes ``quant_ok=True`` — which only the fusion decode methods
(``decode_step`` / the speculative ``decode_window``) and generation's
first-token ``logits_from_hidden`` do.  Prefill and training keep the
bf16 weights untouched even with the collection attached, so
quality-sensitive paths are unchanged and the int8 copy is decode-only.

This is an OPT-IN serving mode (``serve.Predictor(quantize_decode=True)``,
``bench.py`` int8 decode detail): int8 logits shift sampled draws
slightly; the logit error is pinned by tests/test_quant.py.

No reference equivalent (the reference serves fp32 HF generate,
ref scripts/train.py:606-654); this is the TPU-native serving lever.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PROJ = {"q_proj", "k_proj", "v_proj", "o_proj",
         "gate_proj", "up_proj", "down_proj"}

# "auto" | "xla" | "pallas": which int8-matmul formulation to trace.
# "auto" (default) = the VMEM-dequant Pallas kernel when shapes tile
# (the measured single-chip win); "xla" = the dequant-fused XLA dot;
# "pallas" = force the kernel (raises on non-tiling shapes).  A
# ContextVar so a scoped switch on one server thread cannot flip a
# concurrent trace on another (scripts/serve.py HTTP mode).
import contextvars

_INT8_IMPL: contextvars.ContextVar = contextvars.ContextVar(
    "tsue_int8_impl", default=os.environ.get("TSUE_INT8", "auto"))


class int8_impl:
    """Scoped formulation switch, same contract as
    :class:`tsue_tpu.ops.attention.attention_impl`: consulted at TRACE
    time — build jitted callables inside the scope.  Per-context
    (contextvars), so concurrent traces on other threads are unaffected."""

    def __init__(self, name: str):
        assert name in ("auto", "xla", "pallas")
        self.name = name

    def __enter__(self):
        self._token = _INT8_IMPL.set(self.name)
        return self

    def __exit__(self, *exc):
        _INT8_IMPL.reset(self._token)
        return False


def quantize_weight(w: jnp.ndarray, axis: int = 0):
    """Symmetric per-channel int8: ``w ~ w8 * scale`` with the scale per
    output channel (``axis`` = the contraction axis being reduced over).
    Returns (w8 int8, scale f32 of shape w.shape[1-axis])."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(a, 1e-8) / 127.0
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                  -127, 127).astype(jnp.int8)
    return w8, scale.reshape(-1)


def int8_matmul_ref(x: jnp.ndarray, w8: jnp.ndarray, scale: jnp.ndarray,
                    out_dtype=None) -> jnp.ndarray:
    """XLA formulation: dequant-to-x.dtype matmul, f32 accumulation, scale
    applied per output channel after the dot (same math as the kernel)."""
    y = jnp.dot(x, w8.astype(x.dtype),
                preferred_element_type=jnp.float32) * scale
    return y.astype(out_dtype or x.dtype)


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    y = jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(x_ref.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * s_ref[0]
    o_ref[...] = y.astype(o_ref.dtype)


def _int8_matmul_impl(x2, w8, scale, out_dtype, interpret: bool):
    M, K = x2.shape
    N = w8.shape[1]
    # one grid step per N block; x rides whole (M <= 128 rows, K <= 8k:
    # <= 2 MB bf16), w8 tile sized to ~4 MB of VMEM
    BN = min(N, max(512, 4 * 2 ** 20 // K // 128 * 128))
    return pl.pallas_call(
        _int8_kernel,
        grid=(pl.cdiv(N, BN),),
        in_specs=[
            pl.BlockSpec((M, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=K * N + M * K * x2.dtype.itemsize
            + M * N * jnp.dtype(out_dtype).itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x2, w8, scale.reshape(1, N))


@functools.lru_cache(maxsize=None)
def _partitioned_int8_matmul(out_dtype_name: str, interpret: bool):
    """GSPMD-partitionable wrapper around the int8-matmul kernel (the
    ops/flash.py ``_partitioned_fwd`` pattern — see its docstring for the
    rationale: pallas_call is an opaque custom call to the SPMD
    partitioner).

    Shardy rule ``m k, k n, u n -> m n``: the row dim ``m`` (decode
    batch) and the output-channel dim ``n`` (Megatron column-parallel —
    exactly how parallel/sharding.py splits q/k/v/gate/up projections)
    shard freely; the contraction ``k`` and the scale's unit dim are
    need_replication.  ``n`` splits are sanitized to keep the per-shard
    width a 128 multiple (the kernel's tiling precondition).  Per-shard
    lowering = this very kernel on local shapes, so the multi-chip serve
    path (parallel/serve_tp.py) keeps the measured single-chip kernel win
    instead of pinning the XLA formulation."""
    import jax
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    out_dtype = jnp.dtype(out_dtype_name)

    def impl(x2, w8, scale1n):
        return _int8_matmul_impl(x2, w8, scale1n.reshape(-1), out_dtype,
                                 interpret)

    fn = custom_partitioning(impl)

    def _axis_size(mesh, ax):
        axes = ax if isinstance(ax, tuple) else (ax,)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        return n

    def _sanitize(mesh, arg_shapes):
        xs = getattr(arg_shapes[0].sharding, "spec", None) or P()
        ws = getattr(arg_shapes[1].sharding, "spec", None) or P()
        m = xs[0] if len(xs) > 0 else None
        n = ws[1] if len(ws) > 1 else None
        N = arg_shapes[1].shape[1]
        if n is not None and (N // _axis_size(mesh, n)) % 128 != 0:
            n = None
        return m, n

    def partition(mesh, arg_shapes, result_shape):
        m, n = _sanitize(mesh, arg_shapes)
        args = (NamedSharding(mesh, P(m, None)),
                NamedSharding(mesh, P(None, n)),
                NamedSharding(mesh, P(None, n)))
        return mesh, impl, NamedSharding(mesh, P(m, n)), args

    def infer(mesh, arg_shapes, shape):
        m, n = _sanitize(mesh, arg_shapes)
        return NamedSharding(mesh, P(m, n))

    fn.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule="m k, k n, u n -> m n",
                     need_replication_factors=("k", "u"))
    return fn


def _vma(*arrays):
    """Union of the operands' varying-manual-axes (nonempty only inside a
    ``shard_map`` manual region — ops/flash.py convention)."""
    out = frozenset()
    for a in arrays:
        try:
            out = out | jax.typeof(a).vma
        except (AttributeError, TypeError):
            return frozenset()
    return out


def int8_matmul(x: jnp.ndarray, w8: jnp.ndarray, scale: jnp.ndarray,
                out_dtype=None, interpret: Optional[bool] = None
                ) -> jnp.ndarray:
    """``(x @ (w8 * scale))`` with w8 streamed as int8 and dequantized in
    VMEM.  x: (..., K) with few rows (decode); w8: (K, N) int8; scale:
    (N,) f32.  Forward-only (no VJP — decode never differentiates).
    Under "auto", falls back to the XLA formulation for non-tiling
    shapes; an explicit ``int8_impl("pallas")`` raises on them instead
    (the option forces the kernel — it is never a silent alias of
    "auto").  On multi-device runtimes the kernel routes through its
    ``custom_partitioning`` registration (``_partitioned_int8_matmul``)
    so GSPMD programs shard it instead of all-gathering."""
    out_dtype = out_dtype or x.dtype
    K = x.shape[-1]
    N = w8.shape[1]
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    impl = _INT8_IMPL.get()
    tiles = K % 128 == 0 and N % 128 == 0 and M <= 128
    if impl == "pallas" and not tiles:
        raise ValueError(
            f"int8_impl('pallas') forced the kernel but the shape does "
            f"not tile: need K%128==0, N%128==0, M<=128 (got M={M}, "
            f"K={K}, N={N})")
    if impl == "xla" or not tiles:
        return int8_matmul_ref(x.reshape(M, K), w8, scale,
                               out_dtype).reshape(*lead, N)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    x2 = x.reshape(M, K)
    if jax.device_count() > 1 and not _vma(x2, w8, scale):
        fn = _partitioned_int8_matmul(jnp.dtype(out_dtype).name,
                                      bool(interpret))
        out = fn(x2, w8, scale.reshape(1, N))
    else:
        out = _int8_matmul_impl(x2, w8, scale, out_dtype, bool(interpret))
    return out.reshape(*lead, N)


def quantize_llama_params(params) -> dict:
    """Build the ``"quant"`` collection mirroring a params tree.

    Every ``kernel`` of a Llama projection module (q/k/v/o/gate/up/down)
    gets ``w8``/``scale`` at the same path; the LM head — the tied
    ``model/embed_tokens/embedding`` table or an untied ``lm_head/kernel``
    — gets ``lm_head_w8``/``lm_head_scale`` at the owning
    ``LlamaForCausalLM`` scope (two levels up from ``embed_tokens``).
    Works on any enclosing tree (the full TSUE/MLLM params included).
    """
    def walk(node, out, parent=""):
        placed = False
        for k, v in node.items():
            if isinstance(v, dict):
                # anchor on the Llama block structure (layer_i/attn/q_proj,
                # layer_i/mlp/gate_proj): other modules reusing a
                # projection name (e.g. the MLLM's vision q_proj Dense,
                # models/fusion.py:43) never consult the collection and
                # must not get dead int8 copies
                if k in _PROJ and "kernel" in v and parent in ("attn",
                                                              "mlp"):
                    w8, s = quantize_weight(v["kernel"], axis=0)
                    out[k] = {"w8": w8, "scale": s}
                    placed = True
                    continue
                sub = {}
                if walk(v, sub, k):
                    out[k] = sub
                    placed = True
                if k == "model" and "lm_head" not in node \
                        and "embed_tokens" in v \
                        and "embedding" in v.get("embed_tokens", {}):
                    emb = v["embed_tokens"]["embedding"]     # (V, D)
                    w8, s = quantize_weight(emb, axis=1)     # per-row
                    out["lm_head_w8"] = jnp.swapaxes(w8, 0, 1)  # (D, V)
                    out["lm_head_scale"] = s
                    placed = True
                if k == "lm_head" and "kernel" in v:         # untied
                    w8, s = quantize_weight(v["kernel"], axis=0)
                    out["lm_head_w8"] = w8
                    out["lm_head_scale"] = s
                    placed = True
        return placed

    quant = {}
    walk(params, quant)
    return quant


def with_quantized_decode(variables: dict) -> dict:
    """Return ``variables`` with the int8 decode collection attached.
    Tied-embedding note: the untransposed bf16 table stays in ``params``
    for the (tiny-traffic) token-embedding gather; only the V-wide LM-head
    matmul and the projection streams go int8."""
    quant = jax.jit(quantize_llama_params)(variables["params"])
    return {**variables, "quant": quant}
