"""Pallas TPU attention kernel (GQA-native).

Replaces the XLA path of ``tsue_tpu.ops.dot_product_attention`` for the
shapes this framework runs (T <= ~2k).  The XLA path materializes the
(B, Hkv, G, Tq, Tk) fp32 probabilities in HBM between its two matmul
kernels — 2 x 143 MB per layer at Llama-1B prefill dims (bs16, T=528),
measured 31.6 ms/step of the 129.5 ms single forward (24%) against a
~2 ms bandwidth/compute floor.  This kernel keeps the probabilities in
VMEM.

Grid design (the part that matters on TPU, where grid steps execute
SEQUENTIALLY on the one core): one program per (batch x kv-head) over
large query-row blocks, processing all G query heads of the group
against K/V loaded once — no jnp.repeat of K/V anywhere, and no XLA-side
transposes (blocks slice the natural (B, T, H*D) views).  A previous
revision used one program per (batch*head, 128 q rows) = 2560 tiny
programs whose per-program fixed cost made it a wash against XLA; this
layout runs ~128 programs with ~20x more MXU work each.

Training still differentiates through attention: ``flash_attention`` is a
``jax.custom_vjp`` whose backward recomputes with the XLA formulation
(GQA-aware, from tsue_tpu.ops.attention; correct, and the bwd was
HBM-bound either way).  Memory-wise the kernel remains what lets the
full-backward 1B regimes fit on one 16 GB chip (no saved logit residuals;
see tests/test_flash.py).

Kernel-shape policy per the pallas guide: last dim D=64 rides as the
minor-most dim of (8,128)-tiled fp32 blocks; row blocks sized so the fp32
logits stay under ~6 MB of VMEM; edge blocks are handled by pallas
clipping with mask arithmetic on global row indices.

Multi-chip: the forward registers GSPMD partitioning rules
(``_partitioned_fwd`` below) — batch and kv-heads shard (the Megatron TP
dims), seq/head_dim/GQA-groups replicate, and each shard runs this very
kernel on its local slice with zero collectives inside attention.  Mesh
paths (parallel/, serve) therefore keep the single-chip attention policy
instead of pinning the XLA formulation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _causal_valid(valid_k, block_q, tq, tk, row0):
    """(1, Tk) key-validity -> (BQ, Tk) with the causal triangle applied;
    diagonal offset matches jnp.tril(k=Tk-Tq)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 1)
    return valid_k & (cols <= rows + (tk - tq))


def _softmax_attend(qg, k, v, valid, scale, out_dtype):
    """(BQ, D) x (Tk, D) -> (BQ, D): fp32 logits/softmax in VMEM only."""
    logits = jax.lax.dot_general(
        qg, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (BQ, Tk)
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(s, 1e-30)
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def _rope_2d(x, cos, sin):
    """Llama rotary embedding on (rows, D) with (rows, D/2) f32 cos/sin;
    f32 math then cast back, bit-matching models.llama.apply_rope."""
    h = x.shape[-1] // 2
    x1 = x[:, :h].astype(jnp.float32)
    x2 = x[:, h:].astype(jnp.float32)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def _gqa_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float,
                is_causal: bool, block_q: int, tq: int, tk: int,
                groups: int, head_dim: int):
    ir = pl.program_id(2)
    k = k_ref[0, 0]                                # (Tk, D)
    v = v_ref[0, 0]
    valid = mask_ref[0] > 0                        # (1, Tk)
    if is_causal:
        valid = _causal_valid(valid, block_q, tq, tk, ir * block_q)
    else:
        valid = jnp.broadcast_to(valid, (block_q, tk))
    D = head_dim
    for g in range(groups):                        # static unroll
        out_ref[0, :, g * D:(g + 1) * D] = _softmax_attend(
            q_ref[0, :, g * D:(g + 1) * D], k, v, valid, scale,
            out_ref.dtype)


def _gqa_rope_kernel(q_ref, k_ref, v_ref, mask_ref, cq_ref, sq_ref,
                     ck_ref, sk_ref, out_ref, *, scale: float,
                     is_causal: bool, block_q: int, tq: int, tk: int,
                     groups: int, head_dim: int):
    """_gqa_kernel with the rotary embedding applied in VMEM: q/k arrive
    un-roped, cos/sin ride as tiny (rows, D/2) f32 blocks.  Keeps the
    rope's f32 intermediates out of HBM entirely (measured ~10 ms/step of
    f32 copies + lane split/concat churn in the XLA prefill)."""
    ir = pl.program_id(2)
    ck, sk = ck_ref[0], sk_ref[0]                  # (Tk, D/2)
    k = _rope_2d(k_ref[0, 0], ck, sk)              # (Tk, D)
    v = v_ref[0, 0]
    valid = mask_ref[0] > 0
    if is_causal:
        valid = _causal_valid(valid, block_q, tq, tk, ir * block_q)
    else:
        valid = jnp.broadcast_to(valid, (block_q, tk))
    D = head_dim
    cq, sq = cq_ref[0], sq_ref[0]                  # (BQ, D/2)
    for g in range(groups):                        # static unroll
        qg = _rope_2d(q_ref[0, :, g * D:(g + 1) * D], cq, sq)
        out_ref[0, :, g * D:(g + 1) * D] = _softmax_attend(
            qg, k, v, valid, scale, out_ref.dtype)


def _folded_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float,
                   is_causal: bool, block_q: int, tq: int, tk: int):
    ir = pl.program_id(1)
    valid = mask_ref[0] > 0                        # (1, Tk)
    if is_causal:
        valid = _causal_valid(valid, block_q, tq, tk, ir * block_q)
    else:
        valid = jnp.broadcast_to(valid, (block_q, tk))
    out_ref[0] = _softmax_attend(q_ref[0], k_ref[0], v_ref[0], valid,
                                 scale, out_ref.dtype)


def _block_q(tq: int, tk: int) -> int:
    """Largest 128-multiple q block whose fp32 logits fit ~6 MB VMEM."""
    cap = max(128, (6 * 2 ** 20 // (4 * tk)) // 128 * 128)
    return min(max(tq, 8), cap)


def rope_bthd(x, cos, sin):
    """Rotary embedding on (B, T, H, D) given (B, T, D/2) f32 cos/sin —
    the same math as models.llama.apply_rope with precomputed angles."""
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s],
                           axis=-1).astype(x.dtype)


def _flash_fwd_impl(q, k, v, mask, cos, sin, scale: float, is_causal: bool,
                    interpret: bool):
    """q: (B, Tq, Hq, D); k/v: (B, Tk, Hkv, D) with Hkv | Hq (GQA-native —
    no head repetition); mask: (B, Tk) int32 key-validity.

    Two layouts, chosen by Mosaic's block-divisibility rules (last two
    block dims divisible by (8, 128) or equal to the array dims):

    - group-lane path (Llama: G*D = 256): q/out keep their natural
      (B, Tq, Hq*D) views (the H,D collapse is a free bitcast); each grid
      program block-slices one kv head's G*D lane range and loops the G
      query heads as in-kernel lane slices, each a (BQ, D) x (D, Tk) MXU
      matmul.  No XLA-side transpose of q/out (a prior revision's
      (B*Hkv, G*Tq, D) relayout cost ~5 ms/step in copies); only the
      small K/V (8.6 MB at Llama prefill dims) are transposed.
    - folded path (small d_model encoders, where G*D < 128 lanes): K/V
      repeated to Hq heads, heads folded into the batch axis, full-array
      (Tq, D)/(Tk, D) blocks.
    """
    B, Tq, Hq, D = q.shape
    Tk, Hkv = k.shape[1], k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    BQ = _block_q(Tq, Tk)
    # inside a shard_map region the out aval must declare its manual
    # axes (check_vma); outside, vma is empty and this is the plain SDS
    vma = _vma(q, k, v, mask, cos, sin)

    def _sds(shape, dtype):
        return (jax.ShapeDtypeStruct(shape, dtype, vma=vma) if vma
                else jax.ShapeDtypeStruct(shape, dtype))
    cost = pl.CostEstimate(
        flops=4 * B * Hq * Tq * Tk * D,
        bytes_accessed=(2 * B * Hq * Tq * D + 2 * B * Hkv * Tk * D) * 2,
        transcendentals=B * Hq * Tq * Tk)

    if (G * D) % 128 == 0 and (BQ % 8 == 0 or BQ == Tq):
        kh = jnp.moveaxis(k, 2, 1)                 # (B, Hkv, Tk, D)
        vh = jnp.moveaxis(v, 2, 1)
        operands = [q.reshape(B, Tq, Hq * D), kh, vh, mask[:, None, :]]
        in_specs = [
            pl.BlockSpec((1, BQ, G * D), lambda b, h, ir: (b, ir, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, ir: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, ir: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk), lambda b, h, ir: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        kern = _gqa_kernel
        if cos is not None:
            assert Tq == Tk, "in-kernel rope assumes self-attention"
            kern = _gqa_rope_kernel
            half = D // 2
            q_rows = pl.BlockSpec((1, BQ, half), lambda b, h, ir: (b, ir, 0),
                                  memory_space=pltpu.VMEM)
            k_rows = pl.BlockSpec((1, Tk, half), lambda b, h, ir: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
            # cos/sin each passed twice: q-row blocks and full-Tk blocks
            operands += [cos, sin, cos, sin]
            in_specs += [q_rows, q_rows, k_rows, k_rows]
        out = pl.pallas_call(
            functools.partial(kern, scale=scale,
                              is_causal=is_causal, block_q=BQ, tq=Tq,
                              tk=Tk, groups=G, head_dim=D),
            grid=(B, Hkv, pl.cdiv(Tq, BQ)),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, BQ, G * D),
                                   lambda b, h, ir: (b, ir, h),
                                   memory_space=pltpu.VMEM),
            out_shape=_sds((B, Tq, Hq * D), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(*operands)
        return out.reshape(B, Tq, Hq, D)

    if cos is not None:            # folded path: pre-apply the rope
        q = rope_bthd(q, cos, sin)
        k = rope_bthd(k, cos, sin)
    if Hkv != Hq:
        k = jnp.repeat(k, G, axis=2)
        v = jnp.repeat(v, G, axis=2)
    qh = jnp.moveaxis(q, 2, 1).reshape(B * Hq, Tq, D)
    kh = jnp.moveaxis(k, 2, 1).reshape(B * Hq, Tk, D)
    vh = jnp.moveaxis(v, 2, 1).reshape(B * Hq, Tk, D)
    maskh = jnp.repeat(mask, Hq, axis=0)[:, None, :]   # (B*Hq, 1, Tk)
    out = pl.pallas_call(
        functools.partial(_folded_kernel, scale=scale, is_causal=is_causal,
                          block_q=BQ, tq=Tq, tk=Tk),
        grid=(B * Hq, pl.cdiv(Tq, BQ)),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda bh, ir: (bh, ir, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda bh, ir: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda bh, ir: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk), lambda bh, ir: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda bh, ir: (bh, ir, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_sds((B * Hq, Tq, D), q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(qh, kh, vh, maskh)
    return jnp.moveaxis(out.reshape(B, Hq, Tq, D), 1, 2)


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale: float, is_causal: bool, interpret: bool,
                     has_rope: bool, groups: int):
    """GSPMD-partitionable wrapper around the forward kernel.

    ``pallas_call`` lowers to a custom call the SPMD partitioner cannot
    see through — without rules it would all-gather every operand to
    full shape on every device.  Attention is trivially parallel over
    batch and (GQA-grouped) heads, exactly the dims Megatron TP shards
    (parallel/sharding.py splits q/k/v_proj outputs head-major), so this
    registers the kernel with ``jax.experimental.custom_partitioning``:

    - Shardy rule ``b s (h g) d, b t h d, b t h d, b t[, rope] ->
      b s (h g) d``: batch ``b`` and kv-head ``h`` shard freely; seq,
      head_dim and the per-kv-head group factor ``g`` are
      need_replication (softmax rows and GQA groups must stay whole);
    - the GSPMD-callback fallback sanitizes the suggested shardings to
      the same policy (head splits must divide Hkv) and the partitioner
      reshards operands to match;
    - the per-shard lowering is this very kernel on local shapes — a
      head-split shard sees (Hq/n, Hkv/n) with the group count G intact.

    Multi-chip mesh paths (parallel/, serve) therefore run the flash
    kernel per shard with zero collectives inside attention.  Verified
    vs the unsharded kernel (bitwise) with an all-gather-free HLO on the
    8-device CPU mesh in tests/test_flash.py.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    if has_rope:
        def impl(q, k, v, mask, cos, sin):
            return _flash_fwd_impl(q, k, v, mask, cos, sin, scale,
                                   is_causal, interpret)
    else:
        def impl(q, k, v, mask):
            return _flash_fwd_impl(q, k, v, mask, None, None, scale,
                                   is_causal, interpret)
    fn = custom_partitioning(impl)

    def _axis_size(mesh, ax):
        axes = ax if isinstance(ax, tuple) else (ax,)
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        return n

    def _sanitize(mesh, q_sharding, hkv):
        """Batch axes ride q dim0; head axes ride q dim2 when the shard
        count divides Hkv (GQA groups must stay whole per shard)."""
        spec = getattr(q_sharding, "spec", None) or P()
        b = spec[0] if len(spec) > 0 else None
        h = spec[2] if len(spec) > 2 else None
        if h is not None and hkv % _axis_size(mesh, h) != 0:
            h = None
        return b, h

    def partition(mesh, arg_shapes, result_shape):
        b, h = _sanitize(mesh, arg_shapes[0].sharding,
                         arg_shapes[1].shape[2])
        qkv = NamedSharding(mesh, P(b, None, h, None))
        m = NamedSharding(mesh, P(b, None))
        rope_sh = NamedSharding(mesh, P(b, None, None))
        args = (qkv, qkv, qkv, m) + ((rope_sh, rope_sh) if has_rope
                                     else ())
        return mesh, impl, NamedSharding(mesh, P(b, None, h, None)), args

    def infer(mesh, arg_shapes, shape):
        b, h = _sanitize(mesh, arg_shapes[0].sharding,
                         arg_shapes[1].shape[2])
        return NamedSharding(mesh, P(b, None, h, None))

    rope_rule = ", b s e, b s e" if has_rope else ""
    if groups == 1:
        # MHA (Hq == Hkv): a plain head factor — SDY rejects size-1
        # compound factors
        rule = (f"b s h d, b t h d, b t h d, b t{rope_rule} -> b s h d")
        nr = ("s", "d", "t") + (("e",) if has_rope else ())
        kw = {}
    else:
        # GQA: q's head dim = (kv-head h) x (group g); h shards with
        # k/v's head dim, g must stay whole per shard
        rule = (f"b s (h g) d, b t h d, b t h d, b t{rope_rule} "
                "-> b s (h g) d")
        nr = ("s", "g", "d", "t") + (("e",) if has_rope else ())
        kw = {"g": groups}
    fn.def_partition(partition, infer_sharding_from_operands=infer,
                     sharding_rule=rule, need_replication_factors=nr,
                     **kw)
    return fn


def _vma(*arrays):
    """Union of the operands' varying-manual-axes (nonempty only inside
    a ``shard_map`` region; jax>=0.8 tracks it on the aval)."""
    out = frozenset()
    for a in arrays:
        if a is None:
            continue
        try:
            out = out | jax.typeof(a).vma
        except (AttributeError, TypeError):
            return frozenset()
    return out


def _fwd_dispatch(q, k, v, mask, cos, sin, scale, is_causal, interpret):
    """Single-device runtimes (the benched one-chip TPU) take the raw
    kernel.  ANY multi-device runtime — sharded or not, including plain
    single-device jits on the 8-device CPU test mesh — routes through the
    custom_partitioning registration so GSPMD can shard it (the wrapper
    is a device_count heuristic, not a sharding check: operand shardings
    are unknown at trace time here; on unsharded programs the partitioner
    keeps everything replicated and the per-shard lowering is the same
    kernel on full shapes).  EXCEPT inside a ``shard_map`` manual region
    (nonempty operand vma), where there is no partitioner: the raw kernel
    runs on the caller's already-local shapes (e.g. the pipeline stage
    bodies, parallel/pipeline.py)."""
    if jax.device_count() > 1 and not _vma(q, k, v, mask, cos, sin):
        fn = _partitioned_fwd(scale, is_causal, interpret,
                              cos is not None, q.shape[2] // k.shape[2])
        args = (q, k, v, mask) + ((cos, sin) if cos is not None else ())
        return fn(*args)
    return _flash_fwd_impl(q, k, v, mask, cos, sin, scale, is_causal,
                           interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _flash(q, k, v, mask, cos, sin, scale, is_causal, interpret):
    return _fwd_dispatch(q, k, v, mask, cos, sin, scale, is_causal,
                         interpret)


def _flash_fwd(q, k, v, mask, cos, sin, scale, is_causal, interpret):
    return _fwd_dispatch(q, k, v, mask, cos, sin, scale, is_causal,
                         interpret), (q, k, v, mask, cos, sin)


def _flash_bwd(scale, is_causal, interpret, res, g):
    q, k, v, mask, cos, sin = res
    from tsue_tpu.ops.attention import _xla_attention

    def ref(q_, k_, v_):
        if cos is not None:
            q_ = rope_bthd(q_, cos, sin)
            k_ = rope_bthd(k_, cos, sin)
        return _xla_attention(q_, k_, v_, mask.astype(bool), is_causal,
                              scale)

    _, vjp = jax.vjp(ref, q, k, v)
    # upstream may hand a higher-precision cotangent than the bf16 output
    dq, dk, dv = vjp(g.astype(v.dtype))
    return dq, dk, dv, None, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                    is_causal: bool = False, scale: Optional[float] = None,
                    rope: Optional[tuple] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Drop-in for the XLA path of dot_product_attention.  GQA-native:
    k/v keep their Hkv heads (Hkv must divide Hq).  ``rope=(cos, sin)``
    ((B, T, D/2) f32 each) applies the rotary embedding to q/k inside the
    kernel (VMEM) instead of as a separate HBM pass; non-kernel fallbacks
    pre-apply it with identical math.  4-D masks fall back to XLA."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    cos, sin = rope if rope is not None else (None, None)
    if mask is not None and mask.ndim != 2:
        from tsue_tpu.ops.attention import _xla_attention
        if cos is not None:
            q = rope_bthd(q, cos, sin)
            k = rope_bthd(k, cos, sin)
        return _xla_attention(q, k, v, mask, is_causal, scale)
    B, Tk = k.shape[0], k.shape[1]
    if mask is None:
        mask = jnp.ones((B, Tk), jnp.int32)
    mask = mask.astype(jnp.int32)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return _flash(q, k, v, mask, cos, sin, float(scale), bool(is_causal),
                  bool(interpret))
