"""Multi-chip serving: TP(+DP) sharded generation via GSPMD.

The reference serves from one GPU (HF ``generate`` over a single
process, ref scripts/train.py:616-654); this module is the TPU-native
scale-out path for models that outgrow one chip (or batches that
outgrow one chip's decode throughput): place the weights ONCE with the
Megatron-style partition rules of :mod:`tsue_tpu.parallel.sharding`
(attention split by heads, MLP by feature, embedding by feature) over a
``("data", "model")`` mesh, shard requests over ``data``, and let XLA's
SPMD partitioner insert every collective (psum after o_proj/down_proj
contractions, psum for the V-wide LM-head logits) over ICI.  There is
no hand-written collective and no model change: the production
generator (eval/generation.py) is traced as-is with sharded operands.

Attention keeps its single-chip policy: the flash kernel registers
GSPMD partitioning rules (ops/flash.py ``_partitioned_fwd`` — batch and
kv-heads shard, the TP dims), so ``TSUE_ATTENTION=auto`` serves the
Pallas prefill per shard and the XLA Tq=1 decode exactly as on one chip
(PARITY.md decode profile).  Remaining v1 restrictions, measured or
mechanical rather than fundamental:

Every Pallas kernel on the serve path now carries GSPMD partition
rules (r5, the ops/flash.py pattern), so nothing is pinned at trace
time anymore: int8 *weights* (``quantize_decode=True``) shard like
their bf16 twins (sharding.py quant rules) and the ambient ``auto``
policy traces the VMEM-dequant kernel through its
``custom_partitioning`` registration (``ops/quant.py
_partitioned_int8_matmul`` — output-channel dim shards with TP); the
int8 *KV cache* (``quantize_kv=True``) defaults to the XLA
dequant-fused attention (the measured winner, ops/kv_quant.py) whose
int8/scale arrays shard over "data", and an explicit
``kv_attn_impl("kernel")`` scope is mesh-legal via
``_partitioned_attend_int8``; the fused LM-head+top-k kernel
(``fused_head``) shards over batch via ``_partitioned_lmhead_topk``.

Correctness: pure-DP sharding (model_parallel=1) computes each batch row
entirely on one device — bitwise the single-device decode.  TP splits
the contractions, so partial-sum order differs from the single-device
dot: logits agree to matmul-reduction tolerance and greedy/sampled draws
can flip only where the single-device chain was already within one ulp
of a tie (the standard formulation caveat, cf. eval/speculative.py).
Pinned by tests/test_serve_tp.py on the 8-device CPU mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tsue_tpu.ops.sampling import SamplingConfig
from tsue_tpu.parallel.sharding import shard_params


def make_sharded_generate_fn(mllm, variables, cfg: SamplingConfig,
                             max_new_tokens: int, prompt_len: int,
                             eos_id: int, mesh: Mesh, pad_id: int = 0,
                             fsdp: bool = False,
                             fsdp_min_size: Optional[int] = None,
                             early_exit_chunk: Optional[int] = 8,
                             quantize_decode: bool = False,
                             quantize_kv: bool = False,
                             speculative: bool = False,
                             spec_window: int = 8,
                             fused_head: bool = False):
    """Build a multi-chip generator: ``(vision, prompt_ids, prompt_mask,
    rng) -> (B, max_new_tokens) int32`` with weights TP-sharded over
    ``mesh``'s "model" axis and the batch over "data".

    ``variables`` is placed (device_put) once, here; the returned
    closure owns the sharded tree.  The batch dimension must divide the
    mesh's data axis.  ``fsdp=True`` additionally ZeRO-shards big
    replicated params over "data" (decode then all-gathers each layer's
    weights on use — trades latency for capacity; only worth it when
    the replicated weights don't fit).

    ``quantize_decode=True``: int8 weight-only decode under TP — the
    quant collection is built BEFORE placement (scales identical to the
    single-device quantization, then each w8/scale leaf shards like its
    bf16 kernel twin — sharding.py quant rules).  The ambient ``auto``
    policy applies per shard exactly as on one chip: the VMEM-dequant
    Pallas kernel where shapes tile (now GSPMD-partitionable,
    ``ops/quant.py _partitioned_int8_matmul``), the dequant-fused XLA
    dot elsewhere.  Per shard the decode weight stream still halves,
    the same bandwidth argument as single-chip (ops/quant.py).

    ``quantize_kv=True``: int8 KV caches (ops/kv_quant.py) — the
    default formulation is the XLA dequant-fused attention (the
    measured winner), whose int8/scale arrays shard over "data" like
    the bf16 cache; prefill stays exact, the per-shard cache stream
    halves.

    ``speculative=True``: prompt-lookup speculative decoding
    (eval/speculative.py, ``spec_window`` tokens scored per forward) —
    its single while_loop body is plain XLA (masked scatters, per-row
    offsets), so GSPMD partitions it like the token-at-a-time scan;
    pure-DP stays bitwise the single-device speculative decode and the
    TP caveat is unchanged (tests/test_serve_tp.py).  Per-window the
    sharded weight stream is read once for the whole window — the
    speculation and TP wins compose.

    Returns ``(generate, sharded_variables)`` — the tree is returned so
    callers can free their unsharded copy / reuse the placement.
    """
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.eval.speculative import make_speculative_generate_fn
    from tsue_tpu.ops.quant import with_quantized_decode

    if quantize_decode and "quant" not in variables:
        variables = with_quantized_decode(variables)
    kw = {} if fsdp_min_size is None else {"fsdp_min_size": fsdp_min_size}
    svars = shard_params(variables, mesh, fsdp=fsdp, **kw)
    if speculative:
        gen = make_speculative_generate_fn(
            mllm, cfg, max_new_tokens, prompt_len, eos_id=eos_id,
            pad_id=pad_id, window=spec_window, quantize_kv=quantize_kv)
    else:
        # fused_head shards over batch via the kernel's own
        # custom_partitioning registration (ops/lmhead_topk.py) — the
        # same "data"-axis layout as the rest of the decode state.
        # (Speculative decoding ignores it, as on one chip: its window
        # scorer consumes full logits.)
        gen = make_generate_fn(mllm, cfg, max_new_tokens, prompt_len,
                               eos_id=eos_id, pad_id=pad_id,
                               early_exit_chunk=early_exit_chunk,
                               quantize_kv=quantize_kv,
                               fused_head=fused_head)
    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def generate(vision, prompt_ids, prompt_mask, rng):
        B = prompt_ids.shape[0]
        n_data = mesh.shape.get("data", 1)
        if B % n_data:
            raise ValueError(f"batch {B} must divide the data axis "
                             f"({n_data})")
        vision = jax.device_put(jnp.asarray(vision), data_sh)
        prompt_ids = jax.device_put(jnp.asarray(prompt_ids), data_sh)
        prompt_mask = jax.device_put(jnp.asarray(prompt_mask), data_sh)
        rng = jax.device_put(rng, repl)
        # no trace-time pins (r5): every Pallas kernel on this path
        # carries custom_partitioning rules (flash attention, the int8
        # VMEM-dequant dot, the int8-KV kernel, the fused head), so the
        # ambient formulation policy applies per shard exactly as on
        # one chip.
        return gen(svars, vision, prompt_ids, prompt_mask, rng)

    return generate, svars
