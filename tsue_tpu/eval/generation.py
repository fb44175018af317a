"""Batched text generation: soft-prefix prefill + KV-cached sampled decode.

Capability parity with ``generate_batch`` (ref scripts/train.py:577-654) and
the distributed generation harness (ref scripts/check_generation.py:331-369):

- condition on the fused [image-tokens || prompt] embedding prefix;
- sampled decoding with temperature/top-k/top-p/no-repeat-ngram/repetition
  penalty (HF defaults of the reference: 0.9/40/0.9/3/1.2);
- early stop on EOS (per sequence), "No right-following vehicle." cutoff
  post-processing (ref scripts/train.py:648-653) and the "Answer:"
  extraction of the stage-1 harness (ref scripts/check_generation.py:203-221).

TPU-first: the whole decode is ONE jitted lax.scan over steps — no Python
autoregressive loop, no embedding monkey-patching, no per-step host syncs.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tsue_tpu.ops.sampling import SamplingConfig, process_and_sample

CUTOFF_MARKER = "No right-following vehicle."


def head_arrays(mllm, variables):
    """LM-head weight arrays for the fused sampler (ops/lmhead_topk.py):
    (tied embedding (V, D), None) or (None, (lm_head_w8, lm_head_scale))
    when the int8 ``quant`` collection is attached — resolved from the
    ``variables`` ARGUMENT inside the jitted generator, never closed
    over."""
    quant = variables.get("quant", {}).get("llama", {})
    if "lm_head_w8" in quant:
        return None, (quant["lm_head_w8"], quant["lm_head_scale"])
    if not mllm.llama.tie_word_embeddings:
        raise NotImplementedError(
            "fused_head needs the tied embedding (V, D) layout or the "
            "int8 quant collection; untied bf16 lm_head is (D, V)")
    return variables["params"]["llama"]["model"]["embed_tokens"][
        "embedding"], None


def make_generate_fn(mllm, cfg: SamplingConfig, max_new_tokens: int,
                     prompt_len: int, eos_id: int, pad_id: int = 0,
                     early_exit_chunk: Optional[int] = 8,
                     fused_head: bool = False,
                     quantize_kv: bool = False):
    """Build a jitted (variables, vision, prompt_ids, prompt_mask, rng) ->
    (B, max_new_tokens) int32 generator for fixed shapes.

    ``early_exit_chunk``: decode runs as a ``lax.while_loop`` over
    fixed-size ``lax.scan`` chunks and stops as soon as every sequence hit
    EOS — equivalent to the single-scan formulation in exact arithmetic
    (finished rows emit pad either way; the check is on-device, no host
    sync; pinned bit-identical on CPU in tests), and real generations that
    end early (the reference's answers finish well before max_new_tokens)
    skip the remaining chunks entirely.  Chunks are rebalanced to
    ceil(max_new/n_chunks) so a non-dividing chunk size wastes at most
    n_chunks-1 padded steps; worst-case overhead when nothing exits early:
    ~1% loop overhead + that padding (interleaved A/B, 1B model, v5e).
    As with any
    program-shape change, XLA may fuse the two formulations differently,
    so sampled draws can flip where ulp-level logit shifts cross a
    sampling threshold.  ``None`` recovers the single full-length scan.

    ``fused_head=True`` replaces the logits carry with a (B, D) hidden
    carry and samples through the fused LM-head+top-k Pallas kernel
    (ops/lmhead_topk.py): the head weight streams through VMEM once per
    step and the (B, V) logits are never materialized — the processors,
    top-k and draw all happen in slice space.  Semantically the plain
    chain with the kernel's documented formulation caveats (ulp-level
    matmul rounding, >88-way boundary tie spill); requires
    0 < top_k < 128 for sampled configs and a 128-multiple vocab.

    ``quantize_kv=True`` stores the decode KV cache per-token-per-head
    int8 (ops/kv_quant.py): prefill stays exact bf16 and the cache is
    quantized ONCE before the decode scan; every decode step then reads
    (and writes) half the cache bytes, dequantized in VMEM by the int8
    decode-attention kernel.  Composes with int8 weights and fused_head.
    """
    if fused_head:
        from tsue_tpu.ops.lmhead_topk import (LANES, lmhead_topk,
                                              sample_from_topk_slice,
                                              token_state_mask)
        if mllm.llama.vocab_size % LANES:
            raise ValueError("fused_head needs vocab_size % 128 == 0")
        if cfg.do_sample and not 0 < cfg.top_k < LANES:
            raise ValueError(f"fused_head needs 0 < top_k < {LANES}")
    n_img = mllm.qformer.num_query_tokens if mllm.use_vision else 0
    P = n_img + prompt_len
    chunk = early_exit_chunk or max_new_tokens
    chunk = max(1, min(chunk, max_new_tokens))     # max_new=0 -> chunk 1
    n_chunks = -(-max_new_tokens // chunk)
    if n_chunks:  # balance: ceil(max_new/n) pads at most n-1 steps total
        chunk = -(-max_new_tokens // n_chunks)
    total = n_chunks * chunk            # buffers padded to whole chunks
    cache_len = P + total
    V = mllm.llama.vocab_size
    use_mask = cfg.repetition_penalty != 1.0 or cfg.no_repeat_ngram_size > 0

    @jax.jit
    def generate(variables, vision, prompt_ids, prompt_mask, rng):
        B = prompt_ids.shape[0]
        caches, last_hidden, prefix_len, fmask = mllm.apply(
            variables, vision, prompt_ids, prompt_mask, cache_len,
            method=mllm.prefill)
        if quantize_kv:
            from tsue_tpu.ops.kv_quant import quantize_cache
            caches = quantize_cache(caches)
        if fused_head:
            head0 = last_hidden          # the hidden carry starts here
            w_head, quant_head = head_arrays(mllm, variables)
        else:
            head0 = mllm.apply(
                variables, last_hidden,
                method=lambda m, h: m.llama_mod.logits_from_hidden(
                    h, quant_ok=True))

        # token history for repetition penalty / ngram ban starts with the
        # prompt (HF sees fake_input_ids=prompt_ids, ref train.py:625)
        history = jnp.concatenate(
            [prompt_ids, jnp.full((B, total), pad_id, jnp.int32)], axis=1)
        hlen = prompt_mask.sum(axis=1).astype(jnp.int32)

        def body(carry, step):
            caches, history, hlen, head, rng, finished = carry
            rng, sub = jax.random.split(rng)
            if fused_head:
                mask = (token_state_mask(history, hlen, V, cfg)
                        if use_mask else None)
                vals, idx = lmhead_topk(head, w_head, mask,
                                        penalty=cfg.repetition_penalty,
                                        quant=quant_head)
                tok = sample_from_topk_slice(vals, idx, sub, cfg)
            else:
                tok = process_and_sample(head, sub, history, hlen, cfg)
            tok = jnp.where(finished, pad_id, tok).astype(jnp.int32)
            finished = finished | (tok == eos_id)
            history = history.at[jnp.arange(B), hlen].set(tok)
            hlen = hlen + jnp.where(finished & (tok == pad_id), 0, 1)
            new_head, caches = mllm.apply(
                variables, tok, step, prefix_len, caches, fmask, cache_len,
                method=(mllm.decode_hidden if fused_head
                        else mllm.decode_step))
            return (caches, history, hlen, new_head, rng, finished), tok

        init = (caches, history, hlen, head0, rng, jnp.zeros((B,), bool))
        if n_chunks <= 1:  # includes max_new_tokens == 0: empty scan
            _, toks = jax.lax.scan(body, init, jnp.arange(max_new_tokens))
            return jnp.swapaxes(toks, 0, 1)               # (B, max_new)

        toks0 = jnp.full((B, total), pad_id, jnp.int32)

        def chunk_cond(state):
            ci, carry, _ = state
            finished = carry[-1]
            return (ci < n_chunks) & ~jnp.all(finished)

        def chunk_body(state):
            ci, carry, toks = state
            carry, out = jax.lax.scan(body, carry,
                                      ci * chunk + jnp.arange(chunk))
            toks = jax.lax.dynamic_update_slice(
                toks, jnp.swapaxes(out, 0, 1), (0, ci * chunk))
            return ci + 1, carry, toks

        _, _, toks = jax.lax.while_loop(
            chunk_cond, chunk_body, (jnp.int32(0), init, toks0))
        return toks[:, :max_new_tokens]

    return generate


def postprocess_text(text: str, extract_answer: bool = False) -> str:
    """Cutoff + optional Answer extraction (ref train.py:648-653,
    check_generation.py:203-221)."""
    if extract_answer and "Answer:" in text:
        text = text.split("Answer:", 1)[1].strip()
    if CUTOFF_MARKER in text:
        text = text[:text.index(CUTOFF_MARKER) + len(CUTOFF_MARKER)]
    return text


def prompt_only(batch) -> tuple:
    """(ids, mask) int32: the PROMPT span of dataset rows — dataset rows
    hold prompt+answer, and the answer span is exactly where labels !=
    -100 (ref check_generation.py generates from the prompt alone).
    Shared by the generation harness and the per-epoch training sample."""
    from tsue_tpu.models.fusion import IGNORE_LABEL
    prompt_mask = np.asarray(batch["attention_mask"])
    if "labels" in batch:
        prompt_mask = prompt_mask * (
            np.asarray(batch["labels"]) == IGNORE_LABEL)
    ids = (np.asarray(batch["input_ids"]) * prompt_mask).astype(np.int32)
    return ids, prompt_mask.astype(np.int32)


def trim_and_decode(row, tokenizer, extract_answer: bool = False) -> str:
    """Generated id row -> postprocessed text (strip pad, cut at EOS)."""
    ids = [int(t) for t in row if t != tokenizer.pad_id]
    if tokenizer.eos_id in ids:
        ids = ids[:ids.index(tokenizer.eos_id)]
    return postprocess_text(tokenizer.decode(ids), extract_answer)


def generate_texts(mllm, variables, tokenizer, vision, prompt_ids,
                   prompt_mask, rng, max_new_tokens: int = 128,
                   cfg: Optional[SamplingConfig] = None,
                   extract_answer: bool = False,
                   speculative: bool = False) -> List[str]:
    """End-to-end convenience wrapper: ids in, postprocessed strings out.

    ``speculative=True`` decodes with prompt-lookup speculative decoding
    (eval/speculative.py) — fewer forwards on templated outputs.  A
    ``cfg=None`` default becomes greedy (exact same tokens as the plain
    greedy decode); passing a ``cfg`` with ``do_sample=True`` uses exact
    speculative SAMPLING (sample-and-match, distributionally identical
    to token-at-a-time sampling; per-row chain keys, see the module
    docstring)."""
    if speculative and cfg is None:
        cfg = SamplingConfig(do_sample=False)
    cfg = cfg or SamplingConfig()
    if speculative:
        from tsue_tpu.eval.speculative import make_speculative_generate_fn
        gen = make_speculative_generate_fn(
            mllm, cfg, max_new_tokens, prompt_ids.shape[1],
            tokenizer.eos_id, tokenizer.pad_id)
    else:
        gen = make_generate_fn(mllm, cfg, max_new_tokens,
                               prompt_ids.shape[1], tokenizer.eos_id,
                               tokenizer.pad_id)
    out = np.asarray(gen(variables, vision, jnp.asarray(prompt_ids),
                         jnp.asarray(prompt_mask), rng))
    return [trim_and_decode(row, tokenizer, extract_answer) for row in out]


def distributed_generate_and_save(mllm, variables, tokenizer, dataset,
                                  out_path: str, rng,
                                  batch_size: int = 8,
                                  max_new_tokens: int = 128,
                                  cfg: Optional[SamplingConfig] = None,
                                  reference_texts: Optional[dict] = None):
    """Multi-process generation eval (ref check_generation.py:331-369).

    Each process generates for its shard; results are gathered to process 0
    which writes generated-vs-reference pairs (``reference_texts`` maps
    track_id -> ground-truth context, ref :361-368).  Single-process it
    just runs everything locally.
    """
    import jax
    from tsue_tpu.data.dataset import BatchIterator
    from tsue_tpu.parallel.mesh import is_primary

    cfg = cfg or SamplingConfig()
    it = BatchIterator(dataset, batch_size=batch_size, shuffle=False,
                       process_index=jax.process_index(),
                       process_count=jax.process_count())
    gen = None
    tids, rows, valids = [], [], []
    for i, batch in enumerate(it):
        if gen is None:
            gen = make_generate_fn(mllm, cfg, max_new_tokens,
                                   batch["input_ids"].shape[1],
                                   tokenizer.eos_id, tokenizer.pad_id)
        ids, prompt_mask = prompt_only(batch)
        out = gen(variables, jnp.asarray(batch["vision"]),
                  jnp.asarray(ids), jnp.asarray(prompt_mask),
                  jax.random.fold_in(rng, i))
        tids.append(np.asarray(batch["track_id"]))
        rows.append(np.asarray(out))
        valids.append(np.asarray(batch["valid"]))
    if not rows:
        return []
    tids = np.concatenate(tids); rows = np.concatenate(rows)
    valids = np.concatenate(valids)
    if jax.process_count() > 1:
        # array gather (the JAX-native analogue of the reference's
        # all_gather_object); decoding happens on process 0 only
        from jax.experimental import multihost_utils
        tids = np.concatenate(multihost_utils.process_allgather(tids))
        rows = np.concatenate(multihost_utils.process_allgather(rows))
        valids = np.concatenate(multihost_utils.process_allgather(valids))
    records = []
    if is_primary():
        for tid, row, v in zip(tids, rows, valids):
            if not v:
                continue
            rec = {"track_id": int(tid),
                   "generated": trim_and_decode(row, tokenizer)}
            if reference_texts is not None:
                rec["reference"] = reference_texts.get(int(tid), "")
            records.append(rec)
        with open(out_path, "w") as f:
            for rec in records:
                f.write(f"[track {rec['track_id']}]\n"
                        f"GENERATED: {rec['generated']}\n")
                if "reference" in rec:
                    f.write(f"REFERENCE: {rec['reference']}\n")
                f.write("\n")
    return records
