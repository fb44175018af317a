"""Slot-based continuous batching for text generation serving.

The static generator (eval/generation.py) runs one batch until every row
hits EOS — with variable output lengths the batch's wall-clock is its
LONGEST member and finished rows burn compute as padding.  This module
keeps a fixed pool of B decode slots and refills each slot the moment its
request finishes, so device utilization tracks the MEAN output length
instead of the max (the vLLM-style scheduling idea, recast in fixed-shape
XLA terms; the reference has no serving story at all — its generation is
a blocking HF ``generate`` call, ref scripts/train.py:637-642).

TPU-first mechanics — nothing here retraces or reshapes:

- the KV-cache pool, sampler history, per-slot step counters and output
  buffers are ONE pytree of fixed-shape device arrays;
- decode runs as a jitted ``lax.scan`` chunk over the whole pool with
  per-slot step indices (models/fusion.py decode_step's vector form:
  every row writes its own cache offset) — finished/empty slots ride
  along masked, exactly like padding rows in the static path;
- admission is a jitted B=1 prefill + scatter of the new rows into the
  pool at a traced slot index (one compile serves every slot);
- the host only reads two tiny flag vectors per chunk (the same
  harvest-between-chunks cadence as the static path's early-exit loop).

Per-request PRNG keys make a request's tokens REPRODUCIBLE regardless of
slot placement or co-batched traffic (ops/sampling.py
process_and_sample_per_row) — a property the shared-key batched sampler
cannot give, and the contract tests/test_serve_batching.py pins against
a single-request reference decode.
"""
from __future__ import annotations

from collections import deque
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsue_tpu.ops.sampling import (SamplingConfig,
                                   process_and_sample_per_row)


class PoolState(NamedTuple):
    """Fixed-shape device state for the whole slot pool."""
    caches: tuple          # per layer: (k, v) each (B, cache_len, kv, hd)
    history: jnp.ndarray   # (B, prompt_len + max_new) sampler history
    hlen: jnp.ndarray      # (B,) valid history length
    logits: jnp.ndarray    # (B, V) last logits per slot
    keys: jax.Array        # (B,) per-slot PRNG keys
    prefix_len: jnp.ndarray  # (B,) fused prefix valid length
    fmask: jnp.ndarray     # (B, P_fused) fused prefix mask
    step: jnp.ndarray      # (B,) decode step per slot
    out: jnp.ndarray       # (B, max_new) generated tokens
    max_new: jnp.ndarray   # (B,) per-request new-token cap
    active: jnp.ndarray    # (B,) slot holds an unharvested request
    finished: jnp.ndarray  # (B,) request done (EOS or cap)


class ContinuousBatcher:
    """Continuously-batched sampled decoding over a fixed slot pool.

    Args mirror eval/generation.py make_generate_fn; ``num_slots`` is the
    pool (device batch) size, ``chunk`` the steps between harvests.
    ``variables`` may carry the int8 "quant" collection (ops/quant.py) —
    the decode path picks it up exactly as the static generator does.
    """

    def __init__(self, mllm, variables, sampling: SamplingConfig,
                 num_slots: int, prompt_len: int, max_new_tokens: int,
                 eos_id: int, pad_id: int = 0, chunk: int = 8):
        self.mllm = mllm
        self.variables = variables
        self.sampling = sampling
        self.B = num_slots
        self.prompt_len = prompt_len
        self.max_new_tokens = max_new_tokens
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.chunk = max(1, min(chunk, max_new_tokens))
        n_img = mllm.qformer.num_query_tokens if mllm.use_vision else 0
        self.P = n_img + prompt_len
        self.cache_len = self.P + max_new_tokens
        self._decode_chunk = jax.jit(self._decode_chunk_impl,
                                     donate_argnums=0)
        self._admit = jax.jit(self._admit_impl, donate_argnums=0)
        self._release = jax.jit(self._release_impl, donate_argnums=0)

    # ---- jitted programs -------------------------------------------------

    def _init_state(self) -> PoolState:
        c = self.mllm.llama
        B, L, V = self.B, self.cache_len, c.vocab_size
        dt = self.mllm.dtype
        shape = (B, L, c.num_kv_heads, c.head_dim)
        caches = tuple((jnp.zeros(shape, dt), jnp.zeros(shape, dt))
                       for _ in range(c.num_layers))
        return PoolState(
            caches=caches,
            history=jnp.full((B, self.prompt_len + self.max_new_tokens),
                             self.pad_id, jnp.int32),
            hlen=jnp.zeros((B,), jnp.int32),
            logits=jnp.zeros((B, V), jnp.float32),
            keys=jax.random.split(jax.random.key(0), B),
            prefix_len=jnp.zeros((B,), jnp.int32),
            fmask=jnp.zeros((B, self.P), jnp.int32),
            step=jnp.zeros((B,), jnp.int32),
            out=jnp.full((B, self.max_new_tokens), self.pad_id, jnp.int32),
            max_new=jnp.zeros((B,), jnp.int32),
            active=jnp.zeros((B,), bool),
            finished=jnp.zeros((B,), bool))

    def _admit_impl(self, state: PoolState, slots, vision, prompt_ids,
                    prompt_mask, keys, max_new) -> PoolState:
        """Prefill A requests (leading dim A) in ONE forward and scatter
        them into ``slots`` (A,).  ``slots`` is traced, so one compile
        serves any slot assignment of a given A; run() buckets A to
        powers of two to bound the compile count at log2(num_slots)+1."""
        A = prompt_ids.shape[0]
        caches_a, last_hidden, plen, fmask = self.mllm.apply(
            self.variables, vision, prompt_ids, prompt_mask,
            self.cache_len, method=self.mllm.prefill)
        logits0 = self.mllm.apply(
            self.variables, last_hidden,
            method=lambda m, h: m.llama_mod.logits_from_hidden(
                h, quant_ok=True))
        caches = tuple(
            (ck.at[slots].set(nk), cv.at[slots].set(nv))
            for (ck, cv), (nk, nv) in zip(state.caches, caches_a))
        hist_rows = jnp.concatenate(
            [prompt_ids,
             jnp.full((A, self.max_new_tokens), self.pad_id, jnp.int32)],
            axis=1)
        pad_rows = jnp.full((A, self.max_new_tokens), self.pad_id,
                            jnp.int32)
        return state._replace(
            caches=caches,
            history=state.history.at[slots].set(hist_rows),
            hlen=state.hlen.at[slots].set(
                prompt_mask.sum(axis=1).astype(jnp.int32)),
            logits=state.logits.at[slots].set(
                logits0.astype(jnp.float32)),
            keys=state.keys.at[slots].set(keys),
            prefix_len=state.prefix_len.at[slots].set(plen),
            fmask=state.fmask.at[slots].set(fmask),
            step=state.step.at[slots].set(jnp.zeros((A,), jnp.int32)),
            out=state.out.at[slots].set(pad_rows),
            max_new=state.max_new.at[slots].set(max_new),
            active=state.active.at[slots].set(jnp.ones((A,), bool)),
            finished=state.finished.at[slots].set(jnp.zeros((A,), bool)))

    def _decode_chunk_impl(self, state: PoolState) -> PoolState:
        B, rows = self.B, jnp.arange(self.B)
        cfg, pad, eos = self.sampling, self.pad_id, self.eos_id

        def body(st: PoolState, _):
            live = st.active & ~st.finished
            split = jax.vmap(jax.random.split)(st.keys)   # (B, 2) keys
            tok = process_and_sample_per_row(
                st.logits, split[:, 0], st.history, st.hlen, cfg)
            tok = jnp.where(live, tok, pad).astype(jnp.int32)
            oidx = jnp.minimum(st.step, self.max_new_tokens - 1)
            out = st.out.at[rows, oidx].set(
                jnp.where(live, tok, st.out[rows, oidx]))
            hidx = jnp.minimum(st.hlen, st.history.shape[1] - 1)
            history = st.history.at[rows, hidx].set(
                jnp.where(live, tok, st.history[rows, hidx]))
            hlen = st.hlen + live
            finished = st.finished | (live & (tok == eos)) | \
                (live & (st.step + 1 >= st.max_new))
            # finished/empty slots ride along: their step is frozen, so
            # they rewrite the same cache offset with masked-out garbage
            new_logits, caches = self.mllm.apply(
                self.variables, tok, st.step, st.prefix_len, st.caches,
                st.fmask, self.cache_len, method=self.mllm.decode_step)
            return st._replace(
                caches=tuple(tuple(c) for c in caches),  # model returns list
                history=history, hlen=hlen,
                logits=jnp.where(live[:, None],
                                 new_logits.astype(jnp.float32), st.logits),
                keys=split[:, 1], step=st.step + live, out=out,
                finished=finished), None

        state, _ = jax.lax.scan(body, state, None, length=self.chunk)
        return state

    def _release_impl(self, state: PoolState, harvest) -> PoolState:
        return state._replace(active=state.active & ~harvest)

    # ---- host orchestration ---------------------------------------------

    def run(self, requests: Sequence[Dict],
            rng: Optional[jax.Array] = None,
            refill: bool = True) -> List[np.ndarray]:
        """Decode all ``requests``; returns per-request token arrays
        (EOS-trimmed), order-aligned with the input.

        Each request: {"prompt_ids": (P,) int, "prompt_mask": (P,) int
        [, "vision": (T,512), "rng": key, "max_new": int]}.  "vision" is
        required iff the model uses vision; "max_new" must lie in
        [0, max_new_tokens] (the pool's buffer size — raises otherwise;
        0 yields an empty result without occupying a slot).  A request
        with its own "rng" reproduces the same tokens no matter the slot
        or co-batched traffic.

        ``refill=False`` degrades to batch-synchronous scheduling (only
        admit when the whole pool has drained — the static generator's
        policy) with otherwise identical programs; it exists so the
        scheduling win can be measured in isolation
        (scripts/ab_continuous.py).
        """
        if not requests:
            return []
        base = rng if rng is not None else jax.random.key(0)
        results: Dict[int, np.ndarray] = {}
        queue: deque = deque()
        for rid, req in enumerate(requests):
            mn = int(req.get("max_new", self.max_new_tokens))
            if not 0 <= mn <= self.max_new_tokens:
                # out-of-contract caps would scatter KV past the pool's
                # fixed cache/output buffers (silently dropped by XLA) —
                # fail loudly instead
                raise ValueError(
                    f"request {rid}: max_new={mn} outside "
                    f"[0, {self.max_new_tokens}] (the pool's buffer size)")
            if mn == 0:
                results[rid] = np.zeros((0,), np.int32)
            else:
                queue.append((rid, req))
        if not queue:
            return [results[i] for i in range(len(requests))]
        state = self._init_state()
        slot_req: List[Optional[int]] = [None] * self.B
        while queue or any(s is not None for s in slot_req):
            pool_empty = all(s is None for s in slot_req)
            free = ([] if not (refill or pool_empty)
                    else [s for s in range(self.B) if slot_req[s] is None])
            while free and queue:
                # largest power-of-two admission batch that fits
                A = 1 << (min(len(free), len(queue)).bit_length() - 1)
                batch, slots = [], []
                for _ in range(A):
                    rid, req = queue.popleft()
                    s = free.pop()
                    slot_req[s] = rid
                    key = req.get("rng")
                    batch.append((req, key if key is not None
                                  else jax.random.fold_in(base, rid)))
                    slots.append(s)
                state = self._admit(
                    state, jnp.asarray(slots, jnp.int32),
                    (jnp.stack([jnp.asarray(r["vision"]) for r, _ in batch])
                     if self.mllm.use_vision else None),
                    jnp.stack([jnp.asarray(r["prompt_ids"], jnp.int32)
                               for r, _ in batch]),
                    jnp.stack([jnp.asarray(r["prompt_mask"], jnp.int32)
                               for r, _ in batch]),
                    jnp.stack([k for _, k in batch]),
                    jnp.asarray([r.get("max_new", self.max_new_tokens)
                                 for r, _ in batch], jnp.int32))
            state = self._decode_chunk(state)
            harvest = np.asarray(state.active & state.finished)
            if not harvest.any():
                continue
            out = np.asarray(state.out)
            steps = np.asarray(state.step)
            for s in np.nonzero(harvest)[0]:
                rid, slot_req[s] = slot_req[s], None
                row = out[s, :steps[s]]
                eos_pos = np.nonzero(row == self.eos_id)[0]
                results[rid] = row[:eos_pos[0]] if eos_pos.size else row
            state = self._release(state, jnp.asarray(harvest))
        return [results[i] for i in range(len(requests))]
