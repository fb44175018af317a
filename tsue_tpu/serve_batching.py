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

Speculative mode (``window`` >= 2) composes prompt-lookup speculative
decoding (eval/speculative.py) with the slot pool: each decode tick runs
ONE ``decode_window`` forward over all slots — the committed next token
plus W-1 n-gram drafts per row — and each row keeps the longest prefix its
own sampler would have produced, so rows advance 1..W tokens per weight
stream on their OWN clocks (per-row ``step``).  Draw keys are per-request
split chains indexed by absolute output position, exactly the plain
pool's discipline, so a request's output is BITWISE the plain batcher's
(and therefore the chain-keyed single-request decode's) — pinned in
tests/test_serve_batching.py for greedy AND sampled configs.  The
scheduling win (refill) and the speculation win (tokens/forward)
multiply; measured by scripts/ab_continuous.py --speculative.
"""
from __future__ import annotations

from collections import deque
from typing import Dict, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsue_tpu.eval.speculative import ngram_draft
from tsue_tpu.ops.sampling import (SamplingConfig,
                                   process_and_sample_per_row)


class PoolState(NamedTuple):
    """Fixed-shape device state for the whole slot pool."""
    caches: tuple          # per layer: (k, v) each (B, cache_len, kv, hd),
                           # or (k8, ks, v8, vs) int8 (quantize_kv)
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
                 eos_id: int, pad_id: int = 0, chunk: int = 8,
                 window: int = 1, draft_ngram: int = 3,
                 quantize_kv: bool = False, mesh=None):
        """``window``: 1 = plain token-at-a-time decoding; >= 2 enables
        speculative mode — each tick scores the committed token plus
        window-1 prompt-lookup drafts in one ``decode_window`` forward
        (``draft_ngram`` = the n of the suffix lookup).  Output is
        bitwise the window=1 pool's (module docstring).

        ``quantize_kv``: store the pool's KV caches per-token int8
        (ops/kv_quant.py) — admission prefills exactly in bf16 and
        quantizes the new rows before scattering them into the pool;
        decode ticks read/write half the cache bytes.

        ``mesh``: a ("data", "model") mesh (parallel/mesh.make_mesh) —
        the pool state shards over "data" (every PoolState leaf leads
        with the slot axis) and ``variables`` should arrive TP-sharded
        (parallel/sharding.shard_params; serve.Predictor does this).
        All three jitted programs partition under GSPMD (scatters,
        scans, decode forwards — and every Pallas kernel on the path
        via its custom_partitioning rules: flash prefill, the int8
        VMEM-dequant dot, the int8-KV attention — no trace-time
        formulation pins, r5, cf. parallel/serve_tp.py).  ``num_slots``
        must divide the data axis.  Pure-DP pools are bitwise the
        single-chip pool (tests/test_serve_batching.py)."""
        if window < 1:
            raise ValueError("window must be >= 1")
        self.mesh = mesh
        if mesh is not None and num_slots % mesh.shape.get("data", 1):
            raise ValueError(
                f"num_slots={num_slots} must divide the mesh's data "
                f"axis ({mesh.shape.get('data', 1)}): the pool state "
                "shards slot-major over \"data\"")
        self.quantize_kv = quantize_kv
        self.mllm = mllm
        self.variables = variables
        self.sampling = sampling
        self.B = num_slots
        self.prompt_len = prompt_len
        self.max_new_tokens = max_new_tokens
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.chunk = max(1, min(chunk, max_new_tokens))
        self.window = window
        self.draft_ngram = draft_ngram
        n_img = mllm.qformer.num_query_tokens if mllm.use_vision else 0
        self.P = n_img + prompt_len
        # speculative windows overrun the nominal lengths by < window:
        # scatters write up to step+window-1 / hlen+window-1, and the
        # window forward's cache writes reach P+step+window-1
        slack = window if window > 1 else 0
        self.cache_len = self.P + max_new_tokens + slack
        self._out_len = max_new_tokens + slack
        self._hist_len = prompt_len + max_new_tokens + slack
        # the model weights enter every jitted program as an ARGUMENT,
        # never a closure: closed-over arrays are baked into the compile
        # payload as constants (2.6 GB at 1B scale), which the remote
        # compiler rejects (CLAUDE.md; observed as remote_compile broken
        # pipe).  State is donated; variables are read-only.
        self._decode_chunk = jax.jit(self._decode_chunk_impl,
                                     donate_argnums=1)
        self._admit = jax.jit(self._admit_impl, donate_argnums=1)
        self._release = jax.jit(self._release_impl, donate_argnums=0)

    # ---- jitted programs -------------------------------------------------

    def _init_state(self) -> PoolState:
        c = self.mllm.llama
        B, L, V = self.B, self.cache_len, c.vocab_size
        dt = self.mllm.dtype
        shape = (B, L, c.num_kv_heads, c.head_dim)
        if self.quantize_kv:
            # distinct arrays per slot: the state is donated, and aliased
            # buffers would be donated twice in one Execute()
            caches = tuple((jnp.zeros(shape, jnp.int8),
                            jnp.zeros(shape[:3], jnp.float32),
                            jnp.zeros(shape, jnp.int8),
                            jnp.zeros(shape[:3], jnp.float32))
                           for _ in range(c.num_layers))
        else:
            caches = tuple((jnp.zeros(shape, dt), jnp.zeros(shape, dt))
                           for _ in range(c.num_layers))
        state = PoolState(
            caches=caches,
            history=jnp.full((B, self._hist_len), self.pad_id, jnp.int32),
            hlen=jnp.zeros((B,), jnp.int32),
            logits=jnp.zeros((B, V), jnp.float32),
            keys=jax.random.split(jax.random.key(0), B),
            prefix_len=jnp.zeros((B,), jnp.int32),
            fmask=jnp.zeros((B, self.P), jnp.int32),
            step=jnp.zeros((B,), jnp.int32),
            out=jnp.full((B, self._out_len), self.pad_id, jnp.int32),
            max_new=jnp.zeros((B,), jnp.int32),
            active=jnp.zeros((B,), bool),
            finished=jnp.zeros((B,), bool))
        if self.mesh is not None:
            # every leaf is slot-major: shard the whole pool over "data"
            from tsue_tpu.parallel.mesh import batch_sharding
            state = jax.device_put(state, batch_sharding(self.mesh))
        return state

    def _admit_impl(self, variables, state: PoolState, slots, vision,
                    prompt_ids, prompt_mask, keys, max_new) -> PoolState:
        """Prefill A requests (leading dim A) in ONE forward and scatter
        them into ``slots`` (A,).  ``slots`` is traced, so one compile
        serves any slot assignment of a given A; run() buckets A to
        powers of two to bound the compile count at log2(num_slots)+1."""
        A = prompt_ids.shape[0]
        caches_a, last_hidden, plen, fmask = self.mllm.apply(
            variables, vision, prompt_ids, prompt_mask,
            self.cache_len, method=self.mllm.prefill)
        logits0 = self.mllm.apply(
            variables, last_hidden,
            method=lambda m, h: m.llama_mod.logits_from_hidden(
                h, quant_ok=True))
        if self.quantize_kv:
            # exact bf16 prefill above; the admitted rows quantize ONCE
            # here on their way into the int8 pool (ops/kv_quant.py)
            from tsue_tpu.ops.kv_quant import quantize_cache
            caches_a = quantize_cache(caches_a)
        caches = tuple(
            tuple(c.at[slots].set(n) for c, n in zip(layer, new))
            for layer, new in zip(state.caches, caches_a))
        hist_rows = jnp.concatenate(
            [prompt_ids,
             jnp.full((A, self._hist_len - self.prompt_len), self.pad_id,
                      jnp.int32)], axis=1)
        pad_rows = jnp.full((A, self._out_len), self.pad_id, jnp.int32)
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

    def _decode_chunk_impl(self, variables, state: PoolState) -> PoolState:
        if self.window > 1:
            return self._decode_chunk_window(variables, state)
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
                variables, tok, st.step, st.prefix_len, st.caches,
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

    def _decode_chunk_window(self, variables,
                             state: PoolState) -> PoolState:
        """Speculative decode tick (window >= 2), scanned ``chunk`` times.

        Per tick: draw the committed token for every row's current
        position with its position's chain key (EXACTLY the plain body's
        draw — same key, same logits, same history), propose window-1
        prompt-lookup drafts, score all window positions in ONE
        ``decode_window`` forward, and accept drafts while they equal the
        row's own chain-keyed draw at that position.  Emitted tokens are
        therefore exactly the plain pool's; only the number of weight
        streams changes (eval/speculative.py sample-and-match, here on
        per-slot clocks)."""
        rows = jnp.arange(self.B)
        W = self.window
        offs = jnp.arange(W)[None, :]
        cfg, pad, eos = self.sampling, self.pad_id, self.eos_id
        H = self._hist_len

        def body(st: PoolState, _):
            live = st.active & ~st.finished
            # W chain keys ahead of each row's carry: dk[:, j] draws the
            # token at output position step+j; carr[:, j] is the carry
            # after consuming it (the plain body's split-per-draw chain,
            # precomputed so window draws can random-access position keys)
            def kstep(carry, _):
                s = jax.vmap(jax.random.split)(carry)
                return s[:, 1], (s[:, 0], s[:, 1])
            _, (dk, carr) = jax.lax.scan(kstep, st.keys, None, length=W)
            dk = jnp.swapaxes(dk, 0, 1)       # (B, W) draw keys
            carr = jnp.swapaxes(carr, 0, 1)   # (B, W) carries
            # committed token at position step — the plain body's draw
            tok = process_and_sample_per_row(
                st.logits, dk[:, 0], st.history, st.hlen, cfg)
            tok = jnp.where(live, tok, pad).astype(jnp.int32)
            # drafts proposed from the history as it reads after tok
            hidx = jnp.minimum(st.hlen, H - 1)
            hist1 = st.history.at[rows, hidx].set(
                jnp.where(live, tok, st.history[rows, hidx]))
            draft = ngram_draft(hist1, st.hlen + 1, self.draft_ngram, W - 1)
            wtoks = jnp.concatenate([tok[:, None], draft], axis=1)
            logits_w, caches = self.mllm.apply(
                variables, wtoks, st.step, st.prefix_len, st.caches,
                st.fmask, self.cache_len, method=self.mllm.decode_window)
            logits_w = logits_w.astype(jnp.float32)
            # score positions step+1..step+W-1 against the history each
            # implies; the V-wide stages run batched over all B*(W-1)
            # rows (per-row vmap measured 2.6x slower, ops/sampling.py)
            cols = st.hlen[:, None] + offs
            hist_all = st.history.at[rows[:, None], cols].set(wtoks)
            g = process_and_sample_per_row(
                logits_w[:, :W - 1].reshape(self.B * (W - 1), -1),
                dk[:, 1:].reshape(-1),
                jnp.repeat(hist_all, W - 1, axis=0),
                (st.hlen[:, None] + offs[:, :W - 1] + 1).reshape(-1),
                cfg).reshape(self.B, W - 1).astype(jnp.int32)
            # accept drafts while they equal the row's own draw and no
            # EOS has been committed (EOS can only be the final token)
            acc = (wtoks[:, 1:] == g) & (wtoks[:, :-1] != eos)
            n_emit = 1 + jnp.cumprod(acc.astype(jnp.int32), axis=1
                                     ).sum(axis=1)      # in [1, W]
            n_emit = jnp.where(live,
                               jnp.minimum(n_emit, st.max_new - st.step), 0)
            emit = offs < n_emit[:, None]                # (B, W)
            ocols = st.step[:, None] + offs
            out = st.out.at[rows[:, None], ocols].set(
                jnp.where(emit, wtoks, st.out[rows[:, None], ocols]))
            history = st.history.at[rows[:, None], cols].set(
                jnp.where(emit, wtoks, st.history[rows[:, None], cols]))
            hlen = st.hlen + n_emit
            step = st.step + n_emit
            # logits for the NEXT committed position step+n_emit came out
            # of this window at offset n_emit-1; its chain carry likewise
            sel = jnp.clip(n_emit - 1, 0, W - 1)
            new_logits = jnp.where(live[:, None], logits_w[rows, sel],
                                   st.logits)
            finished = st.finished | ((wtoks == eos) & emit).any(axis=1) \
                | (live & (step >= st.max_new))
            return st._replace(
                caches=tuple(tuple(c) for c in caches),
                history=history, hlen=hlen, logits=new_logits,
                keys=carr[rows, sel], step=step, out=out,
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
                    self.variables, state,
                    jnp.asarray(slots, jnp.int32),
                    (jnp.stack([jnp.asarray(r["vision"])
                                for r, _ in batch])
                     if self.mllm.use_vision else None),
                    jnp.stack([jnp.asarray(r["prompt_ids"], jnp.int32)
                               for r, _ in batch]),
                    jnp.stack([jnp.asarray(r["prompt_mask"], jnp.int32)
                               for r, _ in batch]),
                    jnp.stack([k for _, k in batch]),
                    jnp.asarray([r.get("max_new", self.max_new_tokens)
                                 for r, _ in batch], jnp.int32))
            state = self._decode_chunk(self.variables, state)
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
