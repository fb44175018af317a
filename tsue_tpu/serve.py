"""Serving: a precompiled single-chip predictor for production inference.

The reference has no serving story (research scripts only); this module is
the deployment-facing API over the same components:

- fixed-shape programs compiled ONCE at startup (predict / K-candidate
  rollout / context generation), then every request is a device call with
  no retracing;
- the expensive deterministic MLLM context is computed once per request
  and shared by all K candidates (fast path, see bench.py);
- inputs are raw pixel tracks; windowing/normalization runs through the
  same (optionally C++) preprocessing used in training, so training and
  serving can never skew.

Usage:
    p = Predictor(cfg, params)          # or Predictor.from_checkpoint(...)
    out = p.predict(raw_tracks_px)      # dict with pixel-space trajectories
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsue_tpu.config import ExperimentConfig
from tsue_tpu.data import get_tokenizer
from tsue_tpu.data.windowing import build_windows
from tsue_tpu.eval.metrics import fast_candidate_rollout
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.train.losses import denorm


class Predictor:
    """Batched trajectory prediction service for one chip."""

    def __init__(self, cfg: ExperimentConfig, params,
                 batch_size: int = 16, num_candidates: int = 0,
                 tokenizer=None, quantize_decode: bool = False,
                 fused_head: bool = False, quantize_kv: bool = False,
                 mesh=None, fsdp: bool = False):
        """``quantize_decode``: serve ``generate_context`` with int8
        weight-only decode (ops/quant.py) — halves the per-step HBM
        weight stream; prediction/rollout paths are unaffected.
        ``fused_head``: decode through the fused LM-head+top-k kernel
        (ops/lmhead_topk.py) — never materializes (B, V) logits; carries
        that module's ulp-level formulation caveat; composes with
        ``quantize_decode``.  Applies to the static ``generate_context``
        path (speculative/batched paths keep the plain head).
        ``quantize_kv``: int8 KV caches for every generation path —
        static, speculative AND batched (ops/kv_quant.py; prefill stays
        exact, the decode cache stream halves); composes with both
        switches above.
        ``mesh``: a ``("data", "model")`` jax.sharding.Mesh
        (parallel/mesh.make_mesh) — ``generate_context`` then runs the
        multi-chip sharded generator (parallel/serve_tp.py): weights
        TP-split over "model", request batches over "data", one weight
        placement reused across every (cap, bucket) program; composes
        with ``quantize_decode``.  ``fsdp=True`` additionally
        ZeRO-shards big replicated params over "data".  Pure-DP meshes
        (model_parallel=1) are bitwise the single-chip decode; TP
        carries the psum tie caveat (serve_tp.py).  Everything else
        composes: speculative decoding and ``quantize_kv``, the
        continuous batcher (pool state sharded over "data",
        serve_batching.py), ``predict``/the K-candidate rollout (same
        partition rules, batches over "data"), and ``fused_head`` (r5:
        its kernel shards over batch via custom_partitioning,
        ops/lmhead_topk.py)."""
        self.cfg = cfg
        self.batch_size = batch_size
        self.num_candidates = num_candidates
        self.quantize_decode = quantize_decode
        self.fused_head = fused_head
        self.quantize_kv = quantize_kv
        self.mesh = mesh
        self.fsdp = fsdp
        self._svars = None      # sharded MLLM placement (generation)
        self._pvars = None      # sharded full-tree placement (predict)
        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size={batch_size} must divide the mesh's "
                    f"data axis ({n_data}): every generation chunk is "
                    "padded to batch_size and sharded over \"data\"")
        elif fsdp:
            raise ValueError("fsdp=True requires a mesh")
        if fused_head and batch_size >= 32:
            import warnings
            warnings.warn(
                f"fused_head=True at batch_size={batch_size}: the fused "
                "LM-head+top-k kernel is a small-batch latency lever "
                "(measured +6% at bs16 but -8%/-15% at bs64/bs128, where "
                "XLA's single large head matmul wins — PARITY.md); "
                "consider leaving it off at this batch size")
        self._quant = None
        # compiled-program caches (generation fns / continuous batchers),
        # LRU-bounded: keys include request-controlled fields
        # (max_new_tokens), so a long-running server must not retain one
        # compiled program per distinct value ever seen
        self._batchers: Dict = {}
        self._generators: Dict = {}
        # must hold one program per prompt-length bucket simultaneously
        # (prepare_generation precompiles all of them at startup)
        self._cache_max = max(4, len(cfg.data.length_buckets) + 2)
        self.tokenizer = tokenizer or get_tokenizer()
        self.model = TrajectoryModel(cfg.model, cfg.data.seq_len,
                                     cfg.data.out_len)
        self.params = params

        self._model_keys = ("traj_in", "polygon", "polygon_len",
                            "vision", "input_ids", "attention_mask")
        self._predict = jax.jit(
            lambda p, b: self.model.apply({"params": p}, b, True))
        if num_candidates:
            self._rollout = jax.jit(
                lambda p, b, r: fast_candidate_rollout(
                    self.model, {"params": p}, b, num_candidates, r))

    @classmethod
    def from_checkpoint(cls, cfg: ExperimentConfig, ckpt_dir: str,
                        example_batch: Dict, **kw):
        """Restore best-checkpoint params into a fresh init tree.

        Uses restore_merge: frozen-regime best checkpoints hold only the
        trainable subtree (train/checkpoint.py), so the on-disk structure
        is merged over the deterministic init — same contract as the eval
        CLIs.  NB: if training imported a stage-1 MLLM, rebuild params
        via tsue_tpu.runner.rebuild_for_eval instead (this classmethod
        has no data pipeline to replay the import)."""
        from tsue_tpu.train.checkpoint import restore_merge
        model = TrajectoryModel(cfg.model, cfg.data.seq_len,
                                cfg.data.out_len)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            example_batch, False)
        params = restore_merge(ckpt_dir, variables["params"])
        return cls(cfg, params, **kw)

    def warmup(self):
        """Compile all programs against dummy data (call at startup)."""
        b = self._place_batch(self._dummy_batch())
        p = self._predict_params()
        with self._attn_ctx():
            jax.block_until_ready(self._predict(p, b))
            if self.num_candidates:
                jax.block_until_ready(
                    self._rollout(p, b, jax.random.key(0)))
        return self

    def _dummy_batch(self):
        d = self.cfg.data
        B = self.batch_size
        vd = d.vision_dim if d.use_vision else 1
        L = d.max_length if d.use_text else 1
        return {
            "traj_in": jnp.zeros((B, 2, d.seq_len)),
            "polygon": jnp.zeros((B, d.max_polygon_points, 2)),
            "polygon_len": jnp.zeros((B,), jnp.int32),
            "vision": jnp.zeros((B, d.seq_len, vd)),
            "input_ids": jnp.zeros((B, L), jnp.int32),
            "attention_mask": jnp.ones((B, L), jnp.int32),
        }

    def _predict_params(self):
        """Params for the predict/rollout programs: the raw tree on one
        chip, or (built once, cached) the TP(+FSDP)-sharded placement
        over the mesh — the same partition rules the generation path
        uses (the TrajectoryModel's mllm subtree carries the same
        q_proj/... paths the rules match; everything else replicates)."""
        if self.mesh is None:
            return self.params
        if self._pvars is None:
            from tsue_tpu.parallel.sharding import shard_params
            self._pvars = shard_params({"params": self.params}, self.mesh,
                                       fsdp=self.fsdp)["params"]
        return self._pvars

    def _place_batch(self, batch):
        """Shard a leading-axis-B batch pytree over the mesh's "data"
        axis (no-op single-chip)."""
        if self.mesh is None:
            return batch
        from tsue_tpu.parallel.mesh import batch_sharding
        return jax.device_put(batch, batch_sharding(self.mesh))

    def _attn_ctx(self):
        """Trace-time context for predict/rollout traces under a mesh —
        now a no-op: the flash kernel registers GSPMD partition rules
        (ops/flash.py), so the ambient attention policy runs per shard;
        predict/rollout use no int8/int8-KV paths, so no other pin is
        needed.  Kept as a seam should a future Pallas op enter these
        programs."""
        import contextlib
        return contextlib.nullcontext()

    def _mllm_module(self):
        from tsue_tpu.models.fusion import MultiModalLLM
        return MultiModalLLM(llama=self.cfg.model.llama,
                             qformer=self.cfg.model.qformer,
                             use_vision=self.cfg.model.use_vision)

    def _mllm_variables(self):
        """MLLM module + serving variables, quant tables built lazily —
        shared by the static (generate_context) and continuous
        (continuous_batcher) serving paths so quant/MLLM plumbing can
        never skew between them."""
        mllm = self._mllm_module()
        variables = {"params": self.params["mllm"]}
        if self.quantize_decode:
            if self._quant is None:
                from tsue_tpu.ops.quant import quantize_llama_params
                self._quant = jax.jit(quantize_llama_params)(
                    self.params["mllm"])
            variables["quant"] = self._quant
        return mllm, variables

    def _cache_get(self, cache: Dict, key, build):
        """LRU-bounded compiled-program cache (see __init__ note)."""
        if key in cache:
            cache[key] = cache.pop(key)        # refresh recency
            return cache[key]
        val = cache[key] = build()
        while len(cache) > self._cache_max:
            cache.pop(next(iter(cache)))       # evict least recent
        return val

    def _generation_fn(self, max_new_tokens: int, speculative: bool,
                       sampling, prompt_len: Optional[int] = None):
        """Cached jitted generator at the serving shapes (B = batch_size,
        prompt width = ``prompt_len`` — a length bucket, default
        cfg.data.max_length): a long-running server must compile
        generation once per (cap, bucket), not per request."""
        from tsue_tpu.eval.generation import make_generate_fn
        from tsue_tpu.eval.speculative import make_speculative_generate_fn
        from tsue_tpu.ops.sampling import SamplingConfig
        if speculative and sampling is None:
            sampling = SamplingConfig(do_sample=False)
        sampling = sampling or SamplingConfig()
        prompt_len = prompt_len or self.cfg.data.max_length
        key = (max_new_tokens, speculative, repr(sampling), prompt_len)

        if self.mesh is not None:
            def build_sharded():
                from tsue_tpu.parallel.serve_tp import \
                    make_sharded_generate_fn
                mllm = self._mllm_module()
                # reuse the first build's placement: device_put of an
                # already-committed leaf onto its own sharding is a no-op,
                # so later (cap, bucket) programs pay trace+compile only —
                # never a second weight transfer (or re-quantization: the
                # placed tree already carries the quant collection)
                variables = self._svars or {"params": self.params["mllm"]}
                gen, self._svars = make_sharded_generate_fn(
                    mllm, variables, sampling, max_new_tokens, prompt_len,
                    self.tokenizer.eos_id, mesh=self.mesh,
                    pad_id=self.tokenizer.pad_id, fsdp=self.fsdp,
                    quantize_decode=self.quantize_decode,
                    quantize_kv=self.quantize_kv,
                    speculative=speculative,
                    fused_head=self.fused_head)
                # the sharded closure owns its weights; adapt to the
                # (variables, vision, ids, mask, rng) calling convention
                # the request loop uses
                return (lambda v, vis, ids, mask, rng:
                        gen(vis, ids, mask, rng)), self._svars

            return self._cache_get(self._generators, key, build_sharded)

        def build():
            mllm, variables = self._mllm_variables()
            if speculative:
                fn = make_speculative_generate_fn(
                    mllm, sampling, max_new_tokens, prompt_len,
                    self.tokenizer.eos_id, self.tokenizer.pad_id,
                    quantize_kv=self.quantize_kv)
            else:
                fn = make_generate_fn(
                    mllm, sampling, max_new_tokens, prompt_len,
                    self.tokenizer.eos_id, self.tokenizer.pad_id,
                    fused_head=self.fused_head,
                    quantize_kv=self.quantize_kv)
            return fn, variables

        return self._cache_get(self._generators, key, build)

    @staticmethod
    def _resolve_cap(compile_cap: Optional[int], max_new_tokens: int) -> int:
        """An explicitly pinned ``compile_cap`` is a hard program bound:
        a request above it must fail loudly, not silently grow the cap —
        growing it triggers a fresh in-request XLA compile, exactly what
        the cap exists to forbid (the HTTP layer clamps instead; a
        library caller sees this error)."""
        if compile_cap is None:
            return max_new_tokens
        if max_new_tokens > compile_cap:
            raise ValueError(
                f"max_new_tokens={max_new_tokens} exceeds "
                f"compile_cap={compile_cap}: the cap pins the compiled "
                "program's length — clamp the request or raise the cap "
                "at startup (each distinct cap is one XLA compile)")
        return compile_cap

    def _bucket_prompts(self, prompt_ids: np.ndarray,
                        prompt_mask: np.ndarray):
        """Trim the request's prompt arrays to the smallest configured
        length bucket covering its longest prompt row
        (DataConfig.length_buckets — the serving side of the +30-69%
        bucketed-eval win, PARITY.md).  Prompt tokens occupy a prefix of
        each row (the answer span is already masked out by the caller),
        so trimming drops only all-pad tail positions — output-neutral,
        pinned by tests/test_serve.py.  Returns (ids, mask, width)."""
        width = prompt_ids.shape[1]
        buckets = tuple(self.cfg.data.length_buckets)
        if not buckets or width <= 1:
            return prompt_ids, prompt_mask, width
        longest = int(prompt_mask.sum(axis=1).max()) if len(prompt_mask) \
            else 0
        bucket = next((b for b in buckets if b >= longest), width)
        if bucket >= width:
            return prompt_ids, prompt_mask, width
        return prompt_ids[:, :bucket], prompt_mask[:, :bucket], bucket

    def _generation_tracks(self, tracks: Sequence[dict]):
        """Split tracks into (usable, error records) for generation.

        Generation needs only a track identity (+ vision embeddings when
        the model is vision-conditioned): ``context_str`` is the OUTPUT,
        not a requirement — unlike training ingest, which skips such
        tracks.  Tracks the model cannot condition (vision model, no
        embeddings) come back as explicit per-track error records so a
        client always gets one result per request track, never a silent
        drop."""
        ok, errs = [], []
        need_vision = self.cfg.model.use_vision
        for t in tracks:
            tid = t.get("track_id", t.get("id", -1))
            try:
                tid = int(tid)
            except (TypeError, ValueError):
                tid = -1
            if need_vision and t.get("vision_embeddings") is None:
                errs.append({"track_id": tid, "error":
                             "missing vision_embeddings "
                             "(model is vision-conditioned)"})
            else:
                ok.append(t)
        return ok, errs

    def generate_context(self, tracks: Sequence[dict],
                         max_new_tokens: int = 64,
                         rng: Optional[jax.Array] = None,
                         sampling=None,
                         speculative: bool = False,
                         compile_cap: Optional[int] = None) -> List[Dict]:
        """Generate traffic-context text per track (stage-1 capability).

        Requires cfg.model.use_llm; runs the KV-cached sampled decoder in
        fixed ``batch_size`` chunks through a cached compiled program (no
        per-request retrace, no per-request-count shapes).
        ``speculative=True`` uses prompt-lookup speculative decoding
        (eval/speculative.py) — fewer forwards on templated paragraphs.
        With ``sampling=None`` it defaults to exact GREEDY output; a
        ``sampling`` config with ``do_sample=True`` uses exact
        speculative SAMPLING (sample-and-match: distributionally
        identical to token-at-a-time sampling, bitwise the chain-keyed
        plain decode).  Composes with ``quantize_decode=True``: both the
        plain steps and the speculative window forwards then use the
        int8 weights.

        ``compile_cap``: compile (and cache) the program at this length
        and trim the emitted rows to ``max_new_tokens`` — a long-running
        server pins one cap at startup and serves EVERY shorter request
        from that single program instead of compiling per distinct value
        (multi-minute XLA compiles at 1B scale).  ``max_new_tokens``
        above an explicit cap raises (never a silent in-request
        compile; the HTTP layer clamps before calling).  Greedy/speculative
        output prefixes are exact; sampled draws carry the usual
        program-shape caveat (eval/generation.py chunking note).
        Tracks without ``context_str`` are served (the context is the
        output); tracks a vision-conditioned model cannot condition come
        back as ``{"track_id", "error"}`` records.
        """
        assert self.cfg.model.use_llm, "use_llm=False predictor"
        from tsue_tpu.data.text_dataset import build_track_text_dataset
        from tsue_tpu.eval.generation import trim_and_decode
        tracks, errs = self._generation_tracks(tracks)
        ds = build_track_text_dataset(tracks, self.cfg.data, self.tokenizer,
                                      require_context=False,
                                      require_vision=False)
        n = len(ds)
        if n == 0:
            return errs
        rng = rng if rng is not None else jax.random.key(0)
        cap = self._resolve_cap(compile_cap, max_new_tokens)
        # prompt-only conditioning: mask the answer span out
        prompt_mask = np.asarray(ds.attention_mask * (ds.labels == -100),
                                 np.int32)
        prompt_ids = np.asarray(ds.input_ids, np.int32) * prompt_mask
        prompt_ids, prompt_mask, width = self._bucket_prompts(
            prompt_ids, prompt_mask)
        gen, variables = self._generation_fn(cap, speculative, sampling,
                                             prompt_len=width)
        B = self.batch_size
        rows = []
        for s in range(0, n, B):
            idx = np.arange(s, min(s + B, n))
            sel = np.concatenate([idx, np.repeat(idx[-1:], B - len(idx))])
            out = gen(variables, jnp.asarray(ds.vision[sel]),
                      jnp.asarray(prompt_ids[sel]),
                      jnp.asarray(prompt_mask[sel]),
                      jax.random.fold_in(rng, s))
            rows.append(np.asarray(out)[:len(idx), :max_new_tokens])
        texts = [trim_and_decode(row, self.tokenizer)
                 for row in np.concatenate(rows)]
        return [{"track_id": int(t), "context": txt}
                for t, txt in zip(ds.track_id, texts)] + errs

    def _serving_widths(self):
        """Prompt widths the length bucketing can emit at serving time:
        the configured buckets below ``max_length`` plus the full width
        (the fallback when a prompt exceeds every bucket)."""
        full = self.cfg.data.max_length
        below = sorted({int(b) for b in self.cfg.data.length_buckets
                        if 1 < b < full})
        return tuple(below) + (full,)

    def prepare_generation(self, max_new_tokens: int = 64,
                           speculative: bool = False, sampling=None,
                           batched: bool = False,
                           num_slots: Optional[int] = None,
                           chunk: int = 8):
        """Compile the generation programs at startup (HTTP serving): one
        per prompt-length bucket the request path can pick
        (``_serving_widths``), each run once on a dummy prompt so the
        first real request at ANY bucket pays a device call, never an
        XLA compile (minutes at 1B scale, under the request lock).
        Startup cost scales with len(length_buckets)+1 — trim the
        buckets (--length-buckets) to trade startup time for serving
        throughput."""
        assert self.cfg.model.use_llm, "use_llm=False predictor"
        import jax.numpy as jnp
        d = self.cfg.data
        track = {"track_id": 0, "context_str": "warmup",
                 "vision_embeddings": np.zeros((d.downsample, d.vision_dim),
                                               np.float32)}
        # route one dummy track through the real request path (exercises
        # ingest + the smallest bucket's program), then compile the
        # remaining widths directly
        if batched:
            self.generate_context_batched(
                [track], max_new_tokens=max_new_tokens, sampling=sampling,
                num_slots=num_slots, chunk=chunk, speculative=speculative)
        else:
            self.generate_context([track], max_new_tokens=max_new_tokens,
                                  sampling=sampling, speculative=speculative)
        B = num_slots or self.batch_size
        rng = jax.random.key(0)
        for w in self._serving_widths():
            ids = np.zeros((1, w), np.int32)
            mask = np.zeros((1, w), np.int32)
            ids[0, :4] = 5
            mask[0, :4] = 1
            vis = np.zeros((1, d.downsample, d.vision_dim), np.float32)
            if batched:
                window = self._spec_window(speculative, None, sampling)
                key = (B, w, max_new_tokens, chunk, repr(sampling), window)
                batcher = self._cache_get(
                    self._batchers, key,
                    lambda w=w, window=window: self.continuous_batcher(
                        num_slots=B, prompt_len=w,
                        max_new_tokens=max_new_tokens, chunk=chunk,
                        sampling=sampling, window=window))
                req = {"prompt_ids": ids[0], "prompt_mask": mask[0],
                       "rng": rng}
                if self.cfg.model.use_vision:
                    req["vision"] = vis[0]
                batcher.run([req])
            else:
                gen, variables = self._generation_fn(
                    max_new_tokens, speculative, sampling, prompt_len=w)
                reps = (self.batch_size, 1)
                out = gen(variables, jnp.asarray(np.tile(vis, reps + (1,))),
                          jnp.asarray(np.tile(ids, reps)),
                          jnp.asarray(np.tile(mask, reps)), rng)
                np.asarray(out)
        return self

    def generate_context_batched(self, tracks: Sequence[dict],
                                 max_new_tokens: int = 64,
                                 rng: Optional[jax.Array] = None,
                                 sampling=None,
                                 num_slots: Optional[int] = None,
                                 chunk: int = 8,
                                 compile_cap: Optional[int] = None,
                                 speculative: bool = False,
                                 spec_window: Optional[int] = None
                                 ) -> List[Dict]:
        """``generate_context`` through the ContinuousBatcher slot pool.

        Same request semantics (prompt-only conditioning, per-track
        results, ``compile_cap`` trimming, explicit error records for
        unconditionable tracks) but scheduled with continuous refill —
        the serving path for mixed-length traffic.  Per-request fold_in
        keys make each track's output independent of co-batched traffic
        (tests/test_serve_batching.py pins batcher == single-request
        decodes).

        ``speculative=True`` additionally drafts ``spec_window-1``
        prompt-lookup tokens per tick and scores the whole window in one
        forward (serve_batching.py window mode) — output stays bitwise
        the plain pool's, so the scheduling and speculation wins
        compose.  ``spec_window`` defaults to the measured sweet spots:
        8 for greedy, 4 for sampled configs (PARITY.md)."""
        assert self.cfg.model.use_llm, "use_llm=False predictor"
        from tsue_tpu.data.text_dataset import build_track_text_dataset
        from tsue_tpu.eval.generation import postprocess_text
        tracks, errs = self._generation_tracks(tracks)
        ds = build_track_text_dataset(tracks, self.cfg.data, self.tokenizer,
                                      require_context=False,
                                      require_vision=False)
        if len(ds) == 0:
            return errs
        cap = self._resolve_cap(compile_cap, max_new_tokens)
        prompt_mask = np.asarray(ds.attention_mask * (ds.labels == -100),
                                 np.int32)
        prompt_ids = np.asarray(ds.input_ids, np.int32) * prompt_mask
        prompt_ids, prompt_mask, _ = self._bucket_prompts(
            prompt_ids, prompt_mask)
        window = self._spec_window(speculative, spec_window, sampling)
        # reuse one batcher per pool shape: its jitted programs are
        # closures, so a fresh instance per request would retrace
        key = (num_slots or self.batch_size, prompt_ids.shape[1],
               cap, chunk, repr(sampling), window)
        batcher = self._cache_get(
            self._batchers, key,
            lambda: self.continuous_batcher(
                num_slots=num_slots or self.batch_size,
                prompt_len=prompt_ids.shape[1],
                max_new_tokens=cap, chunk=chunk,
                sampling=sampling, window=window))
        base = rng if rng is not None else jax.random.key(0)
        reqs = []
        for i in range(len(ds)):
            r = {"prompt_ids": prompt_ids[i], "prompt_mask": prompt_mask[i],
                 "rng": jax.random.fold_in(base, i)}
            if self.cfg.model.use_vision:
                r["vision"] = np.asarray(ds.vision[i])
            reqs.append(r)
        texts = [postprocess_text(
            self.tokenizer.decode([int(t) for t in row[:max_new_tokens]
                                   if t != self.tokenizer.pad_id]))
            for row in batcher.run(reqs)]
        return [{"track_id": int(t), "context": txt}
                for t, txt in zip(ds.track_id, texts)] + errs

    @staticmethod
    def _spec_window(speculative: bool, spec_window: Optional[int],
                     sampling) -> int:
        """Speculation window for the slot pool: 1 (off) unless
        ``speculative``; defaults to the measured sweet spots — 8 for
        greedy, 4 for sampled configs (PARITY.md speculative tables)."""
        if not speculative:
            if spec_window not in (None, 1):
                raise ValueError("spec_window requires speculative=True")
            return 1
        if spec_window is not None:
            return spec_window
        return 4 if (sampling is not None and sampling.do_sample) else 8

    def continuous_batcher(self, num_slots: int = 16,
                           prompt_len: Optional[int] = None,
                           max_new_tokens: int = 64, chunk: int = 8,
                           sampling=None, window: int = 1):
        """Build a ContinuousBatcher over this predictor's MLLM (and its
        int8 quant tables when ``quantize_decode``): slot-pool scheduling
        for variable-length generation workloads — see serve_batching.py.
        ``window`` >= 2 enables the speculative window mode (bitwise the
        plain pool's output, fewer weight streams).  With a mesh, the
        pool state shards over "data" and the weights reuse the
        generation path's TP placement (serve_batching.py mesh notes;
        ``num_slots`` must divide the data axis)."""
        assert self.cfg.model.use_llm, "use_llm=False predictor"
        from tsue_tpu.ops.sampling import SamplingConfig
        from tsue_tpu.serve_batching import ContinuousBatcher
        mllm, variables = self._mllm_variables()
        if self.mesh is not None:
            from tsue_tpu.parallel.sharding import shard_params
            if self._svars is None:
                self._svars = shard_params(variables, self.mesh,
                                           fsdp=self.fsdp)
            variables = self._svars
        return ContinuousBatcher(
            mllm, variables, sampling or SamplingConfig(),
            num_slots=num_slots,
            prompt_len=(prompt_len if prompt_len is not None
                        else self.cfg.data.max_length),
            max_new_tokens=max_new_tokens,
            eos_id=self.tokenizer.eos_id, pad_id=self.tokenizer.pad_id,
            chunk=chunk, window=window, quantize_kv=self.quantize_kv,
            mesh=self.mesh)

    def predict(self, tracks: Sequence[dict],
                rng: Optional[jax.Array] = None) -> List[Dict]:
        """Raw track dicts in (all_data.pkl schema) -> per-window pixel
        predictions.  Returns one record per produced window:
        {track_id, start_pixel_xy (2,T_in), pred_pixel_xy (2,T_out)
         [, candidates_pixel_xy (K,2,T_out)]}.
        """
        ds = build_windows(tracks, self.cfg.data, self.tokenizer
                           if self.cfg.data.use_text else None)
        n = len(ds)
        if n == 0:
            return []
        results: List[Dict] = []
        B = self.batch_size
        rng = rng if rng is not None else jax.random.key(0)
        params = self._predict_params()
        for s in range(0, n, B):
            idx = np.arange(s, min(s + B, n))
            pad = B - len(idx)
            sel = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            full = ds.slice(sel).as_batch_dict()
            # restrict to the warmup pytree keys: jit caches on dict
            # structure, so extra keys would force a fresh compile
            batch = self._place_batch(
                {k: jnp.asarray(full[k]) for k in self._model_keys})
            norm_stat = jnp.asarray(full["norm_stat"])
            track_ids = full["track_id"]
            with self._attn_ctx():
                pred = self._predict(params, batch)
            pred_px = np.asarray(denorm(pred, norm_stat))
            past_px = np.asarray(denorm(batch["traj_in"], norm_stat))
            cands_px = None
            if self.num_candidates:
                with self._attn_ctx():
                    cands = self._rollout(params, batch,
                                          jax.random.fold_in(rng, s))
                K = self.num_candidates
                ns = jnp.repeat(norm_stat, K, axis=0)
                cands_px = np.asarray(denorm(
                    cands.reshape(B * K, 2, -1), ns)).reshape(
                    B, K, 2, -1)
            for j in range(len(idx)):
                rec = {"track_id": int(track_ids[j]),
                       "past_pixel_xy": past_px[j],
                       "pred_pixel_xy": pred_px[j]}
                if cands_px is not None:
                    rec["candidates_pixel_xy"] = cands_px[j]
                results.append(rec)
        return results
