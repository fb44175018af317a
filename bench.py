"""Benchmark: K-candidate trajectory prediction throughput on one TPU chip.

Workload = the reference's headline eval (ref scripts/test.py:1301-1382):
K=10 MC-dropout candidate rollouts of the FULL TSUE model (Q-Former +
Llama-3.2-1B LLM + LTSF forecaster) at the 18->18 horizon.  The reference
runs K sequential full-model forwards per batch in fp32 with host syncs
(ref scripts/test.py:1327-1339); here:

- "parity" mode: K forwards of the whole stochastic model (LLM dropout
  included), but as ONE vmap over explicit dropout keys, bf16 matmuls,
  zero host round-trips;
- "fast" mode (headline): the MLLM hidden states are computed ONCE per
  batch (deterministic at eval) and only the LTSF forecaster -- the part
  whose dropout drives candidate diversity -- is vmapped K times.  The
  candidate-metric equivalence of the two modes is measured in
  tests/test_fast_vs_parity.py and tabulated in PARITY.md; fast mode is a
  TPU-first redesign, not the reference's exact sampling distribution.

The headline number runs the REAL Llama-3.2-1B configuration
(vocab_size=128256, tied embeddings, 1.24B params); the byte-tokenizer
variant (vocab 384) is reported in detail for continuity with round 1.
detail also carries sampled-decode tok/s (KV-cached lax.scan with the full
128256-way LM-head matmul per step) and training-step latencies for the
frozen-MLLM and joint regimes (ref scripts/train.py:1151-1183).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is a FLOPs-derived estimate of the reference workload on an
A100-80GB: 1B-param fp32 model, 544-token sequence, K=10 sequential
forwards, 16-batch => ~17.4 TFLOP/forward; at a generous 40% MFU of 19.5
fp32 TFLOP/s => ~0.45 traj/s... we use 5 traj/s (assuming the operator ran
bf16/TF32 at high MFU) to stay conservative.  vs_baseline > 10 means the
north-star (>=10x reference) is met.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""
import json
import os
import sys
import threading
import time

import numpy as np

REFERENCE_TRAJ_PER_SEC_ESTIMATE = 5.0  # generous A100 estimate, see docstring
REAL_VOCAB = 128256                    # meta-llama/Llama-3.2-1B tied embed
BYTE_VOCAB = 384

# the driver kills bench.py at 600 s (BENCH_r04.json died at rc=124, mid
# bench_decode).  Every section logs its start offset; bench_decode
# degrades its window count when the clock runs hot.
_T0 = time.time()
DRIVER_BUDGET_S = 600.0


def _elapsed() -> float:
    return time.time() - _T0


# Budget gating (r5): the JSON artifact MUST print before the driver's
# 600 s cap — r4's run died at rc=124 with no machine-readable headline.
# Sections after the headline eval are each gated on remaining budget:
# a section whose warm-cache estimate (scaled by the measured coldness
# of the eval section — cold compiles ran ~4x warm in the r5 trial) no
# longer fits before the deadline is SKIPPED and recorded in
# detail["skipped_sections"], never faked.
_DEADLINE_S = 540.0
_COLD_FACTOR = [1.0]  # set after the eval section from its actual time


def _gate(detail: dict, name: str, warm_est_s: float,
          deadline: float = _DEADLINE_S) -> bool:
    """``deadline`` below the global one marks a LOW-priority section:
    it only runs when the clock is still early (a warm-cache run), so a
    cold run spends its budget on the high-value sections instead."""
    est = warm_est_s * min(_COLD_FACTOR[0], 3.0)
    if _elapsed() + est > min(deadline, _DEADLINE_S):
        log(f"SKIP {name}: est {est:.0f}s exceeds remaining budget "
            f"({min(deadline, _DEADLINE_S) - _elapsed():.0f}s) — "
            f"artifact must print")
        detail.setdefault("skipped_sections", []).append(name)
        return False
    return True


def log(*a):
    print(f"[t+{_elapsed():5.0f}s]", *a, file=sys.stderr, flush=True)


# The artifact-so-far, updated as sections complete, and the single print
# path.  A watchdog THREAD (not a signal handler: the remote-tunnel execute
# blocks in C for minutes, and Python signal handlers can't preempt that)
# dumps whatever is captured and hard-exits 0 shortly before the driver's
# 600 s kill.  Measured failure mode this guards: per-program first-execute
# on the shared tunnel swings 4-8x between sessions (a 45 s warm section ran
# 514 s on 2026-08-20), so even a gated section can overrun the wall — the
# artifact must print anyway.
_STATE: dict = {"fast_tps": None, "detail": None}
_PRINT_LOCK = threading.Lock()
_PRINTED = [False]
WATCHDOG_S = 575.0


def _emit() -> None:
    """Print the ONE JSON artifact line (idempotent, thread-safe)."""
    with _PRINT_LOCK:
        if _PRINTED[0]:
            return
        _PRINTED[0] = True
        fast_tps = _STATE["fast_tps"]
        detail = _STATE["detail"] or {}
        if fast_tps is None:
            detail = dict(detail)
            detail["error"] = ("headline eval did not complete within the "
                               "driver budget (tunnel stall) — see stderr")
        print(json.dumps({
            "metric": "K10_candidate_eval_trajectories_per_sec_per_chip",
            "value": round(fast_tps, 2) if fast_tps is not None else 0.0,
            "unit": "traj/s",
            "vs_baseline": (round(fast_tps / REFERENCE_TRAJ_PER_SEC_ESTIMATE,
                                  2) if fast_tps is not None else 0.0),
            "detail": detail,
        }), flush=True)


def _watchdog() -> None:
    time.sleep(max(0.0, WATCHDOG_S - _elapsed()))
    if _PRINTED[0]:
        return
    log(f"WATCHDOG: {WATCHDOG_S:.0f}s reached with a section still in "
        f"flight — emitting the artifact-so-far and exiting")
    if _STATE["detail"] is not None:
        _STATE["detail"].setdefault("skipped_sections", []).append(
            "watchdog_cutoff")
    _emit()
    sys.stdout.flush()
    os._exit(0)


def _cfg(vocab_size: int, batch_size: int, seq_len: int, out_len: int,
         text_len: int, dtype_str: str, regime: str = "frozen_mllm"):
    from tsue_tpu.config import (DataConfig, ExperimentConfig, LaneEncoderConfig,
                                 LlamaConfig, LTSFConfig, ModelConfig,
                                 QFormerConfig, TrainConfig)
    llama = LlamaConfig(vocab_size=vocab_size)
    model_cfg = ModelConfig(llama=llama, qformer=QFormerConfig(),
                            lane=LaneEncoderConfig(), ltsf=LTSFConfig(),
                            dtype=dtype_str)
    return ExperimentConfig(
        name="bench",
        data=DataConfig(seq_len=seq_len, out_len=out_len,
                        max_length=text_len),
        model=model_cfg,
        train=TrainConfig(batch_size=batch_size, freeze_regime=regime))


def bucket_batch(batch, text_lens, buckets=(256, 384, 512)):
    """Give the synthetic batch realistic per-row text lengths and trim
    to the smallest covering bucket — EXACTLY what BatchIterator._trim_text
    does in production (data/dataset.py; DataConfig.length_buckets is on
    by default since r4).  Rationale: the reference truncates text at 512
    tokens (ref scripts/train.py:1071) but its context paragraphs are
    ~430 CHARACTERS, i.e. well under 200 real-Llama-tokenizer tokens —
    full-width rows model the worst case, not the workload.  ``text_lens``
    (B,) valid token counts; pad positions are attention-masked and
    label-masked (metric-neutral, pinned by the bucket tests)."""
    import jax.numpy as jnp
    b = dict(batch)
    B, width = b["attention_mask"].shape
    lens = np.asarray(text_lens, np.int32)
    mask = (np.arange(width)[None, :] < lens[:, None]).astype(np.int32)
    bucket = next((k for k in sorted(buckets) if k >= lens.max()), width)
    b["attention_mask"] = jnp.asarray(mask[:, :bucket])
    b["input_ids"] = b["input_ids"][:, :bucket] * b["attention_mask"]
    b["labels"] = jnp.where(b["attention_mask"] == 1,
                            b["labels"][:, :bucket], -100)
    return b


def build(vocab_size: int, batch_size: int, seq_len: int, out_len: int,
          text_len: int, dtype_str: str):
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _make_batch
    from tsue_tpu.models.tsue import TrajectoryModel

    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    cfg = _cfg(vocab_size, batch_size, seq_len, out_len, text_len, dtype_str)
    model = TrajectoryModel(cfg.model, seq_len, out_len)
    batch = _make_batch(cfg, batch_size)

    log(f"init params (vocab {vocab_size}, {dtype_str})...")
    t0 = time.time()
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0),
                              "dropout": jax.random.key(1)}, b, False))(batch)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        variables["params"])
    n_params = sum(np.prod(x.shape) for x in jax.tree.leaves(params))
    log(f"  {n_params/1e9:.2f}B params in {time.time()-t0:.1f}s")
    return cfg, model, params, batch


def _timed(fn, iters: int, windows: int = 3) -> float:
    """Best-of-windows mean seconds per call.  fn must block on the result
    (the shared axon tunnel has transient multi-second stalls; the best
    window is the device-limited number)."""
    best = float("inf")
    for w in range(windows):
        t0 = time.time()
        for i in range(iters):
            fn(w * iters + i)
        best = min(best, (time.time() - t0) / iters)
    return best


def bench_mode(model, params, batch, K: int, mode: str, iters: int = 5,
               rng_impl: str | None = None):
    import jax
    import jax.numpy as jnp
    # the measured programs ARE the production eval paths
    from tsue_tpu.eval.metrics import candidate_rollout, fast_candidate_rollout

    if mode == "parity":
        def rollout(params, batch, rng):
            return candidate_rollout(
                lambda v, b, det, rngs: model.apply(v, b, det, rngs=rngs),
                {"params": params}, batch, K, rng)
    else:  # fast: MLLM context + cross-attn K/V once per batch
        def rollout(params, batch, rng):
            return fast_candidate_rollout(model, {"params": params}, batch,
                                          K, rng)

    step = jax.jit(rollout)
    rng = (jax.random.key(0, impl=rng_impl) if rng_impl
           else jax.random.key(0))
    t0 = time.time()
    lowered = step.lower(params, batch, rng)
    t1 = time.time()
    compiled = lowered.compile()   # disk-cache hit or tunnel compile
    t2 = time.time()
    # NB: block_until_ready under-reports on the remote-tunnel (axon)
    # platform; a host readback of a result-dependent scalar is the only
    # honest completion barrier, so each iteration sums the output.
    float(jnp.sum(compiled(params, batch, rng)))  # warmup (device load)
    t3 = time.time()
    log(f"  {mode}: trace {t1-t0:.0f}s compile {t2-t1:.0f}s "
        f"warmup {t3-t2:.0f}s")
    best = _timed(lambda i: float(jnp.sum(compiled(
        params, batch, jax.random.fold_in(rng, i)))), iters)
    B = batch["traj_in"].shape[0]
    return B / best, best


V5E_HBM_BW = 820e9   # bytes/s, v5e peak HBM bandwidth (public spec ~819 GB/s)


def bench_decode(vocab_size: int, batch_sizes=(16,), prompt_len: int = 144,
                 max_new: int = 64, iters: int = 3, int8: bool = False,
                 warm_deadline_s: float | None = None):
    """Sampled-generation throughput (new tokens/sec) with the full
    soft-prefix prefill + KV-cached scan decode (eval/generation.py) --
    per-step LM-head matmul at the given vocab size.

    Sweeps ``batch_sizes`` with INTERLEAVED timing windows (one model
    init; per CLAUDE.md, cross-run comparisons on the shared tunnel are
    noise -- only same-process interleaved numbers are comparable).
    ``int8=True`` additionally times the int8 weight-only decode
    (ops/quant.py), the fully-quantized serving point "int8kv"
    (int8 weights + int8 KV cache, ops/kv_quant.py), and the full
    production fast path "fast" (int8 + kv8 + fused LM-head+top-k,
    ops/lmhead_topk.py), all interleaved with the bf16 baseline.
    Returns {variant: ({bs: tok/s}, {bs: hbm_utilization})} with variants
    "base" (and "int8"/"int8kv"/"fast"); utilization is against each
    variant's own streamed-byte count, so it shows distance to the same
    820 GB/s roof.

    Roofline: decode is bandwidth-bound -- every step streams the full
    bf16 weight set (params x 2 bytes; the LM head reads the tied
    embedding) plus the live KV-cache slice, so
    ``steps/s <= BW / (weight_bytes + kv_bytes)`` and tok/s scales with
    batch until the KV term or MXU time takes over.  utilization =
    measured bytes/s over the ~820 GB/s v5e spec.
    """
    import jax
    import jax.numpy as jnp
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.ops.sampling import SamplingConfig

    llama = LlamaConfig(vocab_size=vocab_size)
    mllm = MultiModalLLM(llama, QFormerConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    max_bs = max(batch_sizes)
    vision = jnp.asarray(rng.standard_normal((max_bs, 18, 512)),
                         jnp.float32)
    prompt_ids = jnp.asarray(
        rng.integers(3, min(vocab_size, 50000), (max_bs, prompt_len)),
        jnp.int32)
    prompt_mask = jnp.ones((max_bs, prompt_len), jnp.int32)

    log(f"init mllm (vocab {vocab_size})...")
    variables = jax.jit(lambda v, i, m: mllm.init(
        {"params": jax.random.key(0)}, v, i, m, True))(
            vision[:1], prompt_ids[:1], prompt_mask[:1])
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    n_params = sum(np.prod(x.shape)
                   for x in jax.tree.leaves(variables["params"]))
    gen = make_generate_fn(mllm, SamplingConfig(), max_new, prompt_len,
                           eos_id=vocab_size - 1, pad_id=0)
    key = jax.random.key(0)

    variants = {"base": (variables, gen)}
    n_q = 0
    if int8:
        from tsue_tpu.ops.quant import quantize_llama_params
        qt = jax.jit(quantize_llama_params)(variables["params"])
        qvars = {**variables, "quant": qt}
        variants["int8"] = (qvars, gen)
        n_q = sum(np.prod(x.shape) for x in jax.tree.leaves(qt)
                  if x.dtype == jnp.int8)
        gen_kv = make_generate_fn(mllm, SamplingConfig(), max_new,
                                  prompt_len, eos_id=vocab_size - 1,
                                  pad_id=0, quantize_kv=True)
        variants["int8kv"] = (qvars, gen_kv)
        # int8 + kv8 + the fused LM-head+top-k kernel (ops/lmhead_topk.py
        # — logits never materialized; requires 0 < top_k < 128, which
        # the production SamplingConfig satisfies).  Measured regime
        # (scripts/ab_fused_head.py): a +6% win at bs16 (latency point),
        # a loss at bs64+ where the one big XLA LM-head matmul beats the
        # V-tiled streaming — reported per-bs so the crossover is visible.
        gen_fast = make_generate_fn(mllm, SamplingConfig(), max_new,
                                    prompt_len, eos_id=vocab_size - 1,
                                    pad_id=0, quantize_kv=True,
                                    fused_head=True)
        variants["fast"] = (qvars, gen_fast)

    def run(name, bs, k):
        vs, g = variants[name]
        return int(np.asarray(g(
            vs, vision[:bs], prompt_ids[:bs],
            prompt_mask[:bs], k)).sum())

    # warmup/compile in PRIORITY order (base and int8 carry the roofline
    # story; int8kv/fast are refinements) with a budget stop: per-program
    # first-execute on the shared tunnel swings 4-8x between sessions, so
    # on a slow day the sweep degrades to the leading arms instead of
    # eating the stage-1/train sections' budget.  The timing windows below
    # run only over the warmed subset — still fully interleaved, so the
    # cross-arm comparisons stay same-process honest.
    combos = [(n, bs) for n in variants for bs in batch_sizes]
    warmed = []
    for name, bs in combos:
        if warm_deadline_s is not None and _elapsed() > warm_deadline_s \
                and warmed:
            dropped = [c_ for c_ in combos if c_ not in warmed]
            log(f"decode sweep: warm deadline {warm_deadline_s:.0f}s hit — "
                f"dropping arms {dropped}")
            break
        run(name, bs, key)
        warmed.append((name, bs))
    combos = warmed
    best = {c_: float("inf") for c_ in combos}
    # degrade interleaved windows when the driver budget runs hot: two
    # windows still bracket transient tunnel stalls, and a finished
    # artifact beats a third sample (r4's died at rc=124)
    n_windows = 3 if _elapsed() < 0.6 * DRIVER_BUDGET_S else 2
    for w in range(n_windows):                   # interleaved windows
        for name, bs in combos:
            t0 = time.time()
            for i in range(iters):
                run(name, bs, jax.random.fold_in(key, w * iters + i))
            best[(name, bs)] = min(best[(name, bs)],
                                   (time.time() - t0) / iters)

    # bytes per decode step: full weight stream + average live KV slice.
    # int8 streams the quantized projections/LM-head as 1 byte and skips
    # the bf16 tied-embedding matmul read (the token gather is B rows).
    c = llama
    n_img = mllm.qformer.num_query_tokens
    i8w = float(n_params - n_q) * 2.0 + float(n_q)
    weight_bytes = {"base": float(n_params) * 2.0, "int8": i8w,
                    "int8kv": i8w, "fast": i8w}
    avg_len = prompt_len + n_img + max_new / 2.0
    out = {}
    for name in variants:
        tok_per_sec, hbm_util = {}, {}
        for bs in batch_sizes:
            if (name, bs) not in best:
                continue  # dropped at the warm deadline
            # int8kv: cache tokens stream 1 byte + a f32 scale per
            # (token, head) vector (Dh values share one scale)
            kv_elt = (1.0 + 4.0 / c.head_dim) if name in ("int8kv", "fast") \
                else 2.0
            kv_bytes = (bs * avg_len * c.num_layers * 2 * c.num_kv_heads
                        * c.head_dim * kv_elt)
            steps_per_sec = max_new / best[(name, bs)]
            tok_per_sec[bs] = bs * steps_per_sec
            hbm_util[bs] = steps_per_sec * (weight_bytes[name] + kv_bytes) \
                / V5E_HBM_BW
        if tok_per_sec:
            out[name] = (tok_per_sec, hbm_util)
    return out


def stage1_step_setup(vocab_size: int, batch_size: int = 8,
                      text_len: int = 512, loss_chunk: int = 128,
                      remat_policy: str = "", params=None):
    """Build the canonical stage-1 LM-step workload: the jitted donated
    step, initialized (params, opt_state) and a synthetic batch.  Shared
    by bench_stage1_step and scripts/ab_rng_steps.py so the PARITY-cited
    A/Bs measure exactly the benched workload.

    ``params``: reuse an existing stage-1 tree instead of re-initializing
    (the tree's structure is independent of batch/chunk/remat — bench.py
    shares ONE ~12 s init across its two stage-1 shapes; r4's bench blew
    the driver's 600 s budget largely on repeated 1.3B inits).

    Chunked CE (models/llama.py causal_lm_loss_chunked) instead of
    per-layer remat: the dense full-vocab loss (f32 logits (B, 528,
    128256) ~2.2 GB + d_logits) OOMs without remat, while the chunked
    loss fits WITHOUT remat and skips the layer recompute.  Measured
    shape sweep (scripts/ab_stage1_shape.py, post frozen-dW DCE):
    bs8+chunk128 363 ms / bs8+chunk264 321 / bs16+chunk264+dots 528
    (33.0 ms/sample — the throughput shape; bs16 needs remat headroom).
    """
    import jax
    import jax.numpy as jnp
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.train.stage1 import (make_stage1_optimizer,
                                       make_stage1_train_step)

    import dataclasses
    cfg = _cfg(vocab_size, batch_size, 18, 18, text_len, "bfloat16")
    llama = dataclasses.replace(cfg.model.llama, loss_chunk=loss_chunk,
                                remat=bool(remat_policy),
                                remat_policy=remat_policy or "full")
    mllm = MultiModalLLM(llama, cfg.model.qformer, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "vision": jnp.asarray(
            rng.standard_normal((batch_size, 18, 512)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(3, min(vocab_size, 50000),
                         (batch_size, text_len)), jnp.int32),
        "attention_mask": jnp.ones((batch_size, text_len), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(3, min(vocab_size, 50000),
                         (batch_size, text_len)), jnp.int32),
    }
    if params is None:
        log(f"init stage-1 mllm (vocab {vocab_size})...")
        variables = jax.jit(lambda b: mllm.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            b["vision"], b["input_ids"], b["attention_mask"]))(batch)
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables["params"])
        del variables  # the fp32 init tree (~5.2 GB) must not stay pinned
    tx = make_stage1_optimizer(cfg, params)
    opt_state = tx.init(params)
    step = jax.jit(make_stage1_train_step(mllm, tx), donate_argnums=(0, 1))
    return step, params, opt_state, batch


def bench_stage1_step(vocab_size: int, batch_size: int = 8,
                      text_len: int = 512, iters: int = 3,
                      loss_chunk: int = 128, remat_policy: str = "",
                      params=None):
    """Stage-1 MLLM LM fine-tune step latency, ms (fwd+bwd+update of the
    causal-LM loss over the fused [img || text] sequence at the full
    vocab).  The production path: train/stage1.py make_stage1_train_step
    (LoRA + Q-Former + modality embeddings trainable, base Llama frozen).
    Ref flow: the training side of scripts/check_generation.py.

    Returns ``(best_ms, final_params)`` — the evolved tree so the caller
    can feed the next stage-1 shape without another init."""
    import jax
    step, params, opt_state, batch = stage1_step_setup(
        vocab_size, batch_size, text_len, loss_chunk=loss_chunk,
        remat_policy=remat_policy, params=params)
    k = jax.random.key(0)
    params, opt_state, m = step(params, opt_state, batch, k)
    float(m["lm_loss"])  # warmup + compile

    def one(i):
        nonlocal params, opt_state
        params, opt_state, m = step(params, opt_state, batch, k)
        float(m["lm_loss"])
    best = _timed(one, iters, windows=2)
    del opt_state
    return best * 1000.0, params


def bench_train_step(cfg, model, params, batch, iters: int = 5,
                     rng_impl: str = "threefry2x32",
                     copy_params: bool = True):
    """One stage-2 training step (fwd+bwd+update) latency, ms.

    Matches the production runner: donated state (runner.py jits with
    donate_argnums=0).  ``params`` is copied first so the caller's tree
    survives the donation; the LAST measurement on a tree can pass
    ``copy_params=False`` to donate the caller's buffers instead (the
    joint+dots variant needs the ~2.6 GB back for its saved activations).
    """
    import jax
    import jax.numpy as jnp
    from tsue_tpu.train.trainer import (TrainState, make_optimizer,
                                        make_train_step)

    def apply_fn(vs, b, det, rngs=None, **kw):
        return model.apply(vs, b, det, rngs=rngs, **kw)

    own = jax.tree.map(jnp.copy, params) if copy_params else params
    tx = make_optimizer(cfg, own)
    state = TrainState.create(apply_fn, own, tx)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    rng = jax.random.key(0, impl=rng_impl)
    state, m = step(state, batch, rng)
    float(m["loss"])  # warmup + compile

    def one(i):
        nonlocal state
        state, m = step(state, batch, rng)
        float(m["loss"])
    best = _timed(one, iters, windows=2)
    del state
    return best * 1000.0


def main():
    import jax
    try:  # executable cache across bench runs (keyed by HLO)
        from tsue_tpu.utils.jax_cache import configure
        configure(jax, min_secs=5.0)
    except Exception:
        pass
    dev = jax.devices()[0]
    log(f"device: {dev}")
    K = 10
    detail = _STATE["detail"] = {"device": str(dev),
              "model": "TSUE full (QFormer + Llama-3.2-1B bf16 + LTSF)",
              "config": ("18->18, batch 64 (16 parity), K=10, text cap 512 "
                         "with realistic 160-240-token rows bucketed to 256 "
                         "(the r4 default length buckets; full-width-512 "
                         "variant in fast_mode_traj_per_sec_fullwidth512)"),
              "reference_estimate_traj_per_sec": REFERENCE_TRAJ_PER_SEC_ESTIMATE,
              "measurement_note": ("shared-tunnel TPU; ambient throughput "
                                   "varies up to ~30% between sessions - "
                                   "cross-run deltas under that margin are "
                                   "noise (PARITY.md)")}

    # --- headline: REAL Llama-3.2-1B vocab (128256, tied embeddings) -----
    # fast mode amortizes dispatch overhead at batch 64 (B=16 -> 40 t/s,
    # B=32 -> 94, B=64 -> 106 measured); parity mode keeps the reference's
    # batch 16 (vmapped K=10 of the full 1B model is memory-heavier)
    cfg, model, params, batch = build(REAL_VOCAB, batch_size=64, seq_len=18,
                                      out_len=18, text_len=512,
                                      dtype_str="bfloat16")
    # HEADLINE workload (r4): realistic text lengths + the default length
    # buckets (DataConfig.length_buckets).  The reference's ~430-char
    # context paragraphs tokenize to well under 200 real-Llama tokens;
    # rows drawn 160-240 tokens land every batch in the 256 bucket — the
    # production shape.  The full-width (all-512) variant stays in detail
    # for continuity with rounds 1-3.
    text_lens = np.random.default_rng(3).integers(160, 241, 64)
    bbatch = bucket_batch(batch, text_lens)
    fast_tps, fast_dt = bench_mode(model, params, bbatch, K, "fast")
    log(f"real-vocab fast bucketed: {fast_tps:.1f} traj/s "
        f"({fast_dt*1000:.0f} ms/b, text bucket "
        f"{bbatch['attention_mask'].shape[1]})")
    detail["fast_mode_traj_per_sec"] = round(fast_tps, 2)
    _STATE["fast_tps"] = fast_tps  # watchdog can emit from here on
    # coldness, from the one mandatory program: init+bucketed run ~70 s
    # warm vs ~340 s under cold compiles / tunnel stalls (both observed;
    # the shared tunnel can stall for minutes) — scale every later gate
    # estimate by it so a slow run degrades to fewer sections instead of
    # a killed artifact
    _COLD_FACTOR[0] = max(1.0, _elapsed() / 70.0)
    log(f"cold factor {_COLD_FACTOR[0]:.1f} (headline at {_elapsed():.0f}s)")
    batch16 = {k: v[:16] for k, v in batch.items()}
    # parity runs right after the headline: it shares the headline's live
    # params (no init) and warmed 4-30 s in every r5 trial, and it is the
    # reference-semantics continuity number.  Still gated: its warmup drew
    # 80+ s on one cold-terminal day — starting it at t+559 nearly blew
    # the wall (wall=588 observed); the watchdog would now catch that,
    # but a skip keeps rc=0 deterministic
    if _gate(detail, "eval_parity", 45):
        parity_tps, parity_dt = bench_mode(model, params, batch16, K,
                                           "parity", iters=2)
        log(f"real-vocab parity: {parity_tps:.1f} traj/s "
            f"({parity_dt*1000:.0f} ms/b)")
        detail["parity_mode_traj_per_sec"] = round(parity_tps, 2)
    # --- sampled-decode throughput: batch sweep + HBM roofline -----------
    # decode streams the full bf16 weight set every step, so larger
    # batches amortize the weight reads; utilization = measured
    # bytes/s / 820 GB/s v5e HBM spec (see bench_decode docstring)
    # knee at ~bs128: bs256 measured only +10%/+5% (bf16/int8) over
    # bs128 — beyond the weight-stream amortization the B-proportional
    # V-wide sampler work dominates (decode-step profile, PARITY.md)
    # Sweep trimmed to the two load-bearing points (latency bs16 /
    # throughput bs128): the r4 4-point sweep blew the driver's 600 s cap
    # (BENCH_r04.json rc=124); intermediate points live in
    # scripts/ab_fused_head.py runs (PARITY.md kernels table).  The
    # warm deadline bounds the sweep's 8 first-executes (~370 s observed
    # on a mid-weather day) so the stage-1/train sections keep a slot;
    # arms dropped at the deadline are logged and the keys omitted.
    if _gate(detail, "decode", 110):
        sweep = (16, 128)
        decode = bench_decode(REAL_VOCAB, batch_sizes=sweep, int8=True,
                              iters=2, warm_deadline_s=330.0)
        key_of = {"base": "", "int8": "_int8", "int8kv": "_int8kv",
                  "fast": "_int8kv_fusedhead"}
        for arm, (tok, util) in decode.items():
            for bs in tok:
                log(f"decode real-vocab {arm} bs{bs}: {tok[bs]:.0f} tok/s "
                    f"(HBM util {util[bs]*100:.0f}%)")
            detail[f"decode_tok_per_sec_vocab128256{key_of[arm]}_by_bs"] = {
                str(bs): round(tok[bs], 1) for bs in tok}
            if arm != "fast":  # fused-head shares int8kv's byte stream
                detail[f"decode_hbm_utilization{key_of[arm]}_by_bs"] = {
                    str(bs): round(util[bs], 3) for bs in util}
        base_tok = decode.get("base", ({},))[0]
        if 16 in base_tok:
            detail["decode_tok_per_sec_vocab128256"] = round(base_tok[16], 1)
    # optimized parity: Pallas flash attention (no fp32 logit
    # materialization) + hardware-RNG dropout keys — measured +6% in the
    # interleaved study (PARITY.md "Parity-mode eval profile"); identical
    # sampling distribution, different (equally random) draws.  LOW
    # priority: a +6% variant of an already-captured number.
    if _gate(detail, "eval_parity_optimized", 40, deadline=420):
        from tsue_tpu.ops.attention import attention_impl
        with attention_impl("pallas"):
            popt_tps, popt_dt = bench_mode(model, params, batch16, K,
                                           "parity", iters=2,
                                           rng_impl="rbg")
        log(f"real-vocab parity optimized: {popt_tps:.1f} traj/s "
            f"({popt_dt*1000:.0f} ms/b)")
        detail["parity_mode_traj_per_sec_optimized"] = round(popt_tps, 2)

    # full-width-512 variant (rounds 1-3 continuity): LOW priority — on a
    # cold run the budget goes to parity/decode/stage-1 instead
    if _gate(detail, "eval_fullwidth", 30, deadline=400):
        fastfw_tps, fastfw_dt = bench_mode(model, params, batch, K, "fast")
        log(f"real-vocab fast fullwidth: {fastfw_tps:.1f} traj/s "
            f"({fastfw_dt*1000:.0f} ms/b)")
        detail["fast_mode_traj_per_sec_fullwidth512"] = round(fastfw_tps, 2)
    del params, batch, batch16  # free the eval buffers first (1.31B bf16)
    # --- stage-1 LM fine-tune step (ref check_generation.py train side) --
    if _gate(detail, "stage1", 70):
        # ONE init shared by both shapes (the tree structure is shape-free)
        s1_ms, s1_params = bench_stage1_step(REAL_VOCAB)
        log(f"stage-1 LM step: {s1_ms:.0f} ms (bs8, text 512, full vocab)")
        detail["stage1_lm_step_ms_bs8"] = round(s1_ms, 1)
        # optimized shape (scripts/ab_stage1_shape.py): bs16 + chunk=T/2 +
        # dots remat — 33.0 ms/sample vs 45.4 at bs8+chunk128, ~50% MFU on
        # the 6NBT convention (the step executes fewer FLOPs since the
        # frozen-dW DCE fix, scripts/ab_frozen_dce.py)
        s1o_ms, s1_params = bench_stage1_step(REAL_VOCAB, batch_size=16,
                                              loss_chunk=264,
                                              remat_policy="dots",
                                              params=s1_params)
        del s1_params
        log(f"stage-1 LM step optimized: {s1o_ms:.0f} ms "
            f"(bs16, chunk 264, dots = {s1o_ms/16:.1f} ms/sample)")
        detail["stage1_lm_step_ms_bs16_optimized"] = round(s1o_ms, 1)
        detail["stage1_lm_ms_per_sample_optimized"] = round(s1o_ms / 16, 2)

    # --- training-step latency (real vocab, reference batch 16, 18->30) --
    if _gate(detail, "train_frozen", 45):
        tcfg, tmodel, tparams, tbatch = build(
            REAL_VOCAB, batch_size=16, seq_len=18, out_len=30,
            text_len=512, dtype_str="bfloat16")
        import dataclasses
        frozen_ms = bench_train_step(tcfg, tmodel, tparams, tbatch)
        log(f"train step frozen-MLLM: {frozen_ms:.0f} ms (bs16, 18->30)")
        # rng_impl="rbg" (TrainConfig knob): hardware-RNG dropout stream —
        # the interleaved A/B measured -11% vs threefry on this step
        frozen_rbg_ms = bench_train_step(tcfg, tmodel, tparams, tbatch,
                                         rng_impl="rbg")
        log(f"train step frozen-MLLM (rbg rng): {frozen_rbg_ms:.0f} ms")
        detail["train_step_frozen_mllm_ms_bs16"] = round(frozen_ms, 1)
        detail["train_step_frozen_mllm_ms_bs16_rbg"] = round(frozen_rbg_ms, 1)
        if _gate(detail, "train_joint", 60):
            # joint regime backprops through all 16 Llama layers AND keeps
            # AdamW moments for 1.31B params; per-layer remat keeps the
            # activations inside one v5e chip's HBM at the reference batch
            jcfg = dataclasses.replace(
                tcfg,
                model=dataclasses.replace(
                    tcfg.model,
                    llama=dataclasses.replace(tcfg.model.llama, remat=True)),
                train=dataclasses.replace(tcfg.train, freeze_regime="joint"))
            from tsue_tpu.models.tsue import TrajectoryModel
            jmodel = TrajectoryModel(jcfg.model, 18, 30)
            joint_ms = bench_train_step(jcfg, jmodel, tparams, tbatch)
            log(f"train step joint      : {joint_ms:.0f} ms "
                f"(bs16, 18->30, remat)")
            # optimized joint: remat_policy="dots" (backward recomputes
            # only elementwise, -10.7% interleaved) + rbg dropout keys
            # (-5.2%) — scripts/ab_remat_policy.py / ab_rng_steps.py
            jocfg = dataclasses.replace(
                jcfg,
                model=dataclasses.replace(
                    jcfg.model,
                    llama=dataclasses.replace(jcfg.model.llama,
                                              remat_policy="dots")))
            jomodel = TrajectoryModel(jocfg.model, 18, 30)
            # last consumer of tparams: donate instead of copying so the
            # saved dot activations fit beside the AdamW state
            joint_opt_ms = bench_train_step(jocfg, jomodel, tparams, tbatch,
                                            rng_impl="rbg",
                                            copy_params=False)
            log(f"train step joint (dots+rbg): {joint_opt_ms:.0f} ms")
            detail["train_step_joint_remat_ms_bs16"] = round(joint_ms, 1)
            detail["train_step_joint_remat_ms_bs16_optimized"] = \
                round(joint_opt_ms, 1)
        del tparams, tbatch


    if _gate(detail, "decode_byte", 30):
        byte_tok, _ = bench_decode(BYTE_VOCAB)["base"]
        log(f"decode byte-vocab: {byte_tok[16]:.0f} tok/s")
        detail["decode_tok_per_sec_vocab384"] = round(byte_tok[16], 1)

    # --- round-1 continuity: byte-tokenizer vocab (384) ------------------
    if _gate(detail, "eval_byte", 45):
        _, bmodel, bparams, bbatch = build(BYTE_VOCAB, batch_size=64,
                                           seq_len=18, out_len=18,
                                           text_len=512,
                                           dtype_str="bfloat16")
        bfast_tps, _ = bench_mode(bmodel, bparams, bbatch, K, "fast")
        log(f"byte-vocab fast  : {bfast_tps:.1f} traj/s")
        bbatch16 = {k: v[:16] for k, v in bbatch.items()}
        bparity_tps, _ = bench_mode(bmodel, bparams, bbatch16, K, "parity",
                                    iters=2)
        log(f"byte-vocab parity: {bparity_tps:.1f} traj/s")
        detail["fast_mode_traj_per_sec_vocab384"] = round(bfast_tps, 2)
        detail["parity_mode_traj_per_sec_vocab384"] = round(bparity_tps, 2)

    _emit()


if __name__ == "__main__":
    threading.Thread(target=_watchdog, daemon=True).start()
    for _attempt in range(2):  # transient tunnel/TPU hiccups: one retry
        try:
            main()
            break
        except Exception as e:
            log(f"bench attempt failed ({type(e).__name__}: {e})")
            if _attempt:
                _emit()  # artifact-so-far still prints under a hard failure
                raise
        # retry OUTSIDE the except block: the live traceback would pin the
        # failed attempt's device buffers and double HBM pressure
        import gc
        gc.collect()
        time.sleep(20)
