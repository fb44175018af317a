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
import sys
import time

import numpy as np

REFERENCE_TRAJ_PER_SEC_ESTIMATE = 5.0  # generous A100 estimate, see docstring
REAL_VOCAB = 128256                    # meta-llama/Llama-3.2-1B tied embed
BYTE_VOCAB = 384


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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


def bench_mode(model, params, batch, K: int, mode: str, iters: int = 5):
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
    rng = jax.random.key(0)
    # NB: block_until_ready under-reports on the remote-tunnel (axon)
    # platform; a host readback of a result-dependent scalar is the only
    # honest completion barrier, so each iteration sums the output.
    float(jnp.sum(step(params, batch, rng)))  # warmup + compile
    best = _timed(lambda i: float(jnp.sum(step(
        params, batch, jax.random.fold_in(rng, i)))), iters)
    B = batch["traj_in"].shape[0]
    return B / best, best


def bench_decode(vocab_size: int, batch_size: int = 16, prompt_len: int = 144,
                 max_new: int = 64, iters: int = 3):
    """Sampled-generation throughput (new tokens/sec) with the full
    soft-prefix prefill + KV-cached scan decode (eval/generation.py) --
    per-step LM-head matmul at the given vocab size."""
    import jax
    import jax.numpy as jnp
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.ops.sampling import SamplingConfig

    llama = LlamaConfig(vocab_size=vocab_size)
    mllm = MultiModalLLM(llama, QFormerConfig(), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vision = jnp.asarray(rng.standard_normal((batch_size, 18, 512)),
                         jnp.float32)
    prompt_ids = jnp.asarray(
        rng.integers(3, min(vocab_size, 50000), (batch_size, prompt_len)),
        jnp.int32)
    prompt_mask = jnp.ones((batch_size, prompt_len), jnp.int32)

    log(f"init mllm (vocab {vocab_size})...")
    variables = jax.jit(lambda v, i, m: mllm.init(
        {"params": jax.random.key(0)}, v, i, m, True))(
            vision, prompt_ids, prompt_mask)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    gen = make_generate_fn(mllm, SamplingConfig(), max_new, prompt_len,
                           eos_id=vocab_size - 1, pad_id=0)
    key = jax.random.key(0)
    int(np.asarray(gen(variables, vision, prompt_ids, prompt_mask,
                       key)).sum())  # warmup + compile
    best = _timed(lambda i: int(np.asarray(gen(
        variables, vision, prompt_ids, prompt_mask,
        jax.random.fold_in(key, i))).sum()), iters)
    return batch_size * max_new / best


def bench_train_step(cfg, model, params, batch, iters: int = 5):
    """One stage-2 training step (fwd+bwd+update) latency, ms.

    Matches the production runner: donated state (runner.py jits with
    donate_argnums=0).  ``params`` is copied first so the caller's tree
    survives the donation.
    """
    import jax
    import jax.numpy as jnp
    from tsue_tpu.train.trainer import (TrainState, make_optimizer,
                                        make_train_step)

    def apply_fn(vs, b, det, rngs=None, **kw):
        return model.apply(vs, b, det, rngs=rngs, **kw)

    own = jax.tree.map(jnp.copy, params)
    tx = make_optimizer(cfg, own)
    state = TrainState.create(apply_fn, own, tx)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    rng = jax.random.key(0)
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
    detail = {"device": str(dev),
              "model": "TSUE full (QFormer + Llama-3.2-1B bf16 + LTSF)",
              "config": "18->18, batch 64 (16 parity), K=10, text 512",
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
    fast_tps, fast_dt = bench_mode(model, params, batch, K, "fast")
    log(f"real-vocab fast  : {fast_tps:.1f} traj/s ({fast_dt*1000:.0f} ms/b)")
    batch16 = {k: v[:16] for k, v in batch.items()}
    parity_tps, parity_dt = bench_mode(model, params, batch16, K, "parity",
                                       iters=2)
    log(f"real-vocab parity: {parity_tps:.1f} traj/s ({parity_dt*1000:.0f} ms/b)")
    detail["fast_mode_traj_per_sec"] = round(fast_tps, 2)
    detail["parity_mode_traj_per_sec"] = round(parity_tps, 2)

    # --- training-step latency (real vocab, reference batch 16, 18->30) --
    del params, batch, batch16  # free the eval buffers first (1.31B bf16)
    tcfg, tmodel, tparams, tbatch = build(REAL_VOCAB, batch_size=16,
                                          seq_len=18, out_len=30,
                                          text_len=512, dtype_str="bfloat16")
    import dataclasses
    frozen_ms = bench_train_step(tcfg, tmodel, tparams, tbatch)
    log(f"train step frozen-MLLM: {frozen_ms:.0f} ms (bs16, 18->30)")
    # joint regime backprops through all 16 Llama layers AND keeps AdamW
    # moments for 1.31B params; per-layer remat keeps the activations
    # inside one v5e chip's HBM at the reference batch size
    jcfg = dataclasses.replace(
        tcfg,
        model=dataclasses.replace(
            tcfg.model, llama=dataclasses.replace(tcfg.model.llama,
                                                  remat=True)),
        train=dataclasses.replace(tcfg.train, freeze_regime="joint"))
    from tsue_tpu.models.tsue import TrajectoryModel
    jmodel = TrajectoryModel(jcfg.model, 18, 30)
    joint_ms = bench_train_step(jcfg, jmodel, tparams, tbatch)
    log(f"train step joint      : {joint_ms:.0f} ms (bs16, 18->30, remat)")
    detail["train_step_frozen_mllm_ms_bs16"] = round(frozen_ms, 1)
    detail["train_step_joint_remat_ms_bs16"] = round(joint_ms, 1)
    del tparams, tbatch

    # --- sampled-decode throughput ---------------------------------------
    real_tok = bench_decode(REAL_VOCAB)
    log(f"decode real-vocab: {real_tok:.0f} tok/s (bs16, prompt 144, 64 new)")
    byte_tok = bench_decode(BYTE_VOCAB)
    log(f"decode byte-vocab: {byte_tok:.0f} tok/s")
    detail["decode_tok_per_sec_vocab128256"] = round(real_tok, 1)
    detail["decode_tok_per_sec_vocab384"] = round(byte_tok, 1)

    # --- round-1 continuity: byte-tokenizer vocab (384) ------------------
    _, bmodel, bparams, bbatch = build(BYTE_VOCAB, batch_size=64, seq_len=18,
                                       out_len=18, text_len=512,
                                       dtype_str="bfloat16")
    bfast_tps, _ = bench_mode(bmodel, bparams, bbatch, K, "fast")
    log(f"byte-vocab fast  : {bfast_tps:.1f} traj/s")
    bbatch16 = {k: v[:16] for k, v in bbatch.items()}
    bparity_tps, _ = bench_mode(bmodel, bparams, bbatch16, K, "parity",
                                iters=2)
    log(f"byte-vocab parity: {bparity_tps:.1f} traj/s")
    detail["fast_mode_traj_per_sec_vocab384"] = round(bfast_tps, 2)
    detail["parity_mode_traj_per_sec_vocab384"] = round(bparity_tps, 2)

    print(json.dumps({
        "metric": "K10_candidate_eval_trajectories_per_sec_per_chip",
        "value": round(fast_tps, 2),
        "unit": "traj/s",
        "vs_baseline": round(fast_tps / REFERENCE_TRAJ_PER_SEC_ESTIMATE, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    for _attempt in range(2):  # transient tunnel/TPU hiccups: one retry
        try:
            main()
            break
        except Exception as e:
            log(f"bench attempt failed ({type(e).__name__}: {e})")
            if _attempt:
                raise
        # retry OUTSIDE the except block: the live traceback would pin the
        # failed attempt's device buffers and double HBM pressure
        import gc
        gc.collect()
        time.sleep(20)
