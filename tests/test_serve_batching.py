"""Continuous batching (serve_batching.py) contracts.

The load-bearing property: with per-request PRNG keys, a request's
generated tokens are IDENTICAL whether it runs alone (single-request
reference decode below) or through the slot pool with arbitrary
co-batched traffic, admission order, and chunking — slots are perfectly
isolated.  Plus the vector-step decode path (models/fusion.py
decode_step with (B,) step_index) must match the scalar path bitwise
when all rows share the same step.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import LlamaConfig, QFormerConfig
from tsue_tpu.models.fusion import MultiModalLLM
from tsue_tpu.ops.sampling import SamplingConfig, process_and_sample_per_row
from tsue_tpu.serve_batching import ContinuousBatcher

VOCAB = 64
EOS = VOCAB - 1
PROMPT_LEN = 6
T_VIS = 4


@pytest.fixture(scope="module")
def mllm_and_vars():
    llama = dataclasses.replace(LlamaConfig.tiny(VOCAB), lora_dropout=0.0)
    qf = QFormerConfig(hidden_size=32, num_heads=2, num_encoder_layers=1,
                       num_decoder_layers=1, num_query_tokens=4,
                       dropout=0.0)
    mllm = MultiModalLLM(llama, qf)
    rng = np.random.default_rng(0)
    vision = jnp.asarray(rng.standard_normal((1, T_VIS, 512)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, VOCAB - 1, (1, PROMPT_LEN)), jnp.int32)
    mask = jnp.ones((1, PROMPT_LEN), jnp.int32)
    variables = mllm.init({"params": jax.random.key(0)}, vision, ids, mask,
                          True)
    return mllm, variables


def _requests(n, seed=7):
    """n requests with varied prompts/vision/keys/max_new."""
    rng = np.random.default_rng(seed)
    reqs = []
    for i in range(n):
        plen = int(rng.integers(2, PROMPT_LEN + 1))
        ids = np.zeros(PROMPT_LEN, np.int32)
        ids[:plen] = rng.integers(3, VOCAB - 1, plen)
        mask = np.zeros(PROMPT_LEN, np.int32)
        mask[:plen] = 1
        reqs.append({
            "vision": rng.standard_normal((T_VIS, 512)).astype(np.float32),
            "prompt_ids": ids, "prompt_mask": mask,
            "rng": jax.random.key(1000 + i),
            "max_new": int(rng.integers(2, 9)),
        })
    return reqs


def _reference_decode(mllm, variables, req, sampling, max_new_tokens,
                      pad_id=0):
    """Single-request decode with the batcher's exact key discipline:
    per-row keys advanced via vmap(split) once per step."""
    n_img = mllm.qformer.num_query_tokens if mllm.use_vision else 0
    P = n_img + PROMPT_LEN
    cache_len = P + max_new_tokens
    vision = (jnp.asarray(req["vision"])[None]
              if "vision" in req else None)
    ids = jnp.asarray(req["prompt_ids"], jnp.int32)[None]
    mask = jnp.asarray(req["prompt_mask"], jnp.int32)[None]
    caches, last_hidden, plen, fmask = mllm.apply(
        variables, vision, ids, mask, cache_len, method=mllm.prefill)
    logits = mllm.apply(
        variables, last_hidden,
        method=lambda m, h: m.llama_mod.logits_from_hidden(h)
    ).astype(jnp.float32)
    history = jnp.concatenate(
        [ids, jnp.full((1, max_new_tokens), pad_id, jnp.int32)], axis=1)
    hlen = mask.sum(axis=1).astype(jnp.int32)
    keys = req["rng"][None]
    step = jnp.zeros((1,), jnp.int32)
    toks = []
    for _ in range(req["max_new"]):
        split = jax.vmap(jax.random.split)(keys)
        tok = process_and_sample_per_row(logits, split[:, 0], history,
                                         hlen, sampling).astype(jnp.int32)
        toks.append(int(tok[0]))
        if toks[-1] == EOS:
            break
        history = history.at[jnp.arange(1), hlen].set(tok)
        hlen = hlen + 1
        logits, caches = mllm.apply(
            variables, tok, step, plen, caches, fmask, cache_len,
            method=mllm.decode_step)
        logits = logits.astype(jnp.float32)
        keys = split[:, 1]
        step = step + 1
    if toks and toks[-1] == EOS:
        toks = toks[:-1]
    return np.asarray(toks, np.int32)


def test_batcher_matches_single_request_reference(mllm_and_vars):
    mllm, variables = mllm_and_vars
    sampling = SamplingConfig(temperature=1.0, top_k=8, top_p=0.9,
                              repetition_penalty=1.2,
                              no_repeat_ngram_size=3)
    reqs = _requests(5)
    batcher = ContinuousBatcher(mllm, variables, sampling, num_slots=2,
                                prompt_len=PROMPT_LEN, max_new_tokens=8,
                                eos_id=EOS, chunk=3)
    got = batcher.run(reqs)
    assert len(got) == len(reqs)
    for i, req in enumerate(reqs):
        ref = _reference_decode(mllm, variables, req, sampling, 8)
        np.testing.assert_array_equal(
            got[i], ref,
            err_msg=f"request {i} diverged from its solo decode")


def test_batcher_insensitive_to_pool_geometry(mllm_and_vars):
    """Same requests through a different pool size + chunking must yield
    identical tokens (per-request keys decouple them from scheduling)."""
    mllm, variables = mllm_and_vars
    sampling = SamplingConfig(temperature=1.0, top_k=8, top_p=0.9,
                              repetition_penalty=1.2,
                              no_repeat_ngram_size=3)
    reqs = _requests(4, seed=11)
    a = ContinuousBatcher(mllm, variables, sampling, num_slots=1,
                          prompt_len=PROMPT_LEN, max_new_tokens=8,
                          eos_id=EOS, chunk=8).run(reqs)
    b = ContinuousBatcher(mllm, variables, sampling, num_slots=4,
                          prompt_len=PROMPT_LEN, max_new_tokens=8,
                          eos_id=EOS, chunk=2).run(list(reversed(reqs)))
    for i in range(len(reqs)):
        np.testing.assert_array_equal(a[i], b[len(reqs) - 1 - i])


def test_vector_decode_step_matches_scalar(mllm_and_vars):
    """decode_step with (B,) step_index == scalar step_index when all
    rows share the step (the scatter and DUS cache writes must agree)."""
    mllm, variables = mllm_and_vars
    rng = np.random.default_rng(3)
    B = 3
    vision = jnp.asarray(rng.standard_normal((B, T_VIS, 512)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, VOCAB - 1, (B, PROMPT_LEN)), jnp.int32)
    mask = jnp.ones((B, PROMPT_LEN), jnp.int32)
    n_img = mllm.qformer.num_query_tokens
    cache_len = n_img + PROMPT_LEN + 4
    caches, _, plen, fmask = mllm.apply(
        variables, vision, ids, mask, cache_len, method=mllm.prefill)
    tok = jnp.asarray(rng.integers(3, VOCAB - 1, (B,)), jnp.int32)
    for step in range(3):
        lo_s, c_s = mllm.apply(variables, tok, jnp.int32(step), plen,
                               caches, fmask, cache_len,
                               method=mllm.decode_step)
        lo_v, c_v = mllm.apply(variables, tok,
                               jnp.full((B,), step, jnp.int32), plen,
                               caches, fmask, cache_len,
                               method=mllm.decode_step)
        np.testing.assert_array_equal(np.asarray(lo_s), np.asarray(lo_v))
        for (ks, vs), (kv, vv) in zip(c_s, c_v):
            np.testing.assert_array_equal(np.asarray(ks), np.asarray(kv))
            np.testing.assert_array_equal(np.asarray(vs), np.asarray(vv))
        caches = c_s


def test_max_new_contract(mllm_and_vars):
    """Out-of-contract caps fail loudly (a silent overflow would scatter
    KV past the pool buffers); max_new=0 yields an empty, order-aligned
    result without occupying a slot."""
    mllm, variables = mllm_and_vars
    batcher = ContinuousBatcher(mllm, variables, SamplingConfig(),
                                num_slots=2, prompt_len=PROMPT_LEN,
                                max_new_tokens=8, eos_id=EOS)
    reqs = _requests(3, seed=21)
    reqs[1] = dict(reqs[1], max_new=9)  # > pool buffer
    with pytest.raises(ValueError, match="max_new=9"):
        batcher.run(reqs)
    with pytest.raises(ValueError, match="max_new=-1"):
        batcher.run([dict(reqs[0], max_new=-1)])
    reqs[1] = dict(reqs[1], max_new=0)
    out = batcher.run(reqs)
    assert out[1].shape == (0,)
    solo = batcher.run([reqs[0], reqs[2]])
    np.testing.assert_array_equal(out[0], solo[0])
    np.testing.assert_array_equal(out[2], solo[1])


def test_text_only_batcher_needs_no_vision(mllm_and_vars):
    """A use_vision=False batcher must accept requests without a "vision"
    key and still match its single-request reference decode."""
    mllm, _ = mllm_and_vars
    text_mllm = MultiModalLLM(mllm.llama, mllm.qformer, use_vision=False)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(3, VOCAB - 1, (1, PROMPT_LEN)), jnp.int32)
    mask = jnp.ones((1, PROMPT_LEN), jnp.int32)
    variables = text_mllm.init({"params": jax.random.key(0)}, None, ids,
                               mask, True)
    sampling = SamplingConfig(temperature=1.0, top_k=8, top_p=0.9)
    reqs = [{k: v for k, v in r.items() if k != "vision"}
            for r in _requests(3, seed=13)]
    batcher = ContinuousBatcher(text_mllm, variables, sampling,
                                num_slots=2, prompt_len=PROMPT_LEN,
                                max_new_tokens=8, eos_id=EOS, chunk=3)
    got = batcher.run(reqs)
    for i, req in enumerate(reqs):
        ref = _reference_decode(text_mllm, variables, req, sampling, 8)
        np.testing.assert_array_equal(got[i], ref)


def test_per_row_sampler_matches_batched_on_single_rows(mllm_and_vars):
    """process_and_sample_per_row row i == process_and_sample on the
    1-row slice with the same key (it IS the vmapped chain)."""
    from tsue_tpu.ops.sampling import process_and_sample
    rng = np.random.default_rng(5)
    B, L = 4, 10
    logits = jnp.asarray(rng.standard_normal((B, VOCAB)), jnp.float32)
    hist = jnp.asarray(rng.integers(3, VOCAB - 1, (B, L)), jnp.int32)
    hlen = jnp.asarray(rng.integers(1, L, (B,)), jnp.int32)
    keys = jax.random.split(jax.random.key(9), B)
    cfg = SamplingConfig(temperature=0.9, top_k=8, top_p=0.9,
                         repetition_penalty=1.2, no_repeat_ngram_size=3)
    batched = process_and_sample_per_row(logits, keys, hist, hlen, cfg)
    for i in range(B):
        solo = process_and_sample(logits[i][None], keys[i],
                                  hist[i][None], hlen[i][None], cfg)
        assert int(batched[i]) == int(solo[0])


@pytest.mark.parametrize("sampling", [
    SamplingConfig(do_sample=False),
    SamplingConfig(temperature=1.0, top_k=8, top_p=0.9,
                   repetition_penalty=1.2, no_repeat_ngram_size=3),
], ids=["greedy", "sampled"])
def test_window_mode_bitwise_matches_plain_pool(mllm_and_vars, sampling):
    """Speculative window mode (window>=2) composes with continuous
    batching: per-request output is BITWISE the plain (window=1) pool's
    — which the tests above pin to the chain-keyed single-request
    decode — across mixed max_new, refill traffic, and chunking."""
    mllm, variables = mllm_and_vars
    reqs = _requests(6, seed=17)
    plain = ContinuousBatcher(mllm, variables, sampling, num_slots=2,
                              prompt_len=PROMPT_LEN, max_new_tokens=8,
                              eos_id=EOS, chunk=3).run(reqs)
    for W in (2, 4):
        spec = ContinuousBatcher(mllm, variables, sampling, num_slots=2,
                                 prompt_len=PROMPT_LEN, max_new_tokens=8,
                                 eos_id=EOS, chunk=2, window=W).run(reqs)
        for i in range(len(reqs)):
            np.testing.assert_array_equal(
                spec[i], plain[i],
                err_msg=f"window={W} request {i} diverged from the "
                        "plain pool")


def test_window_mode_geometry_insensitive(mllm_and_vars):
    """Window-mode requests are slot-isolated exactly like plain ones:
    different pool sizes/windows/order yield identical tokens."""
    mllm, variables = mllm_and_vars
    sampling = SamplingConfig(temperature=1.0, top_k=8, top_p=0.9)
    reqs = _requests(4, seed=23)
    a = ContinuousBatcher(mllm, variables, sampling, num_slots=1,
                          prompt_len=PROMPT_LEN, max_new_tokens=8,
                          eos_id=EOS, chunk=8, window=3).run(reqs)
    b = ContinuousBatcher(mllm, variables, sampling, num_slots=4,
                          prompt_len=PROMPT_LEN, max_new_tokens=8,
                          eos_id=EOS, chunk=1, window=4).run(
                              list(reversed(reqs)))
    for i in range(len(reqs)):
        np.testing.assert_array_equal(a[i], b[len(reqs) - 1 - i])


def test_quantized_kv_pool_isolated_and_window_bitwise(mllm_and_vars):
    """int8 KV pool (quantize_kv=True): a request's tokens are still
    independent of pool geometry/scheduling, and the speculative window
    mode is bitwise the plain quantized pool — the invariants survive
    quantized cache writes because window and step writes quantize the
    same values identically (ops/kv_quant.py)."""
    mllm, variables = mllm_and_vars
    sampling = SamplingConfig(temperature=1.0, top_k=8, top_p=0.9,
                              repetition_penalty=1.2,
                              no_repeat_ngram_size=3)
    reqs = _requests(4, seed=13)
    kw = dict(prompt_len=PROMPT_LEN, max_new_tokens=8, eos_id=EOS,
              quantize_kv=True)
    a = ContinuousBatcher(mllm, variables, sampling, num_slots=1,
                          chunk=8, **kw).run(reqs)
    b = ContinuousBatcher(mllm, variables, sampling, num_slots=4,
                          chunk=2, **kw).run(list(reversed(reqs)))
    w = ContinuousBatcher(mllm, variables, sampling, num_slots=2,
                          chunk=3, window=4, **kw).run(reqs)
    for i in range(len(reqs)):
        np.testing.assert_array_equal(a[i], b[len(reqs) - 1 - i])
        np.testing.assert_array_equal(a[i], w[i])
    # the pool's caches really are int8 (engagement, not a silent bf16
    # fallback)
    state = ContinuousBatcher(mllm, variables, sampling, num_slots=2,
                              chunk=1, **kw)._init_state()
    assert state.caches[0][0].dtype == jnp.int8
    assert len(state.caches[0]) == 4


def test_mesh_pool_bitwise_matches_single_chip(mllm_and_vars):
    """A pool over the 8-device mesh (serve_batching.py mesh notes):
    pure-DP (slots sharded over data, weights replicated) is BITWISE the
    single-chip pool — plain and speculative-window modes — and TP=2
    engages sharded weights while keeping the per-request isolation
    contract shape-intact."""
    from tsue_tpu.parallel.mesh import make_mesh
    from tsue_tpu.parallel.sharding import shard_params
    mllm, variables = mllm_and_vars
    sampling = SamplingConfig(temperature=1.0, top_k=8, top_p=0.9,
                              repetition_penalty=1.2,
                              no_repeat_ngram_size=3)
    reqs = _requests(5, seed=17)
    kw = dict(prompt_len=PROMPT_LEN, max_new_tokens=8, eos_id=EOS)
    ref = ContinuousBatcher(mllm, variables, sampling, num_slots=8,
                            chunk=3, **kw).run(reqs)
    refw = ContinuousBatcher(mllm, variables, sampling, num_slots=8,
                             chunk=3, window=4, **kw).run(reqs)
    mesh = make_mesh(model_parallel=1)
    svars = shard_params(variables, mesh)
    got = ContinuousBatcher(mllm, svars, sampling, num_slots=8,
                            chunk=3, mesh=mesh, **kw).run(reqs)
    gotw = ContinuousBatcher(mllm, svars, sampling, num_slots=8,
                             chunk=3, window=4, mesh=mesh, **kw).run(reqs)
    for i in range(len(reqs)):
        np.testing.assert_array_equal(got[i], ref[i])
        np.testing.assert_array_equal(gotw[i], refw[i])
    # TP=2: weights actually split; same request set completes with
    # the right shapes (psum ties may flip tokens — no bitwise claim)
    mesh2 = make_mesh(model_parallel=2)
    svars2 = shard_params(variables, mesh2)
    tp = ContinuousBatcher(mllm, svars2, sampling, num_slots=4,
                           chunk=3, mesh=mesh2, **kw).run(reqs)
    assert len(tp) == len(reqs)
    for i, req in enumerate(reqs):
        assert tp[i].shape[0] <= req["max_new"]
    # slot divisibility contract
    with pytest.raises(ValueError, match="divide"):
        ContinuousBatcher(mllm, svars, sampling, num_slots=3,
                          chunk=3, mesh=mesh, **kw)
