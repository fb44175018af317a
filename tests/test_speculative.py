"""Speculative decoding (eval/speculative.py) exactness.

The load-bearing contracts: GREEDY speculative decode emits EXACTLY the
tokens of the token-at-a-time greedy scan (eval/generation.py with
do_sample=False); SAMPLED speculative decode (sample-and-match) emits
EXACTLY the tokens of a token-at-a-time decode keyed by the same
per-row split chains (`_chain_keys`, the serve_batching discipline) —
drafts and window scoring change only how many forwards run, never the
output.  Plus decode_window (models/fusion.py) must agree with
sequential decode_step calls position by position.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import LlamaConfig, QFormerConfig
from tsue_tpu.eval.generation import make_generate_fn
from tsue_tpu.eval.speculative import (make_speculative_generate_fn,
                                       ngram_draft)
from tsue_tpu.models.fusion import MultiModalLLM
from tsue_tpu.ops.sampling import SamplingConfig

VOCAB = 64
EOS = VOCAB - 1
PROMPT_LEN = 8
T_VIS = 4

GREEDY = SamplingConfig(do_sample=False, repetition_penalty=1.2,
                        no_repeat_ngram_size=3)


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


def _batch(n, seed=5):
    rng = np.random.default_rng(seed)
    vision = jnp.asarray(rng.standard_normal((n, T_VIS, 512)), jnp.float32)
    ids = np.zeros((n, PROMPT_LEN), np.int32)
    mask = np.zeros((n, PROMPT_LEN), np.int32)
    for i in range(n):
        plen = int(rng.integers(3, PROMPT_LEN + 1))
        ids[i, :plen] = rng.integers(3, VOCAB - 1, plen)
        mask[i, :plen] = 1
    return vision, jnp.asarray(ids), jnp.asarray(mask)


def test_decode_window_matches_sequential_steps(mllm_and_vars):
    """decode_window logits[:, j] == the j-th decode_step's logits, and
    the caches agree afterwards (in-window causality + per-row offsets)."""
    mllm, variables = mllm_and_vars
    rng = np.random.default_rng(3)
    B, W = 3, 4
    vision = jnp.asarray(rng.standard_normal((B, T_VIS, 512)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, VOCAB - 1, (B, PROMPT_LEN)), jnp.int32)
    mask = jnp.ones((B, PROMPT_LEN), jnp.int32)
    n_img = mllm.qformer.num_query_tokens
    cache_len = n_img + PROMPT_LEN + 2 * W
    caches0, _, plen, fmask = mllm.apply(
        variables, vision, ids, mask, cache_len, method=mllm.prefill)
    toks = jnp.asarray(rng.integers(3, VOCAB - 1, (B, W)), jnp.int32)
    # rows at different decode clocks (per-row step vector)
    step = jnp.asarray([0, 1, 2], jnp.int32)
    # seed the earlier slots of rows 1/2 so their caches are valid there
    pre = jnp.asarray(rng.integers(3, VOCAB - 1, (B, 2)), jnp.int32)
    caches = caches0
    for j in range(2):
        _, caches = mllm.apply(variables, pre[:, j],
                               jnp.full((B,), j, jnp.int32), plen, caches,
                               fmask, cache_len, method=mllm.decode_step)
    # sequential reference: mask rows not yet at clock j by replaying the
    # same per-row steps the window uses
    seq_caches = caches
    seq_logits = []
    for j in range(W):
        lo, seq_caches = mllm.apply(variables, toks[:, j], step + j, plen,
                                    seq_caches, fmask, cache_len,
                                    method=mllm.decode_step)
        seq_logits.append(lo)
    win_logits, win_caches = mllm.apply(variables, toks, step, plen,
                                        caches, fmask, cache_len,
                                        method=mllm.decode_window)
    for j in range(W):
        np.testing.assert_allclose(np.asarray(win_logits[:, j]),
                                   np.asarray(seq_logits[j]),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"window position {j}")
    for (kw, vw), (ks, vs) in zip(win_caches, seq_caches):
        np.testing.assert_allclose(np.asarray(kw), np.asarray(ks),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(vw), np.asarray(vs),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("window,draft_ngram", [(2, 2), (5, 3)])
def test_speculative_matches_token_at_a_time_greedy(mllm_and_vars, window,
                                                    draft_ngram):
    mllm, variables = mllm_and_vars
    max_new = 12
    vision, ids, mask = _batch(4)
    ref_gen = make_generate_fn(mllm, GREEDY, max_new, PROMPT_LEN, eos_id=EOS)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(0)))
    spec_gen = make_speculative_generate_fn(
        mllm, GREEDY, max_new, PROMPT_LEN, eos_id=EOS, window=window,
        draft_ngram=draft_ngram, with_stats=True)
    toks, n_fwd = spec_gen(variables, vision, ids, mask)
    np.testing.assert_array_equal(
        np.asarray(toks), ref,
        err_msg=f"speculative (W={window}) diverged from greedy scan")
    n_fwd = np.asarray(n_fwd)
    assert (n_fwd >= 1).all() and (n_fwd <= max_new).all()


def _plain_chain_decode(mllm, variables, cfg, vision, ids, mask, max_new,
                        rng, pad_id=0):
    """Token-at-a-time sampled decode with per-row split-chain keys —
    make_generate_fn's scan body with ``process_and_sample_per_row``
    drawing position j from chain key j (the serve_batching discipline
    and the distribution sampled speculation must reproduce bitwise)."""
    from tsue_tpu.eval.speculative import _chain_keys
    from tsue_tpu.ops.sampling import process_and_sample_per_row
    B = ids.shape[0]
    P = mllm.qformer.num_query_tokens + PROMPT_LEN
    cache_len = P + max_new
    caches, last_hidden, plen, fmask = mllm.apply(
        variables, vision, ids, mask, cache_len, method=mllm.prefill)
    logits = mllm.apply(
        variables, last_hidden,
        method=lambda m, h: m.llama_mod.logits_from_hidden(h, quant_ok=True))
    history = jnp.concatenate(
        [ids, jnp.full((B, max_new), pad_id, jnp.int32)], axis=1)
    hlen = mask.sum(axis=1).astype(jnp.int32)
    keys = _chain_keys(
        jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(B)),
        max_new)
    finished = jnp.zeros((B,), bool)
    out = []
    for j in range(max_new):
        tok = process_and_sample_per_row(
            logits, keys[:, j], history, hlen, cfg).astype(jnp.int32)
        tok = jnp.where(finished, pad_id, tok)
        finished = finished | (tok == EOS)
        history = history.at[jnp.arange(B), hlen].set(tok)
        hlen = hlen + jnp.where(finished & (tok == pad_id), 0, 1)
        out.append(tok)
        logits, caches = mllm.apply(
            variables, tok, jnp.full((B,), j, jnp.int32), plen, caches,
            fmask, cache_len, method=mllm.decode_step)
    return np.stack([np.asarray(t) for t in out], axis=1)


SAMPLED = SamplingConfig(do_sample=True, temperature=0.9, top_k=40,
                         top_p=0.9, repetition_penalty=1.2,
                         no_repeat_ngram_size=3)


@pytest.mark.parametrize("window,draft_ngram", [(2, 2), (5, 3)])
def test_speculative_sampled_matches_chain_keyed_decode(mllm_and_vars,
                                                        window, draft_ngram):
    """Sample-and-match exactness: the sampled speculative output is
    BITWISE the chain-keyed token-at-a-time decode (CPU f32) — rejected
    window draws re-draw their position with the same key, accepted
    drafts equal the draw by construction."""
    mllm, variables = mllm_and_vars
    max_new = 12
    vision, ids, mask = _batch(4, seed=9)
    rng = jax.random.key(21)
    ref = _plain_chain_decode(mllm, variables, SAMPLED, vision, ids, mask,
                              max_new, rng)
    toks, n_fwd = make_speculative_generate_fn(
        mllm, SAMPLED, max_new, PROMPT_LEN, eos_id=EOS, window=window,
        draft_ngram=draft_ngram, with_stats=True)(
            variables, vision, ids, mask, rng)
    np.testing.assert_array_equal(
        np.asarray(toks), ref,
        err_msg=f"sampled speculative (W={window}) diverged from the "
                "chain-keyed decode")
    n_fwd = np.asarray(n_fwd)
    assert (n_fwd >= 1).all() and (n_fwd <= max_new).all()


def test_speculative_sampled_requires_rng(mllm_and_vars):
    mllm, variables = mllm_and_vars
    vision, ids, mask = _batch(2)
    gen = make_speculative_generate_fn(mllm, SAMPLED, 8, PROMPT_LEN,
                                       eos_id=EOS)
    with pytest.raises(ValueError, match="rng"):
        gen(variables, vision, ids, mask)


def test_speculative_accepts_oracle_drafts(mllm_and_vars):
    """With a window large enough and drafts that happen to match (the
    templated-history case prompt lookup exploits), n_forwards must drop
    below max_new — i.e. speculation actually accepts.  Built by making
    history repeat: feed a prompt that is one token repeated, so the
    greedy continuation is drafted from its own earlier occurrences."""
    mllm, variables = mllm_and_vars
    max_new = 12
    vision = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, T_VIS, 512)), jnp.float32)
    ids = jnp.full((2, PROMPT_LEN), 7, jnp.int32)
    mask = jnp.ones((2, PROMPT_LEN), jnp.int32)
    # no-repeat-ngram off so a periodic continuation is reachable
    cfg = SamplingConfig(do_sample=False, repetition_penalty=1.0,
                         no_repeat_ngram_size=0)
    ref = np.asarray(make_generate_fn(mllm, cfg, max_new, PROMPT_LEN,
                                      eos_id=EOS)(
        variables, vision, ids, mask, jax.random.key(0)))
    toks, n_fwd = make_speculative_generate_fn(
        mllm, cfg, max_new, PROMPT_LEN, eos_id=EOS, window=4,
        draft_ngram=2, with_stats=True)(variables, vision, ids, mask)
    np.testing.assert_array_equal(np.asarray(toks), ref)
    # acceptance is model-dependent; the hard guarantee is ">= 1 token
    # per forward", the point of this test is the bookkeeping under
    # multi-token accepts, exercised whenever any draft hits
    assert (np.asarray(n_fwd) <= max_new).all()


def test_ngram_draft_continues_latest_occurrence():
    #            0  1  2  3  4  5  6  7  8
    hist = jnp.asarray([[5, 6, 9, 9, 5, 6, 7, 5, 6]], jnp.int32)
    hlen = jnp.asarray([9], jnp.int32)
    # suffix (5, 6): latest earlier occurrence ends at index 5 -> 7, 5
    d = ngram_draft(hist, hlen, n=3, width=2)
    np.testing.assert_array_equal(np.asarray(d), [[7, 5]])
    # suffix (6,) with n=2: latest earlier occurrence at index 5 -> 7, 5
    d = ngram_draft(hist, hlen, n=2, width=2)
    np.testing.assert_array_equal(np.asarray(d), [[7, 5]])
    # no occurrence: repeat last token
    hist2 = jnp.asarray([[1, 2, 3, 4, 0, 0, 0, 0, 0]], jnp.int32)
    d = ngram_draft(hist2, jnp.asarray([4], jnp.int32), n=3, width=3)
    np.testing.assert_array_equal(np.asarray(d), [[4, 4, 4]])


def test_ngram_draft_prefers_full_continuation():
    """A period-1 loop must draft real tokens, not the pad tail after the
    latest (too-recent) occurrence."""
    hist = jnp.asarray([[3, 3, 3, 3, 3, 0, 0, 0, 0]], jnp.int32)
    d = ngram_draft(hist, jnp.asarray([5], jnp.int32), n=3, width=3)
    np.testing.assert_array_equal(np.asarray(d), [[3, 3, 3]])


def test_speculative_matches_greedy_under_int8_decode(mllm_and_vars):
    """quantize_decode composes with speculation: with the "quant"
    collection attached, the window forward (decode_window) uses the SAME
    int8 weights as the plain decode step, so speculative output still
    equals the token-at-a-time greedy decode bitwise (CPU f32) — and the
    int8 path is genuinely engaged (tokens differ from the bf16 run)."""
    from tsue_tpu.ops.quant import with_quantized_decode
    mllm, variables = mllm_and_vars
    qvars = with_quantized_decode(variables)
    max_new = 12
    vision, ids, mask = _batch(4, seed=11)
    ref_gen = make_generate_fn(mllm, GREEDY, max_new, PROMPT_LEN,
                               eos_id=EOS)
    spec_gen = make_speculative_generate_fn(
        mllm, GREEDY, max_new, PROMPT_LEN, eos_id=EOS, window=4,
        draft_ngram=2)
    ref_q = np.asarray(ref_gen(qvars, vision, ids, mask, jax.random.key(0)))
    got_q = np.asarray(spec_gen(qvars, vision, ids, mask))
    np.testing.assert_array_equal(
        got_q, ref_q,
        err_msg="speculative+int8 diverged from plain greedy+int8")
    # engagement: the window forward's logits must actually move under
    # int8 (a dead quant path in decode_window would give exactly 0)
    cache_len = PROMPT_LEN + 8
    W = 4

    def window_logits(v):
        caches, last_hidden, plen, fmask = mllm.apply(
            v, vision, ids, mask, cache_len, method=mllm.prefill)
        toks = jnp.asarray(np.full((vision.shape[0], W), 3), jnp.int32)
        step0 = jnp.zeros((vision.shape[0],), jnp.int32)
        lg, _ = mllm.apply(v, toks, step0, plen, caches, fmask, cache_len,
                           method=mllm.decode_window)
        return np.asarray(lg)

    diff = np.abs(window_logits(qvars) - window_logits(variables)).max()
    assert diff > 0, "int8 path never engaged in decode_window"
