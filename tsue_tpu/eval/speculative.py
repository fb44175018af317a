"""Speculative decoding (greedy AND sampled) with prompt-lookup drafts.

A bs-B decode step is HBM-bound: it streams the full weight set to emit
ONE token per row (PARITY.md decode roofline).  Speculative decoding
emits several: draft W-1 cheap guess tokens, score all W positions in a
single cached window forward (weights read ONCE for the whole window,
models/fusion.py decode_window), and keep the longest prefix the model
itself would have produced.

Greedy (``cfg.do_sample=False``): output is EXACTLY the greedy decode —
every emitted token is the processed-logits argmax given its prefix
(pinned bitwise against eval/generation.py's token-at-a-time scan in
tests/test_speculative.py); only the number of forwards changes, by the
per-iteration acceptance rate.

Sampled (``cfg.do_sample=True`` — the reference's actual generation
semantics, T=0.9/top-k 40/top-p 0.9, ref scripts/train.py:637-642):
because the prompt-lookup draft is DETERMINISTIC (a delta distribution),
exact speculative sampling reduces to **sample-and-match**: draw
``t_m ~ p_m`` at every window position with the production sampler
(ops/sampling.py, full processor chain), accept draft ``d_{m+1}`` iff it
equals ``t_m``, and on first mismatch emit ``t_m`` itself.  The standard
accept-with-prob ``min(1, p/q)``-else-residual scheme degenerates to
exactly this when q is a delta: acceptance happens with probability
``p(d)``, and conditioned on a mismatch, ``t_m`` IS the residual
distribution ``p(x)/(1-p(d))``.  No ratio test, no residual
renormalization — the emitted sequence is distributed identically to
token-at-a-time sampling.  Stronger still: draw keys are per-row
split-CHAINS indexed by absolute output position (``_chain_keys``, the
``serve_batching`` per-request discipline), so the output is BITWISE the
chain-keyed plain decode's (pinned on CPU f32 in tests/test_speculative.py)
— rejected window draws reuse their position's key on the retry, never
skipping or double-consuming randomness.

Caveat shared with every program-shape change (see the chunking note in
generation.py): in bf16 the Tq=W window forward can differ from the Tq=1
step at ulp level, flipping argmaxes among near-tied logits (greedy) or
draws where a threshold is crossed (sampled) — measured 0.2% of tokens
at the real 1B dims (scripts/ab_speculative.py reports the agreement);
both sequences are equally valid decodes of the model.

Drafts are prompt-lookup (n-gram continuation): the most recent earlier
occurrence of the current (n-1)-token suffix proposes the next tokens.
No draft model, no training, no extra weights — ideal for this
framework's templated traffic-context paragraphs ("There is a
left-leading vehicle..." repeats across the prompt's answer span and
the generation), where lookup hits are frequent.  The reference has no
serving/speculation story (its generation is a blocking HF ``generate``,
ref scripts/train.py:637-642); this is a deployment-side addition.

Composes with int8 weight-only decode (ops/quant.py): the window
forward passes ``quant_ok=True`` exactly like the plain decode step, so
``serve.Predictor(quantize_decode=True)`` + ``speculative=True`` both
halves the weight stream and amortizes it over the window — and the
"exact greedy" contract is against the int8 decode both arms use
(pinned in tests/test_quant.py).

TPU-first mechanics: ONE jitted ``lax.while_loop`` whose body is fixed
shape — a (B, W) window forward with per-row cache offsets, V-wide
processor scoring vmapped over the W positions, masked scatters for
outputs/history.  Rows advance on their own clocks (per-row step
vectors, the serve_batching machinery); rejected draft KV slots are
overwritten by the next window before they can ever be attended (the
next window's write range always covers them).  No host syncs, no
``lax.cond`` in the hot body (CLAUDE.md decode rules).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tsue_tpu.ops.sampling import (SamplingConfig,
                                   process_and_sample_per_row)


def _chain_keys(base_keys: jax.Array, n: int) -> jax.Array:
    """(B,) base keys -> (B, n) draw keys by per-row split chains.

    Draw key j of row r is ``split(carry_j)[0]`` with ``carry_{j+1} =
    split(carry_j)[1]`` starting from the row's base key — exactly the
    per-request chain ``serve_batching.py`` advances one tick at a time,
    precomputed so window draws can random-access position j's key.
    """
    def step(carry, _):
        s = jax.vmap(jax.random.split)(carry)          # (B, 2) keys
        return s[:, 1], s[:, 0]
    _, draws = jax.lax.scan(step, base_keys, None, length=n)
    return jnp.swapaxes(draws, 0, 1)                   # (B, n)


def greedy_token(logits: jnp.ndarray, history: jnp.ndarray,
                 history_len: jnp.ndarray, cfg: SamplingConfig
                 ) -> jnp.ndarray:
    """Processed-logits argmax, delegated to the production per-row chain
    (ops/sampling.py process_and_sample_per_row, do_sample=False arm —
    temperature/top-k/top-p do not move an argmax, HF semantics).  One
    implementation, so the speculative verifier can never drift from the
    plain decode's greedy processing order; the keys argument is unused
    on the greedy arm."""
    dummy_keys = jnp.zeros((logits.shape[0],), jnp.uint32)
    return process_and_sample_per_row(logits, dummy_keys, history,
                                      history_len,
                                      cfg._replace(do_sample=False))


def ngram_draft(history: jnp.ndarray, history_len: jnp.ndarray,
                n: int, width: int) -> jnp.ndarray:
    """Prompt-lookup proposal: continue the latest earlier occurrence of
    the current (n-1)-token suffix.

    history (B, L) padded ids, history_len (B,) valid counts (the suffix
    is the last n-1 valid tokens).  Returns (B, width) draft ids; when no
    earlier occurrence exists the last token is repeated — any draft is
    safe (verification rejects), a miss only costs unused window slots.
    """
    B, L = history.shape
    rows = jnp.arange(B)
    idx = jnp.arange(L)[None, :]
    match = jnp.ones((B, L), bool)
    for k in range(n - 1):
        suf = history[rows, jnp.clip(history_len - 1 - k, 0, L - 1)]
        # occurrence ending at j needs history[j-k] == suffix token k
        # from the end; roll puts history[j-k] at column j
        match = match & (jnp.roll(history, k, axis=1) == suf[:, None])
    match = match & (idx >= n - 2)                   # window fits
    match = match & (idx < history_len[:, None] - 1)  # strictly earlier
    match = match & (history_len >= n)[:, None]
    has = match.any(axis=1)
    # prefer the latest occurrence whose continuation is FULLY inside the
    # written history: the latest match overall often sits so close to
    # the end that its continuation is mostly unwritten padding (e.g. a
    # period-1 loop matches at hlen-2 and proposes pads), wasting the
    # window; fall back to any match when no full one exists
    full = match & (idx <= history_len[:, None] - 1 - width)
    match = jnp.where(full.any(axis=1)[:, None], full, match)
    j = (L - 1) - jnp.argmax(match[:, ::-1], axis=1)  # latest occurrence
    cols = jnp.clip(j[:, None] + 1 + jnp.arange(width)[None, :], 0, L - 1)
    draft = history[rows[:, None], cols]
    last = history[rows, jnp.clip(history_len - 1, 0, L - 1)]
    return jnp.where(has[:, None], draft, last[:, None])


def make_speculative_generate_fn(mllm, cfg: SamplingConfig,
                                 max_new_tokens: int, prompt_len: int,
                                 eos_id: int, pad_id: int = 0,
                                 window: int = 8, draft_ngram: int = 3,
                                 with_stats: bool = False,
                                 quantize_kv: bool = False):
    """Build a jitted (variables, vision, prompt_ids, prompt_mask[, rng])
    -> (B, max_new_tokens) int32 generator (same output contract as
    make_generate_fn).

    ``cfg.do_sample=False``: exact greedy (``rng`` accepted and ignored
    so call sites can swap generators freely).  ``cfg.do_sample=True``:
    exact speculative SAMPLING via sample-and-match (module docstring);
    ``rng`` is required and row r's draw for output position j uses the
    j-th key of the split chain seeded with ``fold_in(rng, r)`` — the
    output is bitwise the chain-keyed token-at-a-time decode's.

    ``window``: tokens scored per forward (1 draft fewer); ``draft_ngram``:
    the n of the suffix lookup.  ``with_stats=True`` returns
    (tokens, n_forwards (B,)) — n_forwards/tokens is the measured
    speculative win (see scripts/ab_speculative.py).
    ``quantize_kv=True``: int8 KV cache (ops/kv_quant.py; exact prefill,
    quantized once, half the cache bytes per window forward) — the
    speculative==plain invariant survives because window and step writes
    quantize identical values identically (tests/test_kv_quant.py).
    """
    if window < 2:
        raise ValueError("window must be >= 2 (1 target + >=1 draft)")
    n_img = mllm.qformer.num_query_tokens if mllm.use_vision else 0
    P = n_img + prompt_len
    W = window
    cache_len = P + max_new_tokens + W   # windows may overrun by W-1
    hist_len = prompt_len + max_new_tokens + W
    out_len = max_new_tokens + W

    n_keys = max_new_tokens + W      # window draws overrun by < W

    @jax.jit
    def generate(variables, vision, prompt_ids, prompt_mask, rng=None):
        if cfg.do_sample and rng is None:
            raise ValueError("sampled speculative decoding needs rng")
        B = prompt_ids.shape[0]
        rows = jnp.arange(B)
        offs = jnp.arange(W)[None, :]
        caches, last_hidden, prefix_len, fmask = mllm.apply(
            variables, vision, prompt_ids, prompt_mask, cache_len,
            method=mllm.prefill)
        if quantize_kv:
            # int8 KV cache (ops/kv_quant.py): exact prefill, quantized
            # once here; window forwards read/write int8 cache bytes
            from tsue_tpu.ops.kv_quant import quantize_cache
            caches = quantize_cache(caches)
        logits0 = mllm.apply(
            variables, last_hidden,
            method=lambda m, h: m.llama_mod.logits_from_hidden(
                h, quant_ok=True))

        history = jnp.concatenate(
            [prompt_ids,
             jnp.full((B, hist_len - prompt_len), pad_id, jnp.int32)],
            axis=1)
        hlen = prompt_mask.sum(axis=1).astype(jnp.int32)
        if cfg.do_sample:
            keys_all = _chain_keys(
                jax.vmap(lambda i: jax.random.fold_in(rng, i))(rows),
                n_keys)                                # (B, n_keys)
            next_tok = process_and_sample_per_row(
                logits0, keys_all[:, 0], history, hlen, cfg
            ).astype(jnp.int32)
        else:
            next_tok = greedy_token(logits0, history, hlen, cfg
                                    ).astype(jnp.int32)

        def cond(st):
            *_, finished, _ = st
            return ~jnp.all(finished)

        def body(st):
            (caches, history, hlen, next_tok, out, step, finished,
             n_fwd) = st
            live = ~finished
            # window = the committed next token + prompt-lookup drafts
            # proposed from the history as it will read after emitting it
            hist1 = history.at[rows, hlen].set(
                jnp.where(live, next_tok, history[rows, hlen]))
            draft = ngram_draft(hist1, hlen + 1, draft_ngram, W - 1)
            wtoks = jnp.concatenate([next_tok[:, None], draft], axis=1)
            logits_w, caches = mllm.apply(
                variables, wtoks, step, prefix_len, caches, fmask,
                cache_len, method=mllm.decode_window)
            # score every window position against the history it implies;
            # ONE scatter of all W tokens suffices — position m's
            # processors see only the first hlen+m+1 entries
            cols = hlen[:, None] + offs
            hist_all = history.at[rows[:, None], cols].set(wtoks)
            if cfg.do_sample:
                # sample-and-match: the draw at window offset m is the
                # token for output position step+m+1, so it uses that
                # position's chain key — a rejected draw's position is
                # re-drawn later with the SAME key and the fixed prefix,
                # which is exactly the plain chain-keyed decode's draw
                kw = keys_all[rows[:, None],
                              jnp.clip(step[:, None] + offs + 1, 0,
                                       n_keys - 1)]    # (B, W) keys
                g = process_and_sample_per_row(
                    logits_w.reshape(B * W, -1),
                    kw.reshape(-1),
                    jnp.repeat(hist_all, W, axis=0),
                    (hlen[:, None] + offs + 1).reshape(-1),
                    cfg).reshape(B, W).astype(jnp.int32)
            else:
                g = jax.vmap(
                    lambda lg, hl: greedy_token(lg, hist_all, hl, cfg),
                    in_axes=(1, 0), out_axes=1)(
                        logits_w,
                        hlen[None, :] + jnp.arange(W)[:, None] + 1
                ).astype(jnp.int32)                    # (B, W)
            # accept drafts while they equal the model's own choice and
            # no EOS has been emitted (EOS can only be the final token)
            acc = (wtoks[:, 1:] == g[:, :-1]) & (wtoks[:, :-1] != eos_id)
            n_emit = 1 + jnp.cumprod(acc.astype(jnp.int32), axis=1
                                     ).sum(axis=1)     # (B,) in [1, W]
            n_emit = jnp.where(live,
                               jnp.minimum(n_emit, max_new_tokens - step),
                               0)
            emit = offs < n_emit[:, None]              # (B, W)
            ocols = step[:, None] + offs
            out = out.at[rows[:, None], ocols].set(
                jnp.where(emit, wtoks, out[rows[:, None], ocols]))
            history = history.at[rows[:, None], cols].set(
                jnp.where(emit, wtoks, history[rows[:, None], cols]))
            hlen = hlen + n_emit
            step = step + n_emit
            # the token after the last emitted one is already scored
            sel = jnp.clip(n_emit - 1, 0, W - 1)
            next_tok = jnp.where(live, g[rows, sel], next_tok)
            finished = finished | ((wtoks == eos_id) & emit).any(axis=1) \
                | (step >= max_new_tokens)
            return (caches, history, hlen, next_tok, out, step, finished,
                    n_fwd + live)

        init = (caches, history, hlen, next_tok,
                jnp.full((B, out_len), pad_id, jnp.int32),
                jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), bool) | (max_new_tokens <= 0),
                jnp.zeros((B,), jnp.int32))
        st = jax.lax.while_loop(cond, body, init)
        toks = st[4][:, :max_new_tokens]
        return (toks, st[7]) if with_stats else toks

    return generate
