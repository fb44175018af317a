"""Sampled-decoding logit processors as pure jittable functions.

HF-`generate`-compatible semantics (the reference decodes with do_sample,
temperature=0.9, top_k=40, top_p=0.9, no_repeat_ngram_size=3,
repetition_penalty=1.2 — ref scripts/train.py:630-642):

- repetition penalty (CTRL): logits of already-seen tokens are divided by
  the penalty when positive, multiplied when negative;
- no-repeat-ngram: tokens completing an already-seen n-gram are banned;
- top-k then top-p filtering, then temperature sampling.

Everything is fixed-shape: token histories are (B, L_max) with a length
scalar; banned-token discovery is a vectorized window match, not the
reference's (HF's) Python dict of n-grams.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


class SamplingConfig(NamedTuple):
    temperature: float = 0.9
    top_k: int = 40
    top_p: float = 0.9
    repetition_penalty: float = 1.2
    no_repeat_ngram_size: int = 3
    do_sample: bool = True


def apply_repetition_penalty(logits: jnp.ndarray, token_history: jnp.ndarray,
                             history_len: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """logits (B, V); token_history (B, L) padded ids; history_len (B,)."""
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    L = token_history.shape[1]
    valid = jnp.arange(L)[None, :] < history_len[:, None]      # (B, L)
    seen = jnp.zeros((B, V), bool)
    seen = seen.at[jnp.arange(B)[:, None], token_history].max(valid)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_no_repeat_ngram(logits: jnp.ndarray, token_history: jnp.ndarray,
                          history_len: jnp.ndarray, n: int) -> jnp.ndarray:
    """Ban tokens that would complete any already-seen n-gram.

    A token v is banned iff the (n-1)-token suffix of the history appeared
    at some earlier position followed by v.
    """
    if n <= 0:
        return logits
    B, V = logits.shape
    L = token_history.shape[1]
    idx = jnp.arange(L)
    # suffix: last n-1 generated tokens, gathered at history_len-1-k
    def suffix_tok(k):  # k = 0..n-2, distance from the end (k=0 is last)
        pos = jnp.clip(history_len - 1 - k, 0, L - 1)
        return token_history[jnp.arange(B), pos]              # (B,)
    # window match at position i: history[i..i+n-2] == suffix
    match = jnp.ones((B, L), bool)
    for k in range(n - 1):
        # token at window offset k must equal suffix token (n-2-k from end)
        shifted = jnp.roll(token_history, -k, axis=1)
        match = match & (shifted == suffix_tok(n - 2 - k)[:, None])
    # window must fit entirely before the current end: i + n - 1 < len
    fits = idx[None, :] + n - 1 < history_len[:, None]
    # need at least n-1 tokens of history to define the suffix
    enough = (history_len >= n - 1)[:, None]
    match = match & fits & enough
    # banned token = token at window position i + n - 1
    next_pos = jnp.clip(idx + n - 1, 0, L - 1)
    next_tok = token_history[:, next_pos]                     # (B, L)
    banned = jnp.zeros((B, V), bool)
    banned = banned.at[jnp.arange(B)[:, None], next_tok].max(match)
    return jnp.where(banned, NEG_INF, logits)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    vals, _ = jax.lax.top_k(logits, k)
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest prefix of the sorted
    distribution with cumulative prob >= p (HF semantics: the first token
    crossing p is kept)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # mask tokens whose *preceding* cumulative mass already reached p
    keep = (cum - probs) < p                  # first token is always kept
    thresh = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                     keepdims=True)           # smallest kept logit
    return jnp.where(logits >= thresh, logits, NEG_INF)


def _top_p_mask_sorted(sorted_logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """apply_top_p on logits already sorted descending along -1."""
    if p >= 1.0:
        return sorted_logits
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < p                  # first token is always kept
    return jnp.where(keep, sorted_logits, NEG_INF)


def process_and_sample(logits: jnp.ndarray, rng: jax.Array,
                       token_history: jnp.ndarray, history_len: jnp.ndarray,
                       cfg: SamplingConfig) -> jnp.ndarray:
    """Full processor chain -> next token ids (B,).

    When top-k is active the top-p filter and the categorical draw run on
    the (B, k) top slice instead of the full (B, V) row — identical
    distribution (everything below the k-th logit is already NEG_INF-masked
    and exp(NEG_INF - max) underflows to exactly 0 in f32), but it removes
    a V-wide sort + softmax + draw from the decode hot loop (V = 128256
    for real Llama; measured part of the per-step critical path).

    HF's TopKLogitsWarper keeps ALL tokens tied with the k-th logit, while
    the (B, k) slice holds exactly k of them — so when extra ties exist
    beyond the slice (realistic with bf16-matmul logits over V=128k) the
    fast slice would change the distribution.  Ties are detected with one
    V-wide compare (no sort) and such steps fall back via ``lax.cond`` to
    the tie-keeping full-row chain, keeping exact HF semantics always.
    """
    logits = logits.astype(jnp.float32)
    logits = apply_repetition_penalty(logits, token_history, history_len,
                                      cfg.repetition_penalty)
    logits = apply_no_repeat_ngram(logits, token_history, history_len,
                                   cfg.no_repeat_ngram_size)
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1)
    if cfg.temperature != 1.0:
        logits = logits / cfg.temperature
    if 0 < cfg.top_k < logits.shape[-1]:
        vals, idx = jax.lax.top_k(logits, cfg.top_k)      # desc-sorted
        thresh = vals[..., -1:]                           # k-th logit
        extra_ties = (jnp.sum(logits == thresh, axis=-1)
                      > jnp.sum(vals == thresh, axis=-1))

        def fast(r):
            masked = _top_p_mask_sorted(vals, cfg.top_p)
            choice = jax.random.categorical(r, masked, axis=-1)
            return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]

        def exact(r):
            full = jnp.where(logits < thresh, NEG_INF, logits)
            return jax.random.categorical(r, apply_top_p(full, cfg.top_p),
                                          axis=-1)

        return jax.lax.cond(jnp.any(extra_ties), exact, fast, rng)
    logits = apply_top_p(logits, cfg.top_p)
    return jax.random.categorical(rng, logits, axis=-1)
