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


def process_and_sample(logits: jnp.ndarray, rng: jax.Array,
                       token_history: jnp.ndarray, history_len: jnp.ndarray,
                       cfg: SamplingConfig) -> jnp.ndarray:
    """Full processor chain -> next token ids (B,).

    When top-k is active the top-p filter and the categorical draw run on
    the (B, k) top slice instead of the full (B, V) row, removing a V-wide
    sort + softmax + draw from the decode hot loop (V = 128256 for real
    Llama; measured part of the per-step critical path).

    Boundary ties: HF's TopKLogitsWarper keeps ALL tokens tied with the
    k-th logit, while the (B, k) slice holds exactly k of them — realistic
    with bf16-matmul logits over V=128k, guaranteed at init.  The kept
    set's descending order is just the slice with the tie class expanded
    to ``n_tie`` identical entries, so the top-p cutoff inside the tie
    class has the closed form ceil((p·Z − cum_above)/exp(thresh)) and no
    V-wide sort is needed.  The draw is a (k+1)-slot categorical — the
    strictly-above-threshold slots plus one slot carrying the whole kept
    tie mass — followed by a uniform pick among the kept tied tokens (tie
    order is arbitrary, matching HF up to its own unstable sort order).
    With no ties this reduces exactly to the plain sliced chain: n_tie ==
    #slice entries equal to the k-th logit, and the tie-class keep rule
    equals the per-slot rule.

    Performance (v5e, V=128256, B=16, the 1B decode hot loop): branch-free
    on purpose — a ``lax.cond``-fallback variant serializes the scan body
    — and the tie bookkeeping is ONE extra V-wide elementwise+reduce pass
    (the blockwise tie count in ``_tie_blocks``); the tied-token pick
    works on 128-lane block sums, never a V-wide cumsum/argmax, and an
    ``optimization_barrier`` keeps the V-wide compare out of the
    ``top_k`` fusion so the sort cannot be recomputed per consumer.
    Interleaved same-process A/B against the tie-unaware sliced sampler
    shows equal end-to-end decode throughput (~2000 tok/s under the
    measurement conditions), i.e. exact HF semantics come for free.
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
        k = cfg.top_k
        slot_logits, idx, t_keep, tie_blocks = _topk_topp_slots(
            logits, k, cfg.top_p)
        return _draw_sliced(slot_logits, idx, t_keep, tie_blocks, k, rng)
    logits = apply_top_p(logits, cfg.top_p)
    return jax.random.categorical(rng, logits, axis=-1)


def _draw_sliced(slot_logits, idx, t_keep, tie_blocks, k: int,
                 rng: jax.Array) -> jnp.ndarray:
    """Draw next tokens from the (B, k+1) slot distribution + tie blocks
    (``_topk_topp_slots``) with ONE shared key for the batch."""
    B = slot_logits.shape[0]
    mb, bs = tie_blocks                           # (B,nb,L), (B,nb)
    r_cat, r_tie = jax.random.split(rng)
    choice = jax.random.categorical(r_cat, slot_logits, axis=-1)
    # tie slot drawn -> uniform over the kept tie entries; entry j maps
    # to the j-th tied token in index order.  Two-level select on the
    # 128-lane block sums: find the block holding the target-th tie,
    # then rank within that one block — no V-wide cumsum/argmax.
    # clamp with t_keep-1, not n_tie-1: in the f32 edge where
    # uniform*t_keep rounds up to t_keep, an n_tie clamp could pick a
    # tied token beyond the kept top-p prefix (one HF filtered out)
    target = jnp.minimum(
        (jax.random.uniform(r_tie, (B,)) * t_keep).astype(jnp.int32),
        jnp.maximum(t_keep.astype(jnp.int32) - 1, 0))
    cum_b = jnp.cumsum(bs, axis=-1)               # (B, nb) small
    blk = jnp.argmax(cum_b > target[:, None], axis=-1)
    rows = jnp.arange(B)
    before = cum_b[rows, blk] - bs[rows, blk]
    within = (target - before)[:, None]
    bm = mb[rows, blk]                            # (B, L) one block
    wrank = jnp.cumsum(bm.astype(jnp.int32), axis=-1) - 1
    off = jnp.argmax(bm & (wrank == within), axis=-1)
    tie_tok = (blk * mb.shape[-1] + off).astype(idx.dtype)
    from_slice = jnp.take_along_axis(
        idx, jnp.minimum(choice, k - 1)[:, None], axis=1)[:, 0]
    return jnp.where(choice == k, tie_tok, from_slice)


def process_and_sample_per_row(logits: jnp.ndarray, keys: jax.Array,
                               token_history: jnp.ndarray,
                               history_len: jnp.ndarray,
                               cfg: SamplingConfig) -> jnp.ndarray:
    """``process_and_sample`` with an independent PRNG key per row.

    The shared-key batched form draws row i's token from a key stream that
    depends on the batch layout, so a request's output changes with its
    batch position.  Serving needs the opposite: with per-request keys a
    request's generated tokens are REPRODUCIBLE regardless of which slot
    it lands in or what shares the batch (continuous batching,
    serve_batching.py; the sampled speculative window scorer,
    eval/speculative.py — pinned by tests/test_serve_batching.py and
    tests/test_speculative.py).

    Performance: every key-free V-wide stage (penalties, ngram ban, the
    top-k/top-p slot machinery) runs BATCHED over all rows — vmapping
    those lowers to per-row (1, V) top-k calls, measured 2.6x slower than
    the plain decode in the W=8 speculative scorer.  Only the draw from
    the tiny (k+1)-slot distribution is vmapped, with each row's draw
    shaped (1, k+1) so the bits consumed from a given key are EXACTLY the
    single-row ``process_and_sample`` call's (same key, same shape): the
    per-request reproducibility contract is unchanged.
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
        k = cfg.top_k
        slot_logits, idx, t_keep, (mb, bs) = _topk_topp_slots(
            logits, k, cfg.top_p)
        draw = lambda sl, ix, tk, m, b, ky: _draw_sliced(
            sl[None], ix[None], tk[None], (m[None], b[None]), k, ky)[0]
        return jax.vmap(draw)(slot_logits, idx, t_keep, mb, bs, keys)
    logits = apply_top_p(logits, cfg.top_p)
    return jax.vmap(
        lambda l, ky: jax.random.categorical(ky, l[None], axis=-1)[0]
    )(logits, keys)


_TIE_LANES = 128


def _tie_blocks(logits: jnp.ndarray, thresh: jnp.ndarray):
    """Tie mask reshaped to 128-lane blocks + per-block counts.

    The compare + block reduce is the only V-wide kernel the tie
    bookkeeping needs; everything downstream works on the (B, nb) sums.
    Returns (mb (B,nb,128) bool, bs (B,nb) int32)."""
    B, V = logits.shape
    m = logits == thresh
    pad = (-V) % _TIE_LANES
    if pad:
        m = jnp.pad(m, ((0, 0), (0, pad)))
    mb = m.reshape(B, -1, _TIE_LANES)
    return mb, mb.sum(axis=-1, dtype=jnp.int32)


def _topk_topp_slots(logits: jnp.ndarray, k: int, p: float):
    """Tie-exact (B, k+1)-slot logits for the sliced top-k/top-p draw.

    Slots 0..k-1 are the slice entries strictly above the k-th logit
    (top-p-masked with HF's per-slot rule); slot k carries the total mass
    of the KEPT part of the tie class (``t_keep`` entries of
    ``exp(thresh)`` each).  Returns (slot_logits, idx, t_keep,
    (mb, bs) tie blocks) — enough to both draw from and reconstruct the
    implied full-vocab distribution (see tests).
    """
    # approx_max_k with recall 1.0 is exact (bit-identical vals AND idx to
    # lax.top_k on f32, verified) and lowers to the TPU PartialReduce op
    # instead of a full V-wide sort; interleaved in-scan A/Bs measure it
    # equal to lax.top_k under contention and never worse.
    vals, idx = jax.lax.approx_max_k(logits, k, recall_target=1.0)
    # keep the V-wide tie compare OUT of the top-k fusion: fused, XLA
    # recomputes the reduction per consumer tile (measured 1.8 ms vs
    # 0.03 ms barriered, V=128256 B=16 on v5e)
    vals, idx = jax.lax.optimization_barrier((vals, idx))
    thresh = vals[..., -1:]                           # k-th logit (B,1)
    mx = vals[..., :1]                                # row max (B,1)
    exp_v = jnp.exp(vals - mx)                        # (B, k)
    e_t = jnp.exp(thresh - mx)[..., 0]                # tie unit (B,)
    mb, bs = _tie_blocks(logits, thresh)
    n_tie = bs.sum(axis=-1)                           # total ties (B,)
    m = k - jnp.sum(vals == thresh, axis=-1)          # strictly above
    above = jnp.arange(k)[None, :] < m[:, None]       # (B, k)
    e_above = jnp.where(above, exp_v, 0.0)
    cum = jnp.cumsum(e_above, axis=-1)                # inclusive
    cum_m = cum[..., -1]                              # mass above ties
    if p < 1.0:
        pZ = p * (cum_m + n_tie * e_t)                # p · kept-set mass
        keep_above = above & ((cum - e_above) < pZ[:, None])
        # tie entry j (1-indexed) kept iff cum_m + (j-1)·e_t < p·Z
        t_keep = jnp.clip(
            jnp.ceil((pZ - cum_m) / jnp.maximum(e_t, 1e-38)),
            0.0, n_tie.astype(jnp.float32))
        t_keep = jnp.where(m == 0, jnp.maximum(t_keep, 1.0), t_keep)
    else:
        keep_above = above
        t_keep = n_tie.astype(jnp.float32)
    slot_logits = jnp.concatenate(
        [jnp.where(keep_above, vals, NEG_INF),
         jnp.where(t_keep > 0,
                   jnp.log(jnp.maximum(t_keep * e_t, 1e-38)) + mx[..., 0],
                   NEG_INF)[:, None]], axis=-1)       # (B, k+1)
    return slot_logits, idx, t_keep, (mb, bs)
