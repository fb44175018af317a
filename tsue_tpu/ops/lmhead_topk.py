"""Fused LM-head + top-k sampling: never materialize (B, V) logits.

The decode step's sampler tail is the remaining B-proportional cost after
int8 weights (PARITY.md decode-step profile): XLA computes the (B, 128256)
f32 logits, round-trips them through HBM, then runs repetition-penalty and
n-gram-ban passes and an exact top-k custom call over the full width — at
bs128 this V-wide stream dominates the step (own-byte HBM utilization
falls to 19%/13%).  This module fuses the whole pre-draw pipeline into ONE
Pallas kernel that streams the LM-head weight in V-tiles and keeps a
running exact top-M while each logits tile is still in VMEM:

- tile logits = hidden @ W_tile on the MXU (bf16 weights, or the int8
  ``quant`` tables of ops/quant.py dequantized in VMEM — composes with
  weight-only decode);
- the repetition penalty and the n-gram ban are applied IN-TILE from a
  (B, V) uint8 token-state mask (bit0 = seen -> penalize, bit1 = banned
  -> -inf) built once per step by cheap elementwise scatters — replacing
  two V-wide f32 logit passes with one uint8 read;
- a (val desc, idx asc)-ordered top-M leaderboard (M = 128 lanes) is
  maintained with bitonic compare-exchange networks on the 128-lane
  registers (pltpu.roll butterflies), merging each 128-wide block only
  when its max beats the current M-th value (predicated skip — after the
  first tiles almost every block skips);
- the emitted (vals, idx) slice is EXACTLY ``lax.top_k(processed_logits,
  M)`` including HF's ascending-index tie order, so the existing
  tie-exact slot sampler (ops/sampling.py) consumes it unchanged — the
  tie class is read from the slice instead of V-wide blocks.

Exactness: tokens drawn through :func:`sample_from_topk_slice` are
bitwise the plain ``process_and_sample`` chain's (same key consumption,
same slot logits, same tie selection) whenever (a) the tie class at the
k-th logit fits inside the M-slot slice — over 128k bf16 logits a
>88-way exact boundary tie does not occur in practice (spill is
detectable: ``vals[:, -1] == thresh``, tested) — and (b) the logits
agree bitwise.  (b) carries the usual formulation caveat: the tile-wise
MXU matmul and a penalty division can each round one ulp apart from
XLA's fused versions, flipping near-tied draws — exactly the
``decode_window`` caveat (eval/speculative.py); the parity tests pin
bitwise equality on exact-arithmetic inputs and closeness elsewhere.

No reference equivalent: the reference samples with HF generate over
materialized fp32 logits (ref scripts/train.py:630-642); this is the
TPU-native serving lever the r3 decode profile recorded as future work.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsue_tpu.ops.sampling import NEG_INF, SamplingConfig

LANES = 128          # leaderboard width M == one vector register row
_SEEN, _BANNED = 1, 2


# ---------------------------------------------------------------------------
# bitonic compare-exchange machinery on (B, 128) registers
# ---------------------------------------------------------------------------

def _partner(x, d):
    """x[lane ^ d] for every lane — XOR butterfly via two circular rolls
    (aligned power-of-two patterns never read across their own group)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where((lane & d) == 0,
                     pltpu.roll(x, LANES - d, axis=1),   # x[lane + d]
                     pltpu.roll(x, d, axis=1))           # x[lane - d]


def _rank_ge(v, i, pv, pi):
    """(v, i) ranks at-or-before (pv, pi) in (val desc, idx asc) order —
    the total order that makes the network's output match lax.top_k's
    tie semantics exactly."""
    return (v > pv) | ((v == pv) & (i <= pi))


def _cmpex(v, i, d, up):
    """One compare-exchange stage at butterfly distance ``d``.

    ``up`` (B, 128) bool: lanes where the pair's HIGHER-ranked element
    should land (descending blocks keep the max at the lower lane)."""
    pv, pi = _partner(v, d), _partner(i, d)
    keep_hi = up == ((jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
                      & d) == 0)
    better = _rank_ge(v, i, pv, pi)
    take_self = better == keep_hi
    return (jnp.where(take_self, v, pv), jnp.where(take_self, i, pi))


def _sort_desc(v, i):
    """Full bitonic sort of (B, 128) by (val desc, idx asc)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    for k in (2, 4, 8, 16, 32, 64, 128):
        # descending blocks where bit k of the lane index is 0
        up = (lane & k) == 0
        d = k // 2
        while d >= 1:
            v, i = _cmpex(v, i, d, up)
            d //= 2
    return v, i


def _reverse(x):
    """Lane reversal = the XOR-127 butterfly chain."""
    for d in (64, 32, 16, 8, 4, 2, 1):
        x = _partner(x, d)
    return x


def _merge_top(lv, li, sv, si):
    """Keep the best 128 of (leaderboard, candidates), both sorted desc.

    [lv, reverse(sv)] is bitonic; the distance-128 stage of its bitonic
    merge is the elementwise rank-max, after which 7 cleanup stages
    re-sort the kept half descending."""
    rv, ri = _reverse(sv), _reverse(si)
    hi = _rank_ge(lv, li, rv, ri)
    v = jnp.where(hi, lv, rv)
    i = jnp.where(hi, li, ri)
    ones = jnp.ones(v.shape, bool)
    for d in (64, 32, 16, 8, 4, 2, 1):
        v, i = _cmpex(v, i, d, ones)
    return v, i


# ---------------------------------------------------------------------------
# the fused kernel
# ---------------------------------------------------------------------------

def _head_topk_kernel(h_ref, w_ref, m_ref, vals_ref, idx_ref, *,
                      tile_v: int, penalty: float, int8: bool,
                      s_ref=None):
    """One grid step: logits for ``tile_v`` vocab columns + leaderboard
    update.  Weight layouts: bf16 tied embedding rows (tile_v, D) or the
    int8 ``quant`` head (D, tile_v) with per-column scales.

    Leaderboard updates are predicated per 128-block over the WHOLE
    batch — the r4 formulation, kept after the r5 finer-predication
    study measured every alternative worse (PARITY.md "Fused-head
    large-batch floor").  At bs128 ~every block fires this predicate
    (P[any of 128 rows improves] ~ 1), which is exactly why the kernel
    loses to XLA's fused head at large batch; but splitting the
    predicate into (8, 128) sublane-tile groups cannot be expressed
    profitably: Mosaic aborts on sublane-sliced vector VALUES, unrolled
    per-group networks explode compile time (16 groups x 8 blocks of
    bitonic stages), and the working formulation — candidates staged
    through VMEM scratch + a ``fori_loop`` whose body slices refs at
    dynamic sublane offsets — serializes 16k scalar branch evaluations
    per step and measured 0.37-0.46x XLA at bs64-128 (vs this form's
    0.83-0.92x).  The kernel therefore stays the bs16 latency-point
    lever (+6%) and the large-batch point stays on XLA's fused head."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    h = h_ref[:]
    if int8:
        logits = jax.lax.dot_general(
            h, w_ref[:].astype(h.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * s_ref[:]
    else:
        logits = jax.lax.dot_general(
            h, w_ref[:].astype(h.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    if m_ref is not None:
        mask = m_ref[:]
        if penalty != 1.0:
            # divide, don't multiply by the reciprocal: the plain chain
            # divides (ops/sampling.py) and the two round differently at
            # ulp level — bitwise parity requires the same op
            pen = jnp.where(logits > 0, logits / penalty,
                            logits * penalty)
            logits = jnp.where((mask & _SEEN) != 0, pen, logits)
        logits = jnp.where((mask & _BANNED) != 0, NEG_INF, logits)

    base = t * tile_v
    for s in range(tile_v // LANES):
        bv = logits[:, s * LANES:(s + 1) * LANES]
        bi = (base + s * LANES
              + jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1))

        # skip blocks that cannot touch the leaderboard (the common case
        # after the first tiles): strictly-greater only — an equal value
        # has a LARGER index, which (desc, idx asc) rejects
        @pl.when(jnp.any(jnp.max(bv, axis=1) > vals_ref[:, LANES - 1]))
        def _(bv=bv, bi=bi):
            sv, si = _sort_desc(bv, bi)
            mv, mi = _merge_top(vals_ref[:], idx_ref[:], sv, si)
            vals_ref[:] = mv
            idx_ref[:] = mi


def _round_tile(v: int, d: int, bytes_per: float, budget: float) -> int:
    """Largest LANES-multiple tile that divides V and fits the budget."""
    blocks = v // LANES
    best = LANES
    for nb in range(1, blocks + 1):
        if blocks % nb == 0 and nb * LANES * d * bytes_per <= budget:
            best = nb * LANES
    return best


def _check_v(v: int):
    if v % LANES:
        raise ValueError(f"vocab_size must be a multiple of {LANES} for "
                         f"the fused head (got {v}); pad the embedding "
                         "or use the plain sampler")


@functools.partial(jax.jit, static_argnames=("penalty", "interpret"))
def _lmhead_topk_bf16(hidden, w, mask, penalty=1.0, interpret=False):
    B, D = hidden.shape
    V = w.shape[0]
    _check_v(V)
    tile_v = _round_tile(V, D, 2.0, 4 * 2 ** 20)
    use_mask = mask is not None

    def kern(*refs):
        if use_mask:
            h_ref, w_ref, m_ref, vals_ref, idx_ref = refs
        else:
            (h_ref, w_ref, vals_ref, idx_ref), m_ref = refs, None
        _head_topk_kernel(h_ref, w_ref, m_ref, vals_ref, idx_ref,
                          tile_v=tile_v, penalty=penalty, int8=False)

    in_specs = [
        pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, D), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [hidden, w]
    if use_mask:
        in_specs.append(pl.BlockSpec((B, tile_v), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    return pl.pallas_call(
        kern,
        grid=(V // tile_v,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((B, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, LANES), jnp.int32)),
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnames=("penalty", "interpret"))
def _lmhead_topk_int8(hidden, w8, scale, mask, penalty=1.0,
                      interpret=False):
    B, D = hidden.shape
    V = w8.shape[1]
    _check_v(V)
    tile_v = _round_tile(V, D, 1.0, 4 * 2 ** 20)
    use_mask = mask is not None

    def kern(*refs):
        if use_mask:
            h_ref, w_ref, s_ref, m_ref, vals_ref, idx_ref = refs
        else:
            (h_ref, w_ref, s_ref, vals_ref, idx_ref), m_ref = refs, None
        _head_topk_kernel(h_ref, w_ref, m_ref, vals_ref, idx_ref,
                          tile_v=tile_v, penalty=penalty, int8=True,
                          s_ref=s_ref)

    in_specs = [
        pl.BlockSpec((B, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((D, tile_v), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_v), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [hidden, w8, scale.astype(jnp.float32).reshape(1, -1)]
    if use_mask:
        in_specs.append(pl.BlockSpec((B, tile_v), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    return pl.pallas_call(
        kern,
        grid=(V // tile_v,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((B, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, LANES), jnp.int32)),
        interpret=interpret,
    )(*args)


def token_state_mask(token_history, history_len, vocab_size: int,
                     cfg: SamplingConfig) -> jnp.ndarray:
    """(B, V) per-token state for the in-kernel processors: bit0 =
    in history (repetition penalty), bit1 = completes a seen n-gram
    (ban).  Built by the SAME window-match logic as ops/sampling.py
    (semantics pinned by the parity tests) but emitted as one uint8
    scatter instead of two V-wide f32 logit rewrites."""
    B = token_history.shape[0]
    L = token_history.shape[1]
    rows = jnp.arange(B)[:, None]
    mask = jnp.zeros((B, vocab_size), jnp.int32)
    if cfg.repetition_penalty != 1.0:
        valid = jnp.arange(L)[None, :] < history_len[:, None]
        mask = mask.at[rows, token_history].max(
            jnp.where(valid, _SEEN, 0))
    n = cfg.no_repeat_ngram_size
    if n > 0:
        idx = jnp.arange(L)

        def suffix_tok(k):
            pos = jnp.clip(history_len - 1 - k, 0, L - 1)
            return token_history[jnp.arange(B), pos]

        match = jnp.ones((B, L), bool)
        for k in range(n - 1):
            shifted = jnp.roll(token_history, -k, axis=1)
            match = match & (shifted == suffix_tok(n - 2 - k)[:, None])
        fits = idx[None, :] + n - 1 < history_len[:, None]
        enough = (history_len >= n - 1)[:, None]
        match = match & fits & enough
        next_pos = jnp.clip(idx + n - 1, 0, L - 1)
        next_tok = token_history[:, next_pos]
        mask = mask.at[rows, next_tok].max(
            jnp.where(match, _BANNED, 0))
    return mask


@functools.lru_cache(maxsize=None)
def _partitioned_lmhead_topk(int8: bool, use_mask: bool, penalty: float,
                             interpret: bool):
    """GSPMD-partitionable wrapper (the ops/flash.py ``_partitioned_fwd``
    pattern).  The kernel is embarrassingly parallel over the batch dim —
    each row's exact top-128 needs the row's hidden state and the whole
    weight — so ``b`` shards freely (the natural mesh-serving layout:
    parallel/serve_tp.py shards requests over dp) while the model dims
    (d), vocab (v), the leaderboard width (l) and the scale's unit dim
    stay replicated.  Per-shard lowering = the raw kernel on the local
    batch."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    if int8:
        def impl(hidden, w8, scale, *rest):
            m = rest[0] if use_mask else None
            return _lmhead_topk_int8(hidden, w8, scale.reshape(-1), m,
                                     penalty=penalty, interpret=interpret)
        w_rule = "d v, u v" + (", b v" if use_mask else "")
    else:
        def impl(hidden, w, *rest):
            m = rest[0] if use_mask else None
            return _lmhead_topk_bf16(hidden, w, m, penalty=penalty,
                                     interpret=interpret)
        w_rule = "v d" + (", b v" if use_mask else "")

    fn = custom_partitioning(impl)

    def _b(arg_shapes):
        spec = getattr(arg_shapes[0].sharding, "spec", None) or P()
        return spec[0] if len(spec) > 0 else None

    def _arg_shardings(mesh, b):
        h = NamedSharding(mesh, P(b, None))
        if int8:
            args = [h, NamedSharding(mesh, P(None, None)),
                    NamedSharding(mesh, P(None, None))]
        else:
            args = [h, NamedSharding(mesh, P(None, None))]
        if use_mask:
            args.append(NamedSharding(mesh, P(b, None)))
        return tuple(args)

    def partition(mesh, arg_shapes, result_shape):
        b = _b(arg_shapes)
        out = NamedSharding(mesh, P(b, None))
        return mesh, impl, (out, out), _arg_shardings(mesh, b)

    def infer(mesh, arg_shapes, shape):
        b = _b(arg_shapes)
        out = NamedSharding(mesh, P(b, None))
        return (out, out)

    # need_replication must list factors in first-appearance order
    # (SDY verifier: "indices of special factors must be sorted") — for
    # the int8 rule the scale's unit factor u appears before l
    fn.def_partition(
        partition, infer_sharding_from_operands=infer,
        sharding_rule=f"b d, {w_rule} -> b l, b l",
        need_replication_factors=(("d", "v", "u", "l") if int8
                                  else ("d", "v", "l")))
    return fn


def lmhead_topk(hidden, weight, mask, penalty: float = 1.0,
                quant=None, interpret=None):
    """Processed-logits exact top-128 straight from the hidden state.

    ``weight``: the tied embedding (V, D) — or pass ``quant=(w8 (D, V)
    int8, scale (V,))`` from ops/quant.py to stream int8 instead.
    ``mask``: :func:`token_state_mask` output.  Returns (vals (B, 128)
    f32, idx (B, 128) i32) == ``lax.top_k(processed_logits, 128)``
    including tie order.  ``interpret=None`` auto-selects the Pallas
    interpreter on CPU (ops/quant.py convention).  Multi-device runtimes
    route through the ``custom_partitioning`` registration so mesh
    serving shards the kernel over batch instead of all-gathering.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    interpret = bool(interpret)
    from tsue_tpu.ops.quant import _vma
    operands = (hidden, weight, mask) if quant is None else \
        (hidden, quant[0], quant[1], mask)
    multi = jax.device_count() > 1 and not _vma(
        *[a for a in operands if a is not None])
    if quant is not None:
        w8, scale = quant
        if multi:
            fn = _partitioned_lmhead_topk(True, mask is not None,
                                          float(penalty), interpret)
            args = (hidden, w8, scale.reshape(1, -1))
            return fn(*(args + ((mask,) if mask is not None else ())))
        return _lmhead_topk_int8(hidden, w8, scale, mask,
                                 penalty=penalty, interpret=interpret)
    if multi:
        fn = _partitioned_lmhead_topk(False, mask is not None,
                                      float(penalty), interpret)
        args = (hidden, weight)
        return fn(*(args + ((mask,) if mask is not None else ())))
    return _lmhead_topk_bf16(hidden, weight, mask, penalty=penalty,
                             interpret=interpret)


# ---------------------------------------------------------------------------
# slice-space sampling (consumes the kernel output)
# ---------------------------------------------------------------------------

def topk_slice_slots(vals, idx, k: int, p: float, temperature: float):
    """ops/sampling._topk_topp_slots math on the (B, M) slice instead of
    V-wide blocks: identical slot logits / t_keep whenever the tie class
    fits the slice (n_tie <= M - m; ``spill`` flags rows where it might
    not).  Temperature is applied here — it is monotonic, so top-k over
    raw logits == top-k over scaled ones, ties included."""
    M = vals.shape[1]
    v = vals if temperature == 1.0 else vals / temperature
    kv = v[:, :k]
    thresh = kv[:, k - 1:k]
    mx = kv[:, :1]
    exp_v = jnp.exp(kv - mx)
    e_t = jnp.exp(thresh - mx)[:, 0]
    tie = v == thresh                                   # (B, M) slice ties
    n_tie = tie.sum(axis=-1)
    spill = v[:, M - 1] == thresh[:, 0]
    m = k - jnp.sum(kv == thresh, axis=-1)
    above = jnp.arange(k)[None, :] < m[:, None]
    e_above = jnp.where(above, exp_v, 0.0)
    cum = jnp.cumsum(e_above, axis=-1)
    cum_m = cum[..., -1]
    if p < 1.0:
        pZ = p * (cum_m + n_tie * e_t)
        keep_above = above & ((cum - e_above) < pZ[:, None])
        t_keep = jnp.clip(
            jnp.ceil((pZ - cum_m) / jnp.maximum(e_t, 1e-38)),
            0.0, n_tie.astype(jnp.float32))
        t_keep = jnp.where(m == 0, jnp.maximum(t_keep, 1.0), t_keep)
    else:
        keep_above = above
        t_keep = n_tie.astype(jnp.float32)
    slot_logits = jnp.concatenate(
        [jnp.where(keep_above, kv, NEG_INF),
         jnp.where(t_keep > 0,
                   jnp.log(jnp.maximum(t_keep * e_t, 1e-38)) + mx[:, 0],
                   NEG_INF)[:, None]], axis=-1)
    return slot_logits, t_keep, tie, spill


def _draw_slice(slot_logits, idx, t_keep, tie, k: int, rng, per_row: bool):
    """The _draw_sliced draw on slice-local ties: same key consumption
    (r_cat categorical + r_tie uniform), tie entry j = the j-th tied slot
    in slice order — which IS ascending token order, matching the V-block
    selection bitwise when ties fit the slice."""
    B = slot_logits.shape[0]
    if per_row:
        split = jax.vmap(jax.random.split)(rng)          # (B, 2)
        choice = jax.vmap(
            lambda l, ky: jax.random.categorical(ky, l[None], axis=-1)[0]
        )(slot_logits, split[:, 0])
        u = jax.vmap(
            lambda ky: jax.random.uniform(ky, (1,))[0])(split[:, 1])
    else:
        r_cat, r_tie = jax.random.split(rng)
        choice = jax.random.categorical(r_cat, slot_logits, axis=-1)
        u = jax.random.uniform(r_tie, (B,))
    target = jnp.minimum((u * t_keep).astype(jnp.int32),
                         jnp.maximum(t_keep.astype(jnp.int32) - 1, 0))
    trank = jnp.cumsum(tie.astype(jnp.int32), axis=-1) - 1
    tie_slot = jnp.argmax(tie & (trank == target[:, None]), axis=-1)
    rows = jnp.arange(B)
    tie_tok = idx[rows, tie_slot]
    from_slice = jnp.take_along_axis(
        idx, jnp.minimum(choice, k - 1)[:, None], axis=1)[:, 0]
    return jnp.where(choice == k, tie_tok, from_slice)


def sample_from_topk_slice(vals, idx, rng, cfg: SamplingConfig,
                           per_row: bool = False):
    """(vals, idx) from :func:`lmhead_topk` -> next tokens (B,).

    Bitwise ``process_and_sample`` (shared key) / ``..._per_row``
    (per-row keys) on the same processed logits whenever ties fit the
    slice; greedy returns slot 0 (argmax with ascending-index ties).
    Requires ``0 < cfg.top_k <= M - 1`` for the sampled arm (the slice
    must hold at least the k slots plus tie room)."""
    if not cfg.do_sample:
        return idx[:, 0]
    M = vals.shape[1]
    if not 0 < cfg.top_k < M:
        raise ValueError(f"fused sampling needs 0 < top_k < {M}, got "
                         f"{cfg.top_k} (use the plain sampler)")
    slot_logits, t_keep, tie, _ = topk_slice_slots(
        vals, idx, cfg.top_k, cfg.top_p, cfg.temperature)
    return _draw_slice(slot_logits, idx, t_keep, tie, cfg.top_k, rng,
                       per_row)


def fused_head_sample(hidden, weight, rng, token_history, history_len,
                      cfg: SamplingConfig, quant=None,
                      per_row: bool = False, interpret: bool = False):
    """Full fused pipeline: hidden (B, D) -> next tokens (B,), matching
    ``process_and_sample(logits_from_hidden(h), ...)`` bitwise (slice-tie
    caveat above) without ever materializing (B, V) logits."""
    V = weight.shape[0] if quant is None else quant[0].shape[1]
    mask = token_state_mask(token_history, history_len, V, cfg)
    vals, idx = lmhead_topk(hidden, weight, mask,
                            penalty=cfg.repetition_penalty, quant=quant,
                            interpret=interpret)
    return sample_from_topk_slice(vals, idx, rng, cfg, per_row=per_row)
