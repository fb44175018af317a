"""Cross-validate ops/sampling.py against HF transformers' processors.

The reference decodes through HF `generate` with do_sample, temperature=0.9,
top_k=40, top_p=0.9, no_repeat_ngram_size=3, repetition_penalty=1.2 (ref
scripts/train.py:630-642).  These tests feed identical logits/histories to
our jittable processors and HF's LogitsProcessor/Warper classes (torch-cpu)
and require identical filtering masks and surviving values — SURVEY §7
"hard parts" coverage that hand-built cases can't give.
"""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tfgen = pytest.importorskip("transformers.generation.logits_process")

from tsue_tpu.ops.sampling import (NEG_INF, apply_no_repeat_ngram,
                                   apply_repetition_penalty, apply_top_k,
                                   apply_top_p)

B, V, L = 5, 40, 16
_rng = np.random.default_rng(1234)
# small id range -> guaranteed repeated n-grams in every row
HIST = _rng.integers(0, 12, size=(B, L)).astype(np.int64)
LOGITS = (_rng.standard_normal((B, V)) * 3.0).astype(np.float32)


def _banned_mask(filtered, original):
    """Tokens newly set to the filter value by a processor."""
    f = np.asarray(filtered)
    return (f <= NEG_INF / 2) | np.isneginf(f)


def test_repetition_penalty_matches_hf():
    ours = apply_repetition_penalty(
        jnp.asarray(LOGITS), jnp.asarray(HIST),
        jnp.full((B,), L, jnp.int32), 1.2)
    hf = tfgen.RepetitionPenaltyLogitsProcessor(1.2)(
        torch.tensor(HIST), torch.tensor(LOGITS)).numpy()
    np.testing.assert_allclose(np.asarray(ours), hf, rtol=1e-6, atol=1e-7)


def test_no_repeat_ngram_matches_hf():
    for n in (2, 3, 4):
        # plant the current (n-1)-suffix earlier in every row so at least
        # one ban fires even when random ids produce no repeated n-gram
        hist = HIST.copy()
        hist[:, 2 : 2 + n - 1] = hist[:, L - (n - 1):]
        ours = apply_no_repeat_ngram(
            jnp.asarray(LOGITS), jnp.asarray(hist),
            jnp.full((B,), L, jnp.int32), n)
        hf = tfgen.NoRepeatNGramLogitsProcessor(n)(
            torch.tensor(hist), torch.tensor(LOGITS)).numpy()
        ours_banned = _banned_mask(ours, LOGITS)
        hf_banned = _banned_mask(hf, LOGITS)
        np.testing.assert_array_equal(ours_banned, hf_banned, err_msg=f"n={n}")
        # at least one ban must have happened or the test proves nothing
        assert hf_banned.any(), f"fixture produced no repeated {n}-grams"
        np.testing.assert_allclose(np.where(ours_banned, 0, np.asarray(ours)),
                                   np.where(hf_banned, 0, hf), rtol=1e-6)


def test_no_repeat_ngram_padded_history_matches_hf_per_row():
    """Fixed-shape padded histories must match HF run row-by-row unpadded."""
    lens = np.array([6, 9, 12, 16, 3])
    ours = apply_no_repeat_ngram(
        jnp.asarray(LOGITS), jnp.asarray(HIST), jnp.asarray(lens), 3)
    ours_banned = _banned_mask(ours, LOGITS)
    proc = tfgen.NoRepeatNGramLogitsProcessor(3)
    for i in range(B):
        hf = proc(torch.tensor(HIST[i : i + 1, : lens[i]]),
                  torch.tensor(LOGITS[i : i + 1])).numpy()
        np.testing.assert_array_equal(ours_banned[i], _banned_mask(hf, None)[0],
                                      err_msg=f"row {i} len {lens[i]}")


def test_top_k_matches_hf():
    for k in (1, 5, 40, 64):
        ours = apply_top_k(jnp.asarray(LOGITS), k)
        hf = tfgen.TopKLogitsWarper(top_k=k, filter_value=float(NEG_INF))(
            None, torch.tensor(LOGITS)).numpy()
        kept_ours = ~_banned_mask(ours, LOGITS)
        kept_hf = hf > NEG_INF / 2
        np.testing.assert_array_equal(kept_ours, kept_hf, err_msg=f"k={k}")
        np.testing.assert_allclose(np.where(kept_ours, np.asarray(ours), 0),
                                   np.where(kept_hf, hf, 0), rtol=1e-6)


def test_top_p_matches_hf():
    for p in (0.3, 0.9, 0.99):
        ours = apply_top_p(jnp.asarray(LOGITS), p)
        hf = tfgen.TopPLogitsWarper(top_p=p, filter_value=float(NEG_INF),
                                    min_tokens_to_keep=1)(
            None, torch.tensor(LOGITS)).numpy()
        kept_ours = ~_banned_mask(ours, LOGITS)
        kept_hf = hf > NEG_INF / 2
        np.testing.assert_array_equal(kept_ours, kept_hf, err_msg=f"p={p}")


def test_full_chain_filtered_logits_match_hf():
    """Processor chain in the reference's exact decode config: identical
    surviving-logit sets (sampled ids differ only by RNG backend)."""
    temperature, top_k, top_p = 0.9, 40, 0.9
    x = jnp.asarray(LOGITS)
    x = apply_repetition_penalty(x, jnp.asarray(HIST),
                                 jnp.full((B,), L, jnp.int32), 1.2)
    x = apply_no_repeat_ngram(x, jnp.asarray(HIST),
                              jnp.full((B,), L, jnp.int32), 3)
    x = x / temperature
    x = apply_top_k(x, top_k)
    x = apply_top_p(x, top_p)

    t = torch.tensor(LOGITS)
    ids = torch.tensor(HIST)
    t = tfgen.RepetitionPenaltyLogitsProcessor(1.2)(ids, t)
    t = tfgen.NoRepeatNGramLogitsProcessor(3)(ids, t)
    t = tfgen.TemperatureLogitsWarper(temperature)(ids, t)
    t = tfgen.TopKLogitsWarper(top_k=top_k, filter_value=float(NEG_INF))(ids, t)
    t = tfgen.TopPLogitsWarper(top_p=top_p, filter_value=float(NEG_INF))(ids, t)
    t = t.numpy()

    kept_ours = np.asarray(x) > NEG_INF / 2
    kept_hf = t > NEG_INF / 2
    np.testing.assert_array_equal(kept_ours, kept_hf)
    np.testing.assert_allclose(np.where(kept_ours, np.asarray(x), 0.0),
                               np.where(kept_hf, t, 0.0), rtol=1e-5)
