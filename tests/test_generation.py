"""Sampling processors and soft-prefix cached generation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import LlamaConfig, QFormerConfig
from tsue_tpu.data.tokenizer import ByteTokenizer
from tsue_tpu.eval.generation import (generate_texts, make_generate_fn,
                                      postprocess_text)
from tsue_tpu.models.fusion import MultiModalLLM
from tsue_tpu.ops.sampling import (SamplingConfig, apply_no_repeat_ngram,
                                   apply_repetition_penalty, apply_top_k,
                                   apply_top_p, process_and_sample)

V = 12


def _hist(rows, lens):
    return jnp.asarray(rows, jnp.int32), jnp.asarray(lens, jnp.int32)


class TestProcessors:
    def test_top_k(self):
        logits = jnp.asarray([[1., 5., 3., 2., 4.]])
        out = np.asarray(apply_top_k(logits, 2))
        assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 4])
        assert (out[0, [0, 2, 3]] < -1e8).all()

    def test_top_p_keeps_minimal_prefix(self):
        # probs ~ [0.97, 0.01, ...] => p=0.9 keeps only the top token
        logits = jnp.asarray([[10., 5., 4., 3., 2.]])
        out = np.asarray(apply_top_p(logits, 0.9))
        assert np.isfinite(out[0, 0])
        assert (out[0, 1:] < -1e8).all()
        # p=1 keeps everything
        out_full = np.asarray(apply_top_p(logits, 1.0))
        assert np.isfinite(out_full).all()

    def test_repetition_penalty(self):
        logits = jnp.asarray([[2.0, -2.0, 1.0, 0.5] + [0.0] * (V - 4)])
        hist, hlen = _hist([[0, 1, 0, 0]], [2])  # tokens 0 and 1 seen
        out = np.asarray(apply_repetition_penalty(logits, hist, hlen, 2.0))
        np.testing.assert_allclose(out[0, 0], 1.0)   # positive: divided
        np.testing.assert_allclose(out[0, 1], -4.0)  # negative: multiplied
        np.testing.assert_allclose(out[0, 2], 1.0)   # unseen: untouched
        # token beyond hlen (index 2 is 0 but 0 already seen) — check a pad
        # position isn't counted: token 3 at padded slots stays untouched
        hist2, hlen2 = _hist([[0, 1, 3, 3]], [2])
        out2 = np.asarray(apply_repetition_penalty(logits, hist2, hlen2, 2.0))
        np.testing.assert_allclose(out2[0, 3], 0.5)

    def test_no_repeat_ngram(self):
        # history: 5 6 7 5 6 -> suffix (5,6) seen at pos 0 followed by 7
        hist, hlen = _hist([[5, 6, 7, 5, 6, 0, 0]], [5])
        logits = jnp.zeros((1, V))
        out = np.asarray(apply_no_repeat_ngram(logits, hist, hlen, 3))
        assert out[0, 7] < -1e8
        assert np.isfinite(np.delete(out[0], 7)).all()

    def test_no_repeat_ngram_short_history(self):
        hist, hlen = _hist([[5, 0, 0]], [1])
        out = np.asarray(apply_no_repeat_ngram(jnp.zeros((1, V)), hist,
                                               hlen, 3))
        assert np.isfinite(out).all()

    @staticmethod
    def _implied_probs(logits, k, p):
        """Full-vocab distribution the sliced sampler draws from: slot
        softmax scattered to token ids, tie-slot mass spread uniformly
        over the first t_keep tied tokens (index order)."""
        from tsue_tpu.ops.sampling import _topk_topp_slots
        slot_logits, idx, t_keep, (mb, _) = _topk_topp_slots(
            jnp.asarray(logits, jnp.float32), k, p)
        V = np.asarray(logits).shape[-1]
        is_tie = np.asarray(mb).reshape(mb.shape[0], -1)[:, :V]
        sp = np.asarray(jax.nn.softmax(slot_logits, axis=-1))
        out = np.zeros_like(np.asarray(logits, np.float64))
        np.put_along_axis(out, np.asarray(idx), sp[:, :k], axis=-1)
        for b in range(out.shape[0]):
            tk = int(t_keep[b])
            kept = np.where(is_tie[b])[0][:tk]
            if len(kept):
                out[b, kept] += sp[b, k] / tk
        return out

    def test_fused_topk_topp_matches_reference_chain(self):
        """No boundary ties: the sliced sampler's implied distribution ==
        the full-vocab apply_top_k -> apply_top_p -> softmax chain."""
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((3, 101)) * 3, jnp.float32)
        k, pp = 13, 0.7
        full = apply_top_p(apply_top_k(logits, k), pp)
        probs_full = np.asarray(jax.nn.softmax(full, axis=-1))
        np.testing.assert_allclose(self._implied_probs(logits, k, pp),
                                   probs_full, atol=1e-6)

    def test_fused_topk_topp_tie_class_mass(self):
        """Boundary ties: each kept tied token gets exactly exp(thresh)/Z
        (HF per-token mass), the tie class total matches, and strictly-
        above tokens keep their full-chain probabilities."""
        logits = np.full((1, 50), -40.0, np.float32)
        logits[0, 0], logits[0, 1] = 4.0, 3.0
        logits[0, 10:18] = 2.0               # 8-way tie at the 3rd logit
        k, pp = 3, 0.9
        probs = self._implied_probs(jnp.asarray(logits), k, pp)[0]
        e = np.exp(np.array([4.0, 3.0, 2.0]) - 4.0)
        # the p-cutoff walks cumulative probs over the post-top-k mass
        # (tie class counted in full, as HF's sorted cumsum does) ...
        Z_full = e[0] + e[1] + 8 * e[2]      # HF keeps ALL 8 tied tokens
        t_keep = int(np.ceil((pp * Z_full - e[0] - e[1]) / e[2]))
        assert 0 < t_keep < 8                # the cutoff splits the class
        # ... while the final draw renormalizes over the kept set
        Z_kept = e[0] + e[1] + t_keep * e[2]
        np.testing.assert_allclose(probs[0], e[0] / Z_kept, rtol=1e-5)
        np.testing.assert_allclose(probs[1], e[1] / Z_kept, rtol=1e-5)
        np.testing.assert_allclose(probs[10:10 + t_keep], e[2] / Z_kept,
                                   rtol=1e-5)
        assert np.all(probs[10 + t_keep:18] == 0)
        np.testing.assert_allclose(probs.sum(), 1.0, rtol=1e-6)

    def test_topk_boundary_ties_keep_hf_semantics(self):
        """HF's TopKLogitsWarper keeps ALL tokens tied at the k-th logit;
        the branch-free fused path must keep tied tokens outside the
        k-slice sampleable via the tie slot (the (k+1)-th categorical slot
        carrying the kept tie mass + uniform pick among tied tokens)."""
        k = 3
        logits = np.full((1, V), -50.0, np.float32)
        logits[0, 0], logits[0, 1] = 5.0, 4.0
        logits[0, 2:6] = 3.0  # four-way tie at the k-th (3rd) logit
        hist, hlen = _hist([[0] * 4], [0])
        cfg = SamplingConfig(top_k=k, top_p=1.0, temperature=1.0,
                             repetition_penalty=1.0, no_repeat_ngram_size=0)
        fn = jax.jit(lambda r: process_and_sample(
            jnp.asarray(logits), r, hist, hlen, cfg))
        draws = {int(fn(jax.random.key(s))[0]) for s in range(300)}
        assert draws <= {0, 1, 2, 3, 4, 5}
        # every tied token is reachable — the k-slice alone holds only
        # token 2, so hitting 3/4/5 proves the tie slot engaged
        assert {3, 4, 5} <= draws

    def test_greedy_mode(self):
        logits = jnp.asarray([[0.1, 3.0, 0.2] + [0.0] * (V - 3)])
        hist, hlen = _hist([[0] * 4], [0])
        cfg = SamplingConfig(do_sample=False, repetition_penalty=1.0,
                             no_repeat_ngram_size=0)
        tok = process_and_sample(logits, jax.random.key(0), hist, hlen, cfg)
        assert int(tok[0]) == 1

    def test_top_k_1_is_greedy(self):
        logits = jax.random.normal(jax.random.key(0), (3, V))
        hist, hlen = _hist([[0] * 4] * 3, [0] * 3)
        cfg = SamplingConfig(top_k=1, top_p=1.0, repetition_penalty=1.0,
                             no_repeat_ngram_size=0, temperature=1.0)
        tok = process_and_sample(logits, jax.random.key(1), hist, hlen, cfg)
        np.testing.assert_array_equal(np.asarray(tok),
                                      np.asarray(jnp.argmax(logits, -1)))


TINY_Q = QFormerConfig(vision_dim=16, hidden_size=32, num_heads=4,
                       num_encoder_layers=1, num_decoder_layers=1,
                       num_query_tokens=4)


@pytest.fixture(scope="module")
def gen_setup():
    tok = ByteTokenizer()
    llama = LlamaConfig.tiny(tok.vocab_size)
    mllm = MultiModalLLM(llama=llama, qformer=TINY_Q)
    B, TV, L = 2, 3, 8
    vision = jnp.ones((B, TV, 16))
    ids = jnp.asarray(np.tile(tok.encode("Answer:\n"), (B, 1)), jnp.int32)[:, :L]
    mask = jnp.ones_like(ids)
    vs = mllm.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                   vision, ids, mask)
    return tok, mllm, vs, vision, ids, mask


class TestGeneration:
    def test_generates_fixed_shape_ids(self, gen_setup):
        tok, mllm, vs, vision, ids, mask = gen_setup
        gen = make_generate_fn(mllm, SamplingConfig(), 6, ids.shape[1],
                               tok.eos_id, tok.pad_id)
        out = gen(vs, vision, ids, mask, jax.random.key(0))
        assert out.shape == (2, 6)
        assert (np.asarray(out) >= 0).all()
        assert (np.asarray(out) < tok.vocab_size).all()

    def test_deterministic_given_key(self, gen_setup):
        tok, mllm, vs, vision, ids, mask = gen_setup
        gen = make_generate_fn(mllm, SamplingConfig(), 6, ids.shape[1],
                               tok.eos_id, tok.pad_id)
        o1 = gen(vs, vision, ids, mask, jax.random.key(7))
        o2 = gen(vs, vision, ids, mask, jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        o3 = gen(vs, vision, ids, mask, jax.random.key(8))
        assert not np.array_equal(np.asarray(o1), np.asarray(o3))

    def test_chunked_early_exit_matches_single_scan(self, gen_setup):
        """The while_loop-over-chunks decode is bit-identical to the single
        full-length scan for every chunking, including a non-dividing one
        (buffers padded to whole chunks, output sliced back)."""
        tok, mllm, vs, vision, ids, mask = gen_setup
        outs = []
        for chunk in (None, 4, 3, 10):
            gen = make_generate_fn(mllm, SamplingConfig(), 10, ids.shape[1],
                                   tok.eos_id, tok.pad_id,
                                   early_exit_chunk=chunk)
            outs.append(np.asarray(gen(vs, vision, ids, mask,
                                       jax.random.key(11))))
        for o in outs[1:]:
            np.testing.assert_array_equal(outs[0], o)

    def test_zero_max_new_tokens_returns_empty(self, gen_setup):
        """max_new_tokens=0 must stay a harmless empty generation (callers
        may compute the budget dynamically), not a build-time crash."""
        tok, mllm, vs, vision, ids, mask = gen_setup
        gen = make_generate_fn(mllm, SamplingConfig(), 0, ids.shape[1],
                               tok.eos_id, tok.pad_id)
        out = np.asarray(gen(vs, vision, ids, mask, jax.random.key(0)))
        assert out.shape == (2, 0)

    def test_chunked_early_exit_stops_on_eos(self, gen_setup):
        """With an EOS id every row samples immediately, the chunked decode
        exits after the first chunk and still pads the full output."""
        tok, mllm, vs, vision, ids, mask = gen_setup
        # greedy with eos = the argmax token => every row finishes at step 1
        cfg = SamplingConfig(do_sample=False, repetition_penalty=1.0,
                             no_repeat_ngram_size=0)
        gen_probe = make_generate_fn(mllm, cfg, 1, ids.shape[1],
                                     eos_id=-1, pad_id=tok.pad_id)
        first = np.asarray(gen_probe(vs, vision, ids, mask,
                                     jax.random.key(0)))[:, 0]
        eos = int(first[0])
        if not (first == eos).all():
            pytest.skip("rows disagree on the greedy first token")
        gen = make_generate_fn(mllm, cfg, 12, ids.shape[1], eos_id=eos,
                               pad_id=tok.pad_id, early_exit_chunk=4)
        out = np.asarray(gen(vs, vision, ids, mask, jax.random.key(0)))
        assert out.shape == (2, 12)
        np.testing.assert_array_equal(out[:, 0], first)
        assert (out[:, 1:] == tok.pad_id).all()

    def test_greedy_matches_uncached_forward(self, gen_setup):
        """1-step greedy decode == argmax over the uncached fused forward."""
        tok, mllm, vs, vision, ids, mask = gen_setup
        cfg = SamplingConfig(do_sample=False, repetition_penalty=1.0,
                             no_repeat_ngram_size=0)
        gen = make_generate_fn(mllm, cfg, 1, ids.shape[1], tok.eos_id,
                               tok.pad_id)
        out = np.asarray(gen(vs, vision, ids, mask, jax.random.key(0)))
        # uncached: full fused forward, logits at the last prompt position
        fused, fmask, n_img = mllm.apply(vs, vision, ids, mask,
                                         method=mllm.fuse)
        res = mllm.apply(vs, fused, fmask, compute_logits=True,
                         method=lambda m, e, am, **kw: m.llama_mod(
                             e, am, **kw))
        logits = np.asarray(res["logits"])[:, -1]  # all-ones mask, last pos
        np.testing.assert_array_equal(out[:, 0], logits.argmax(-1))

    def test_generate_texts_roundtrip(self, gen_setup):
        tok, mllm, vs, vision, ids, mask = gen_setup
        texts = generate_texts(mllm, vs, tok, vision, ids, mask,
                               jax.random.key(0), max_new_tokens=5)
        assert len(texts) == 2
        assert all(isinstance(t, str) for t in texts)


class TestPostprocess:
    def test_cutoff(self):
        t = "abc No right-following vehicle. trailing junk"
        assert postprocess_text(t).endswith("No right-following vehicle.")

    def test_answer_extraction(self):
        t = "prompt stuff Answer: the answer text"
        assert postprocess_text(t, extract_answer=True) == "the answer text"


class TestEosStop:
    def test_eos_masks_remaining_tokens(self, gen_setup):
        """Set eos_id to whatever greedy emits first: every later position
        must be pad and the sequence must not keep generating."""
        tok, mllm, vs, vision, ids, mask = gen_setup
        cfg = SamplingConfig(do_sample=False, repetition_penalty=1.0,
                             no_repeat_ngram_size=0)
        probe = make_generate_fn(mllm, cfg, 1, ids.shape[1], -1, tok.pad_id)
        first = int(np.asarray(probe(vs, vision, ids, mask,
                                     jax.random.key(0)))[0, 0])
        gen = make_generate_fn(mllm, cfg, 6, ids.shape[1], first, tok.pad_id)
        out = np.asarray(gen(vs, vision, ids, mask, jax.random.key(0)))
        assert out[0, 0] == first          # the eos itself is recorded
        assert (out[0, 1:] == tok.pad_id).all()
