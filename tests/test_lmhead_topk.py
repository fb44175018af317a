"""Fused LM-head + top-k kernel (ops/lmhead_topk.py) parity contracts.

Bitwise tests use integer-valued f32 inputs: every dot product is then a
sum of integers well under 2^24, exact in ANY reduction order, so the
kernel's tile-wise matmul and XLA's fused one produce identical logits
and the whole pipeline must match bit-for-bit (incl. HF tie semantics).
Continuous-valued inputs only pin allclose + top-set agreement — the two
matmul formulations legitimately differ at ulp level (module docstring;
the same caveat class as the speculative window forward).  Bitwise tests
also pin the penalty to 2.0 (exact f32 division): at e.g. 1.2 the two
division sites can round one ulp apart, the same formulation caveat.

All kernels run in interpret mode on the CPU mesh; the real-chip numbers
live in scripts/ab_fused_head.py / PARITY.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.ops import lmhead_topk as LT
from tsue_tpu.ops.quant import int8_matmul_ref, quantize_weight
from tsue_tpu.ops.sampling import (SamplingConfig, apply_no_repeat_ngram,
                                   apply_repetition_penalty,
                                   process_and_sample,
                                   process_and_sample_per_row)

B, D, V, L = 4, 64, 1024, 24
CFG = SamplingConfig(temperature=0.9, top_k=40, top_p=0.9,
                     repetition_penalty=2.0, no_repeat_ngram_size=3)


def _int_inputs(seed=0, spread=3):
    """Integer-valued f32 hidden/weights: exact dots, reduction-order-free."""
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(
        rng.integers(-spread, spread + 1, (B, D)), jnp.float32)
    w = jnp.asarray(rng.integers(-spread, spread + 1, (V, D)), jnp.float32)
    hist = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    hlen = jnp.asarray(rng.integers(6, L, (B,)), jnp.int32)
    return hidden, w, hist, hlen


def _reference(logits, hist, hlen, cfg):
    p = apply_repetition_penalty(logits, hist, hlen, cfg.repetition_penalty)
    return apply_no_repeat_ngram(p, hist, hlen, cfg.no_repeat_ngram_size)


def test_kernel_matches_topk_bitwise_on_exact_dots():
    hidden, w, hist, hlen = _int_inputs()
    proc = _reference(jnp.dot(hidden, w.T), hist, hlen, CFG)
    mask = LT.token_state_mask(hist, hlen, V, CFG)
    vals, idx = LT.lmhead_topk(hidden, w, mask,
                               penalty=CFG.repetition_penalty,
                               interpret=True)
    rv, ri = jax.lax.top_k(proc, LT.LANES)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


def test_tie_order_matches_lax_topk():
    """Integer-valued logits produce MANY exact ties; the leaderboard's
    (val desc, idx asc) order must equal lax.top_k's everywhere."""
    hidden, w, hist, hlen = _int_inputs(seed=5, spread=1)  # heavy ties
    logits = jnp.dot(hidden, w.T)
    vals, idx = LT.lmhead_topk(hidden, w, None, penalty=1.0,
                               interpret=True)
    rv, ri = jax.lax.top_k(logits, LT.LANES)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))


@pytest.mark.parametrize("per_row", [False, True])
def test_fused_sampling_bitwise(per_row):
    hidden, w, hist, hlen = _int_inputs(seed=1)
    proc = _reference(jnp.dot(hidden, w.T), hist, hlen, CFG)
    mask = LT.token_state_mask(hist, hlen, V, CFG)
    vals, idx = LT.lmhead_topk(hidden, w, mask,
                               penalty=CFG.repetition_penalty,
                               interpret=True)
    if per_row:
        keys = jax.random.split(jax.random.key(9), B)
        ref = process_and_sample_per_row(proc, keys, hist, hlen, CFG)
        got = LT.sample_from_topk_slice(vals, idx, keys, CFG, per_row=True)
    else:
        key = jax.random.key(3)
        ref = process_and_sample(proc, key, hist, hlen, CFG)
        got = LT.sample_from_topk_slice(vals, idx, key, CFG)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_greedy_bitwise():
    hidden, w, hist, hlen = _int_inputs(seed=2)
    g = SamplingConfig(do_sample=False, repetition_penalty=2.0,
                       no_repeat_ngram_size=3)
    proc = _reference(jnp.dot(hidden, w.T), hist, hlen, g)
    mask = LT.token_state_mask(hist, hlen, V, g)
    vals, idx = LT.lmhead_topk(hidden, w, mask, penalty=2.0,
                               interpret=True)
    ref = process_and_sample(proc, jax.random.key(0), hist, hlen, g)
    np.testing.assert_array_equal(
        np.asarray(ref),
        np.asarray(LT.sample_from_topk_slice(vals, idx, jax.random.key(0),
                                             g)))


def test_int8_variant_bitwise_on_exact_dots():
    """int8 weights are integers; with integer hidden and power-of-two
    scales every product is exact -> bitwise parity incl. sampling."""
    rng = np.random.default_rng(4)
    hidden = jnp.asarray(rng.integers(-3, 4, (B, D)), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (D, V)), jnp.int8)
    scale = jnp.full((V,), 0.03125, jnp.float32)       # 2^-5: exact scale
    hist = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)
    hlen = jnp.asarray(rng.integers(6, L, (B,)), jnp.int32)
    logits = int8_matmul_ref(hidden, w8, scale, out_dtype=jnp.float32)
    proc = _reference(logits, hist, hlen, CFG)
    mask = LT.token_state_mask(hist, hlen, V, CFG)
    vals, idx = LT.lmhead_topk(hidden, None, mask,
                               penalty=CFG.repetition_penalty,
                               quant=(w8, scale), interpret=True)
    rv, ri = jax.lax.top_k(proc, LT.LANES)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(rv))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
    key = jax.random.key(7)
    np.testing.assert_array_equal(
        np.asarray(process_and_sample(proc, key, hist, hlen, CFG)),
        np.asarray(LT.sample_from_topk_slice(vals, idx, key, CFG)))


def test_continuous_inputs_close():
    """Continuous weights: ulp-level matmul formulation differences are
    allowed; vals must be allclose and the top SET nearly identical."""
    rng = np.random.default_rng(6)
    hidden = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((V, D)) * 0.1, jnp.float32)
    vals, idx = LT.lmhead_topk(hidden, w, None, penalty=1.0,
                               interpret=True)
    rv, ri = jax.lax.top_k(jnp.dot(hidden, w.T), LT.LANES)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), atol=1e-5)
    agree = np.mean([
        len(set(np.asarray(idx)[b]) & set(np.asarray(ri)[b])) / LT.LANES
        for b in range(B)])
    assert agree > 0.99


def test_quantized_real_layout_roundtrip():
    """The ops/quant.py lm_head layout (w8 (D, V), per-column scale)
    drives the int8 kernel and tracks its own XLA reference closely."""
    rng = np.random.default_rng(8)
    hidden = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((V, D)) * 0.1, jnp.float32)
    w8, scale = quantize_weight(w.T, axis=0)
    logits = int8_matmul_ref(hidden, w8, scale, out_dtype=jnp.float32)
    vals, idx = LT.lmhead_topk(hidden, None, None, penalty=1.0,
                               quant=(w8, scale), interpret=True)
    rv, _ = jax.lax.top_k(logits, LT.LANES)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), atol=1e-5)


def test_token_state_mask_semantics():
    """bit0 == the penalty 'seen' set, bit1 == the n-gram banned set, both
    as ops/sampling.py computes them."""
    hidden, w, hist, hlen = _int_inputs(seed=3)
    logits = jnp.zeros((B, V), jnp.float32)
    pen = apply_repetition_penalty(jnp.ones((B, V)), hist, hlen, 2.0)
    seen_ref = np.asarray(pen) != 1.0
    ban = apply_no_repeat_ngram(logits, hist, hlen, 3)
    ban_ref = np.asarray(ban) < -1e8
    mask = np.asarray(LT.token_state_mask(hist, hlen, V, CFG))
    np.testing.assert_array_equal((mask & 1) != 0, seen_ref)
    np.testing.assert_array_equal((mask & 2) != 0, ban_ref)


def test_spill_detection_and_vocab_guard():
    """A constant row ties the whole vocab: the slice flags the spill;
    non-128-multiple vocabs are rejected loudly."""
    vals = jnp.zeros((1, LT.LANES), jnp.float32)
    idx = jnp.arange(LT.LANES, dtype=jnp.int32)[None]
    _, _, _, spill = LT.topk_slice_slots(vals, idx, 40, 0.9, 1.0)
    assert bool(spill[0])
    with pytest.raises(ValueError, match="multiple of 128"):
        LT.lmhead_topk(jnp.zeros((1, D)), jnp.zeros((100, D)), None,
                       interpret=True)
    with pytest.raises(ValueError, match="top_k"):
        LT.sample_from_topk_slice(vals, idx, jax.random.key(0),
                                  SamplingConfig(top_k=LT.LANES))


def test_generate_fn_fused_head_matches_plain():
    """make_generate_fn(fused_head=True) drives the whole KV-cached decode
    through decode_hidden + the fused kernel and reproduces the plain
    generator's tokens on the tiny MLLM (CPU f32: the two head
    formulations agree here; on-chip bf16 carries the documented
    ulp caveat)."""
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.models.fusion import MultiModalLLM

    llama = dataclasses.replace(LlamaConfig.tiny(384), lora_dropout=0.0)
    qf = QFormerConfig(hidden_size=32, num_heads=2, num_encoder_layers=1,
                       num_decoder_layers=1, num_query_tokens=4,
                       dropout=0.0)
    mllm = MultiModalLLM(llama, qf)
    rng = np.random.default_rng(0)
    Bg, P = 3, 8
    vision = jnp.asarray(rng.standard_normal((Bg, 4, 512)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 380, (Bg, P)), jnp.int32)
    mask = jnp.ones((Bg, P), jnp.int32)
    variables = mllm.init({"params": jax.random.key(0)}, vision, ids,
                          mask, True)
    for cfg in (SamplingConfig(do_sample=False),
                SamplingConfig(temperature=0.9, top_k=40, top_p=0.9,
                               repetition_penalty=1.2,
                               no_repeat_ngram_size=3)):
        plain = make_generate_fn(mllm, cfg, 8, P, eos_id=383)
        fused = make_generate_fn(mllm, cfg, 8, P, eos_id=383,
                                 fused_head=True)
        key = jax.random.key(5)
        a = np.asarray(plain(variables, vision, ids, mask, key))
        b = np.asarray(fused(variables, vision, ids, mask, key))
        np.testing.assert_array_equal(a, b)


def test_generate_fn_fused_head_int8():
    """fused_head composes with the int8 quant collection (the kernel
    streams lm_head_w8 tiles) and still decodes through one program."""
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.models.fusion import MultiModalLLM
    from tsue_tpu.ops.quant import with_quantized_decode

    llama = dataclasses.replace(LlamaConfig.tiny(384), lora_dropout=0.0)
    qf = QFormerConfig(hidden_size=32, num_heads=2, num_encoder_layers=1,
                       num_decoder_layers=1, num_query_tokens=4,
                       dropout=0.0)
    mllm = MultiModalLLM(llama, qf)
    rng = np.random.default_rng(1)
    Bg, P = 2, 6
    vision = jnp.asarray(rng.standard_normal((Bg, 4, 512)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 380, (Bg, P)), jnp.int32)
    mask = jnp.ones((Bg, P), jnp.int32)
    variables = with_quantized_decode(
        mllm.init({"params": jax.random.key(0)}, vision, ids, mask, True))
    cfg = SamplingConfig(do_sample=False)
    plain = make_generate_fn(mllm, cfg, 6, P, eos_id=383)
    fused = make_generate_fn(mllm, cfg, 6, P, eos_id=383, fused_head=True)
    key = jax.random.key(2)
    a = np.asarray(plain(variables, vision, ids, mask, key))
    b = np.asarray(fused(variables, vision, ids, mask, key))
    np.testing.assert_array_equal(a, b)


def test_fused_head_rejects_bad_configs():
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.models.fusion import MultiModalLLM
    llama = LlamaConfig.tiny(384)
    qf = QFormerConfig(num_query_tokens=4)
    mllm = MultiModalLLM(llama, qf)
    with pytest.raises(ValueError, match="top_k"):
        make_generate_fn(mllm, SamplingConfig(top_k=0), 4, 8, eos_id=1,
                         fused_head=True)
    bad = MultiModalLLM(dataclasses.replace(llama, vocab_size=100), qf)
    with pytest.raises(ValueError, match="128"):
        make_generate_fn(bad, SamplingConfig(), 4, 8, eos_id=1,
                         fused_head=True)


class TestGSPMDPartitioning:
    """The fused LM-head+top-k kernel registers custom_partitioning
    rules (_partitioned_lmhead_topk): batch shards freely (the mesh
    serving layout), weight/vocab replicate — serve_tp.py serves
    fused_head sharded instead of rejecting it (r5)."""

    def test_sharded_matches_and_no_allgather(self):
        import re
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from tsue_tpu.ops.lmhead_topk import lmhead_topk
        B, D, V = 16, 64, 512
        ks = jax.random.split(jax.random.key(41), 2)
        hidden = jax.random.normal(ks[0], (B, D), jnp.float32)
        w = jax.random.normal(ks[1], (V, D), jnp.float32)
        vals_ref, idx_ref = lmhead_topk(hidden, w, None, interpret=True)
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        f = jax.jit(lambda h, w_: lmhead_topk(h, w_, None,
                                              interpret=True))
        args = (jax.device_put(hidden, NamedSharding(mesh, P("data"))),
                jax.device_put(w, NamedSharding(mesh, P())))
        vals, idx = f(*args)
        assert vals.sharding.spec[0] == "data"
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
        np.testing.assert_array_equal(np.asarray(vals),
                                      np.asarray(vals_ref))
        hlo = f.lower(*args).compile().as_text()
        assert not re.findall(r"all-gather", hlo), \
            "fused-head operands were gathered — partition rules lost"

    def test_sharded_int8_with_mask_matches(self):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from tsue_tpu.ops.lmhead_topk import lmhead_topk
        from tsue_tpu.ops.quant import quantize_weight
        B, D, V = 8, 64, 384
        ks = jax.random.split(jax.random.key(42), 3)
        hidden = jax.random.normal(ks[0], (B, D), jnp.float32)
        w8, scale = quantize_weight(
            jax.random.normal(ks[1], (D, V)) * 0.2, axis=0)
        mask = (jax.random.uniform(ks[2], (B, V)) < 0.05).astype(
            jnp.int32)                               # bit0: seen
        ref = lmhead_topk(hidden, None, mask, penalty=1.2,
                          quant=(w8, scale), interpret=True)
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        dsh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        f = jax.jit(lambda h, a, b, m: lmhead_topk(
            h, None, m, penalty=1.2, quant=(a, b), interpret=True))
        out = f(jax.device_put(hidden, dsh), jax.device_put(w8, repl),
                jax.device_put(scale, repl), jax.device_put(mask, dsh))
        np.testing.assert_array_equal(np.asarray(out[1]),
                                      np.asarray(ref[1]))
        # per-shard row counts change the CPU interpreter's reduction
        # vectorization — vals agree to f32 ulp, token ids exactly
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)
