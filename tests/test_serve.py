"""Serving predictor: warmup, batched predict, candidates, checkpoint load."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import (DataConfig, ExperimentConfig, LaneEncoderConfig,
                             LTSFConfig, ModelConfig, TrainConfig)
from tsue_tpu.data import make_synthetic_tracks
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.serve import Predictor

CFG = ExperimentConfig(
    name="serve",
    data=DataConfig(seq_len=6, out_len=6, use_text=False, use_vision=False),
    model=ModelConfig(use_llm=False,
                      lane=LaneEncoderConfig(d_model=16, nhead=2,
                                             num_layers=1),
                      ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
    train=TrainConfig(batch_size=8))


@pytest.fixture(scope="module")
def predictor():
    model = TrajectoryModel(CFG.model, 6, 6)
    dummy = Predictor(CFG, None, batch_size=4)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    return Predictor(CFG, vs["params"], batch_size=4,
                     num_candidates=3).warmup()


def test_predict_pixel_space(predictor):
    tracks = make_synthetic_tracks(num_tracks=4, track_len=300, seed=7)
    out = predictor.predict(tracks)
    assert len(out) > 0
    r = out[0]
    assert r["pred_pixel_xy"].shape == (2, 6)
    assert r["past_pixel_xy"].shape == (2, 6)
    assert r["candidates_pixel_xy"].shape == (3, 2, 6)
    # pixel-space sanity: outputs live in image coordinates, not [0,1]
    assert np.abs(r["past_pixel_xy"]).max() > 10
    # prediction continues from the end of the past (last-value residual
    # keeps untrained outputs anchored near the last observed position)
    last = r["past_pixel_xy"][:, -1]
    first_pred = r["pred_pixel_xy"][:, 0]
    rng_x = np.abs(r["past_pixel_xy"][0, -1] - r["past_pixel_xy"][0, 0])
    assert np.abs(first_pred - last).max() < 5 * rng_x


def test_empty_input(predictor):
    assert predictor.predict([]) == []


def test_tail_batch_padding(predictor):
    """Window count not divisible by batch size still returns all rows."""
    tracks = make_synthetic_tracks(num_tracks=3, track_len=300, seed=8)
    out = predictor.predict(tracks)
    from tsue_tpu.data.windowing import build_windows
    ds = build_windows(tracks, CFG.data)
    assert len(out) == len(ds)


def test_generate_context_with_llm():
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        data=DataConfig(seq_len=6, out_len=6, max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=2)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    p = Predictor(cfg, vs["params"], batch_size=2)
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    out = p.generate_context(tracks, max_new_tokens=4)
    assert len(out) == 2
    assert all(isinstance(r["context"], str) for r in out)


def test_generate_context_quantized_decode():
    """quantize_decode=True builds the int8 collection once, threads it
    through generation, and still produces text (ops/quant.py)."""
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        data=DataConfig(seq_len=6, out_len=6, max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=2)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    p = Predictor(cfg, vs["params"], batch_size=2, quantize_decode=True)
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    out = p.generate_context(tracks, max_new_tokens=4)
    assert len(out) == 2
    assert all(isinstance(r["context"], str) for r in out)
    # the quant collection was built and has int8 projections
    assert p._quant is not None
    import jax.numpy as jnp
    leaves = jax.tree_util.tree_leaves(p._quant)
    assert any(l.dtype == jnp.int8 for l in leaves)


def test_generate_context_speculative_matches_greedy():
    """speculative=True returns exactly the plain greedy decode's text
    (eval/speculative.py is a scheduling change, not a semantic one)."""
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data.tokenizer import ByteTokenizer
    from tsue_tpu.ops.sampling import SamplingConfig
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        data=DataConfig(seq_len=6, out_len=6, max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=2)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    p = Predictor(cfg, vs["params"], batch_size=2)
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    greedy = SamplingConfig(do_sample=False)
    ref = p.generate_context(tracks, max_new_tokens=6, sampling=greedy)
    out = p.generate_context(tracks, max_new_tokens=6, speculative=True)
    assert [r["context"] for r in out] == [r["context"] for r in ref]


def test_warmup_prevents_retrace(predictor):
    """predict() must reuse the warmup executable (same pytree keys)."""
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=10)
    predictor.predict(tracks)
    assert predictor._predict._cache_size() == 1


def test_continuous_batcher_from_predictor():
    """Predictor.continuous_batcher serves requests built from raw tracks
    through the slot pool (incl. the int8 quant tables when enabled)."""
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data.tokenizer import ByteTokenizer
    from tsue_tpu.data.text_dataset import build_track_text_dataset
    from tsue_tpu.eval.generation import prompt_only
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        data=DataConfig(seq_len=6, out_len=6, max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=2)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    p = Predictor(cfg, vs["params"], batch_size=2, quantize_decode=True)
    tracks = make_synthetic_tracks(num_tracks=3, track_len=300, seed=9)
    ds = build_track_text_dataset(tracks, cfg.data, p.tokenizer)
    ids, mask = prompt_only(
        {"input_ids": ds.input_ids, "attention_mask": ds.attention_mask,
         "labels": ds.labels})
    reqs = [{"vision": np.asarray(ds.vision[i]), "prompt_ids": ids[i],
             "prompt_mask": mask[i], "max_new": 3 + i}
            for i in range(len(ds))]
    batcher = p.continuous_batcher(num_slots=2, prompt_len=ids.shape[1],
                                   max_new_tokens=6, chunk=2)
    out = batcher.run(reqs)
    assert len(out) == len(reqs)
    assert all(len(row) <= 3 + i for i, row in enumerate(out))
    assert p._quant is not None  # quant tables threaded into the batcher


def test_generate_context_batched_slot_invariant():
    """Predictor.generate_context_batched: tracks in, text out through the
    continuous batcher; per-request fold_in keys make the result invariant
    to the pool size (co-batching never changes a track's output)."""
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        data=DataConfig(seq_len=6, out_len=6, max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=2)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    p = Predictor(cfg, vs["params"], batch_size=2)
    tracks = make_synthetic_tracks(num_tracks=3, track_len=300, seed=9)
    rng = jax.random.key(77)
    out2 = p.generate_context_batched(tracks, max_new_tokens=5, rng=rng,
                                      num_slots=2, chunk=2)
    out3 = p.generate_context_batched(tracks, max_new_tokens=5, rng=rng,
                                      num_slots=3, chunk=3)
    assert len(out2) == 3
    assert all(isinstance(r["context"], str) for r in out2)
    assert [r["track_id"] for r in out2] == [r["track_id"] for r in out3]
    assert [r["context"] for r in out2] == [r["context"] for r in out3]


def _tiny_llm_predictor(batch_size=2, max_length=64, **kw):
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        data=DataConfig(seq_len=6, out_len=6, max_length=max_length),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=batch_size)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    return Predictor(cfg, vs["params"], batch_size=batch_size, **kw)


def test_generation_program_cached_and_bounded():
    """generate_context compiles its program once per (max_new, mode,
    sampling) key and the cache is LRU-bounded — a long-running server
    fed request-controlled max_new_tokens values must not leak compiled
    programs (or their pool buffers) without bound."""
    p = _tiny_llm_predictor()
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    out1 = p.generate_context(tracks, max_new_tokens=4)
    gen1 = p._generators[next(iter(p._generators))]
    out2 = p.generate_context(tracks, max_new_tokens=4)
    assert len(p._generators) == 1
    assert p._generators[next(iter(p._generators))] is gen1
    assert [r["context"] for r in out1] == [r["context"] for r in out2]
    for mnt in (1, 2, 3, 5, 6):
        p.generate_context(tracks, max_new_tokens=mnt)
    assert len(p._generators) <= p._cache_max
    # the batcher cache is bounded by the same mechanism
    for mnt in (1, 2, 3, 5, 6):
        p.generate_context_batched(tracks, max_new_tokens=mnt)
    assert len(p._batchers) <= p._cache_max


def test_generate_serves_promptonly_and_reports_unconditionable():
    """Generation must not require the field being generated: a track
    without context_str gets a generated context; a track a
    vision-conditioned model cannot condition (no vision_embeddings)
    comes back as an explicit {track_id, error} record — one result per
    request track, never a silent drop."""
    p = _tiny_llm_predictor()
    base = dict(make_synthetic_tracks(num_tracks=1, track_len=300,
                                      seed=9)[0])
    no_ctx = dict(base)
    no_ctx.pop("context_str", None)
    no_ctx["track_id"] = 101
    no_vis = dict(base)
    no_vis.pop("vision_embeddings", None)
    no_vis["track_id"] = 102
    out = p.generate_context([no_ctx, no_vis], max_new_tokens=4)
    assert len(out) == 2
    by_id = {r["track_id"]: r for r in out}
    assert isinstance(by_id[101]["context"], str)
    assert "error" in by_id[102] and "vision" in by_id[102]["error"]
    # same contract through the continuous batcher
    out_b = p.generate_context_batched([no_ctx, no_vis], max_new_tokens=4,
                                       num_slots=2, chunk=2)
    by_id_b = {r["track_id"]: r for r in out_b}
    assert isinstance(by_id_b[101]["context"], str)
    assert "error" in by_id_b[102]


def test_compile_cap_trims_without_recompiling():
    """compile_cap: every max_new_tokens <= cap is served by trimming the
    ONE program compiled at the cap (a client-controlled knob must never
    trigger an XLA compile in the request path), and greedy outputs are
    prefixes of the capped decode."""
    from tsue_tpu.ops.sampling import SamplingConfig
    p = _tiny_llm_predictor()
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    greedy = SamplingConfig(do_sample=False)
    full = p.generate_context(tracks, max_new_tokens=6, compile_cap=6,
                              sampling=greedy)
    for mnt in (1, 3, 6):
        out = p.generate_context(tracks, max_new_tokens=mnt, compile_cap=6,
                                 sampling=greedy)
        for r, f in zip(out, full):
            assert f["context"].startswith(r["context"])
    assert len(p._generators) == 1
    # batched path: one batcher per cap, not per requested value
    for mnt in (2, 4, 5):
        out_b = p.generate_context_batched(tracks, max_new_tokens=mnt,
                                           compile_cap=6, num_slots=2,
                                           chunk=2)
        assert len(out_b) == 2
    assert len(p._batchers) == 1


def test_prepare_generation_precompiles():
    """prepare_generation at startup compiles the same cache entry a real
    request uses (the HTTP server's 'compiled once at startup' contract)."""
    p = _tiny_llm_predictor()
    p.prepare_generation(max_new_tokens=4)
    assert len(p._generators) == 1
    gen = p._generators[next(iter(p._generators))]
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    p.generate_context(tracks, max_new_tokens=4)
    assert len(p._generators) == 1
    assert p._generators[next(iter(p._generators))] is gen
    p.prepare_generation(max_new_tokens=4, batched=True)
    assert len(p._batchers) == 1


def test_prompt_bucketing_output_neutral_and_cached_per_bucket():
    """DataConfig.length_buckets on the serve path: prompts are trimmed
    to the smallest covering bucket (only all-pad tail positions drop),
    the generated text is IDENTICAL to the unbucketed predictor's, and
    the compiled program is keyed by the bucket width."""
    import dataclasses
    p = _tiny_llm_predictor(max_length=640)   # preset default buckets
    assert p.cfg.data.length_buckets == (256, 384, 512)
    cfg_off = dataclasses.replace(
        p.cfg, data=dataclasses.replace(p.cfg.data, length_buckets=()))
    p_off = Predictor(cfg_off, p.params, batch_size=2)
    tracks = make_synthetic_tracks(num_tracks=3, track_len=300, seed=9)
    out = p.generate_context(tracks, max_new_tokens=5)
    ref = p_off.generate_context(tracks, max_new_tokens=5)
    assert [r["context"] for r in out] == [r["context"] for r in ref]
    # the byte-tokenized prompt (~435 tokens) picks the 512 bucket
    widths = {k[-1] for k in p._generators}
    assert widths == {512}
    assert {k[-1] for k in p_off._generators} == {640}
    # batched path buckets identically and matches too
    out_b = p.generate_context_batched(tracks, max_new_tokens=5,
                                       num_slots=2, chunk=2)
    ref_b = p_off.generate_context_batched(tracks, max_new_tokens=5,
                                           num_slots=2, chunk=2)
    assert [r["context"] for r in out_b] == [r["context"] for r in ref_b]
    assert {k[1] for k in p._batchers} == {512}


def test_prepare_generation_covers_every_bucket():
    """With buckets configured, startup precompiles one program per
    serving width so no request bucket can compile under the lock."""
    p = _tiny_llm_predictor(max_length=640)
    p.prepare_generation(max_new_tokens=4)
    widths = {k[-1] for k in p._generators}
    assert widths == {256, 384, 512, 640}
    assert len(p._generators) <= p._cache_max


def test_compile_cap_overrun_raises():
    """max_new_tokens above an explicit compile_cap fails loudly instead
    of silently growing the cap into an in-request XLA compile."""
    import pytest as _pytest
    p = _tiny_llm_predictor()
    tracks = make_synthetic_tracks(num_tracks=1, track_len=300, seed=9)
    with _pytest.raises(ValueError, match="exceeds"):
        p.generate_context(tracks, max_new_tokens=8, compile_cap=4)
    with _pytest.raises(ValueError, match="exceeds"):
        p.generate_context_batched(tracks, max_new_tokens=8, compile_cap=4)


def test_generate_context_batched_speculative_matches_plain():
    """speculative=True through the continuous batcher returns exactly
    the plain batcher's text (window mode is a scheduling change) for
    greedy AND sampled configs."""
    from tsue_tpu.ops.sampling import SamplingConfig
    p = _tiny_llm_predictor()
    tracks = make_synthetic_tracks(num_tracks=3, track_len=300, seed=9)
    rng = jax.random.key(5)
    for sampling in (None, SamplingConfig(temperature=0.9, top_k=8,
                                          top_p=0.9)):
        plain = p.generate_context_batched(
            tracks, max_new_tokens=5, rng=rng, num_slots=2, chunk=2,
            sampling=sampling)
        spec = p.generate_context_batched(
            tracks, max_new_tokens=5, rng=rng, num_slots=2, chunk=2,
            sampling=sampling, speculative=True, spec_window=3)
        assert [r["context"] for r in spec] == \
            [r["context"] for r in plain]


def test_fused_head_predictor_matches_plain():
    """Predictor(fused_head=True) serves generate_context through the
    fused LM-head kernel and reproduces the plain predictor's text on
    CPU (f32 formulations agree at the tiny dims); composes with
    quantize_decode."""
    p_plain = _tiny_llm_predictor()
    p_fused = Predictor(p_plain.cfg, p_plain.params, batch_size=2,
                        fused_head=True)
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    a = p_plain.generate_context(tracks, max_new_tokens=5)
    b = p_fused.generate_context(tracks, max_new_tokens=5)
    assert [r["context"] for r in a] == [r["context"] for r in b]
    p_q = Predictor(p_plain.cfg, p_plain.params, batch_size=2,
                    fused_head=True, quantize_decode=True)
    c = p_q.generate_context(tracks, max_new_tokens=5)
    assert len(c) == 2 and all(isinstance(r["context"], str) for r in c)


def test_quantize_kv_predictor_all_paths():
    """quantize_kv=True serves every generation path (static,
    speculative, batched) with int8 caches; static speculative greedy
    stays exactly the static plain greedy (both over the same int8
    cache), and all three compose with quantize_decode."""
    import dataclasses
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data.tokenizer import ByteTokenizer
    from tsue_tpu.ops.sampling import SamplingConfig
    tok = ByteTokenizer()
    cfg = dataclasses.replace(
        CFG,
        data=DataConfig(seq_len=6, out_len=6, max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=2)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    p = Predictor(cfg, vs["params"], batch_size=2, quantize_kv=True,
                  quantize_decode=True)
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    greedy = SamplingConfig(do_sample=False)
    plain = p.generate_context(tracks, max_new_tokens=6, sampling=greedy)
    assert len(plain) == 2
    assert all(isinstance(r["context"], str) for r in plain)
    spec = p.generate_context(tracks, max_new_tokens=6, speculative=True)
    assert [r["context"] for r in spec] == [r["context"] for r in plain]
    batched = p.generate_context_batched(tracks, max_new_tokens=6,
                                         sampling=greedy)
    assert len(batched) == 2
    assert all(isinstance(r["context"], str) for r in batched)
