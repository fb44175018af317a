"""Mesh-aware Predictor serving (serve.py + parallel/serve_tp.py): the
production request path (track ingest -> prompt building -> bucketing ->
chunked decode) running over a sharded mesh, pinned against the
single-chip Predictor on the 8-device virtual CPU mesh."""
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import (DataConfig, ExperimentConfig, LaneEncoderConfig,
                             LlamaConfig, LTSFConfig, ModelConfig,
                             QFormerConfig, TrainConfig)
from tsue_tpu.data import make_synthetic_tracks
from tsue_tpu.data.tokenizer import ByteTokenizer
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.parallel.mesh import make_mesh
from tsue_tpu.serve import Predictor


@pytest.fixture(scope="module")
def llm_setup():
    import jax
    tok = ByteTokenizer()
    cfg = ExperimentConfig(
        name="serve-mesh",
        data=DataConfig(seq_len=6, out_len=6, max_length=640),
        model=ModelConfig(
            llama=LlamaConfig.tiny(tok.vocab_size),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
        train=TrainConfig(batch_size=8))
    model = TrajectoryModel(cfg.model, 6, 6)
    dummy = Predictor(cfg, None, batch_size=2)._dummy_batch()
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, dummy, False)
    tracks = make_synthetic_tracks(num_tracks=2, track_len=300, seed=9)
    ref = Predictor(cfg, vs["params"], batch_size=8).generate_context(
        tracks, max_new_tokens=6)
    return cfg, vs["params"], tracks, ref


def test_pure_dp_matches_single_chip(llm_setup):
    """mesh with model_parallel=1: every request row decodes whole on
    one device — the served text is the single-chip Predictor's,
    through the full ingest/bucket/chunk request path."""
    cfg, params, tracks, ref = llm_setup
    p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(1))
    out = p.generate_context(tracks, max_new_tokens=6)
    assert out == ref


def test_tp_int8_serves_and_shards(llm_setup):
    """model_parallel=2 + quantize_decode: text comes back for every
    track and the placed tree holds model-axis-sharded int8 tables."""
    cfg, params, tracks, ref = llm_setup
    p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(2),
                  quantize_decode=True)
    out = p.generate_context(tracks, max_new_tokens=6)
    assert len(out) == len(ref)
    assert all(isinstance(r["context"], str) for r in out)
    w8 = p._svars["quant"]["llama"]["model"]["layer_0"]["attn"][
        "q_proj"]["w8"]
    assert w8.dtype == jnp.int8
    assert w8.sharding.spec[1] == "model"


def test_weight_placement_reused_across_programs(llm_setup):
    """A second (cap, bucket) program reuses the first build's sharded
    tree — the placement (and any quantization) happens once per
    server, not once per compiled program."""
    cfg, params, tracks, _ = llm_setup
    p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(1))
    p.generate_context(tracks, max_new_tokens=4)
    first = p._svars
    assert first is not None
    p.generate_context(tracks, max_new_tokens=6)   # new cap, new program
    emb0 = first["params"]["llama"]["model"]["embed_tokens"]["embedding"]
    emb1 = p._svars["params"]["llama"]["model"]["embed_tokens"]["embedding"]
    assert emb1 is emb0                            # same placed leaf


def test_incompatible_modes_fail_loudly(llm_setup):
    """Misconfigurations are rejected with ValueError, never silently
    served unsharded (the CLI mirrors these at startup)."""
    cfg, params, tracks, _ = llm_setup
    with pytest.raises(ValueError, match="divide"):
        Predictor(cfg, params, batch_size=3, mesh=make_mesh(2))
    with pytest.raises(ValueError, match="requires a mesh"):
        Predictor(cfg, params, batch_size=8, fsdp=True)


def test_fused_head_composes_with_mesh(llm_setup):
    """fused_head under a pure-DP mesh serves the single-chip fused
    predictor's text (r5: the LM-head+top-k kernel shards over batch via
    its custom_partitioning registration, ops/lmhead_topk.py — no v1
    rejection anymore)."""
    cfg, params, tracks, _ = llm_setup
    ref = Predictor(cfg, params, batch_size=8,
                    fused_head=True).generate_context(
        tracks, max_new_tokens=6)
    p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(1),
                  fused_head=True)
    out = p.generate_context(tracks, max_new_tokens=6)
    assert out == ref


def test_batched_generation_composes_with_mesh(llm_setup):
    """generate_context_batched under a pure-DP mesh serves the
    single-chip batcher's text (pool state sharded over data; the
    per-request chain keys make output scheduling-independent)."""
    cfg, params, tracks, _ = llm_setup
    ref = Predictor(cfg, params, batch_size=8).generate_context_batched(
        tracks, max_new_tokens=6)
    p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(1))
    out = p.generate_context_batched(tracks, max_new_tokens=6)
    assert out == ref


def test_predict_runs_sharded(llm_setup):
    """predict (and the K-candidate rollout) run over the mesh too:
    pure-DP output equals the single-chip predictor's (row-local math),
    and the placed tree engages the data axis."""
    cfg, params, tracks, _ = llm_setup
    ref_p = Predictor(cfg, params, batch_size=8, num_candidates=2)
    mesh_p = Predictor(cfg, params, batch_size=8, num_candidates=2,
                       mesh=make_mesh(1))
    ref = ref_p.predict(tracks)
    out = mesh_p.predict(tracks)
    assert len(out) == len(ref) > 0
    for a, b in zip(out, ref):
        assert a["track_id"] == b["track_id"]
        np.testing.assert_allclose(a["pred_pixel_xy"], b["pred_pixel_xy"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(a["candidates_pixel_xy"],
                                   b["candidates_pixel_xy"],
                                   rtol=1e-6, atol=1e-6)
    # TP=2: weights actually split, predictions stay close (psum order)
    tp_p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(2))
    q = tp_p._predict_params()["mllm"]["llama"]["model"]["layer_0"][
        "attn"]["q_proj"]["kernel"]
    assert any(ax == "model" for ax in q.sharding.spec if ax is not None)
    out_tp = tp_p.predict(tracks)
    for a, b in zip(out_tp, ref):
        np.testing.assert_allclose(a["pred_pixel_xy"], b["pred_pixel_xy"],
                                   rtol=1e-3, atol=1e-3)


def test_speculative_composes_with_mesh(llm_setup):
    """speculative=True under a pure-DP mesh serves the single-chip
    speculative decode's text (the while_loop body is plain XLA —
    GSPMD partitions it like the token-at-a-time scan)."""
    cfg, params, tracks, _ = llm_setup
    ref = Predictor(cfg, params, batch_size=8).generate_context(
        tracks, max_new_tokens=6, speculative=True)
    p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(1))
    out = p.generate_context(tracks, max_new_tokens=6, speculative=True)
    assert out == ref


def test_quantize_kv_composes_with_mesh(llm_setup):
    """quantize_kv=True under a pure-DP mesh serves the single-chip
    int8-KV decode's text (the default dequant-fused attention is plain
    XLA; the cache's int8/scale arrays shard over data)."""
    cfg, params, tracks, _ = llm_setup
    ref = Predictor(cfg, params, batch_size=8,
                    quantize_kv=True).generate_context(
        tracks, max_new_tokens=6)
    p = Predictor(cfg, params, batch_size=8, mesh=make_mesh(1),
                  quantize_kv=True)
    out = p.generate_context(tracks, max_new_tokens=6)
    assert out == ref
