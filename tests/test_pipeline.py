"""Pipeline parallelism (parallel/pipeline.py): GPipe over the Llama stack.

Pins, on the 8-device virtual CPU mesh:
- split/join round-trips the MLLM param tree bitwise;
- the pipelined stage-1 LM loss equals the single-device
  ``MultiModalLLM.lm_loss`` (pp4 x dp2, microbatched) up to f32
  reduction order;
- one pipelined optimizer step produces the same parameters as the
  single-device stage-1 step (freeze semantics included: base llama
  frozen, LoRA + front-end trained);
- degenerate shapes (pipe=1, bubbles with n_micro > stages) still match.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import (ExperimentConfig, LlamaConfig, ModelConfig,
                             QFormerConfig, TrainConfig)
from tsue_tpu.models.fusion import MultiModalLLM
from tsue_tpu.parallel.pipeline import (join_llama_layers,
                                        make_pipeline_mesh,
                                        make_pipelined_lm_loss,
                                        make_pipelined_stage1_step,
                                        place_pipeline_params,
                                        split_llama_layers)

VOCAB = 64
PROMPT_LEN = 12
T_VIS = 4
B = 8


@pytest.fixture(scope="module")
def mllm_and_data():
    llama = dataclasses.replace(LlamaConfig.tiny(VOCAB), num_layers=4,
                                lora_dropout=0.0)
    qf = QFormerConfig(hidden_size=32, num_heads=2, num_encoder_layers=1,
                       num_decoder_layers=1, num_query_tokens=4,
                       dropout=0.0)
    mllm = MultiModalLLM(llama, qf)
    rng = np.random.default_rng(0)
    batch = {
        "vision": jnp.asarray(rng.standard_normal((B, T_VIS, 512)),
                              jnp.float32),
        "input_ids": jnp.asarray(rng.integers(3, VOCAB - 1, (B, PROMPT_LEN)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, PROMPT_LEN), jnp.int32),
    }
    labels = np.array(batch["input_ids"])
    labels[:, :3] = -100                    # prompt span masked
    batch["labels"] = jnp.asarray(labels, jnp.int32)
    variables = mllm.init({"params": jax.random.key(0)}, batch["vision"],
                          batch["input_ids"], batch["attention_mask"], True)
    return mllm, variables["params"], batch


def _reference_loss(mllm, params, batch):
    return float(mllm.apply(
        {"params": params}, batch["vision"], batch["input_ids"],
        batch["attention_mask"], batch["labels"], True,
        method=mllm.lm_loss))


def test_split_join_roundtrip(mllm_and_data):
    mllm, params, _ = mllm_and_data
    outer, layers = split_llama_layers(params, n_stages=4)
    assert not any(k.startswith("layer_")
                   for k in outer["llama"]["model"])
    back = join_llama_layers(outer, layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, back)


@pytest.mark.parametrize("pp,n_micro", [(4, 2), (4, 4), (2, 4), (1, 2)])
def test_pipelined_loss_matches_single_device(mllm_and_data, pp, n_micro):
    mllm, params, batch = mllm_and_data
    ref = _reference_loss(mllm, params, batch)
    mesh = make_pipeline_mesh(pp, jax.devices()[:2 * pp])
    pp_params = place_pipeline_params(
        dict(zip(("outer", "layers"), split_llama_layers(params, pp))),
        mesh)
    loss = make_pipelined_lm_loss(mllm, mesh, n_micro)
    got = float(jax.jit(loss)(pp_params, batch, jax.random.key(0)))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


def test_pipelined_loss_honors_loss_chunk(mllm_and_data):
    """cfg.loss_chunk routes the pipelined CE through the chunked
    (no dense (B,T,V) logits) path with identical value."""
    mllm, params, batch = mllm_and_data
    ref = _reference_loss(mllm, params, batch)
    llama = dataclasses.replace(mllm.llama, loss_chunk=5)
    mllm_c = MultiModalLLM(llama, mllm.qformer)
    mesh = make_pipeline_mesh(4)
    pp_params = place_pipeline_params(
        dict(zip(("outer", "layers"), split_llama_layers(params, 4))), mesh)
    loss = make_pipelined_lm_loss(mllm_c, mesh, num_microbatches=2)
    got = float(jax.jit(loss)(pp_params, batch, jax.random.key(0)))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


def test_pipelined_step_matches_single_device_step(mllm_and_data):
    """One full optimizer step: pp4 x dp2 pipelined == single device,
    including the stage-1 freeze regime (base llama moves nowhere,
    LoRA/front-end move identically)."""
    from tsue_tpu.train.stage1 import (make_stage1_optimizer,
                                       make_stage1_train_step)
    mllm, params, batch = mllm_and_data
    cfg = ExperimentConfig(
        name="pp", model=ModelConfig(llama=mllm.llama, qformer=mllm.qformer),
        train=TrainConfig(batch_size=B, lr=1e-2))

    tx = make_stage1_optimizer(cfg, params)
    step = jax.jit(make_stage1_train_step(mllm, tx))
    p_ref, _, m_ref = step(params, tx.init(params), batch,
                           jax.random.key(3))

    mesh = make_pipeline_mesh(4)
    pp_params = place_pipeline_params(
        dict(zip(("outer", "layers"), split_llama_layers(params, 4))), mesh)
    init, pstep, pev = make_pipelined_stage1_step(mllm, cfg, mesh,
                                                  num_microbatches=2,
                                                  pp_params=pp_params)
    opt_state = init(pp_params)
    pp_after, _, m_pp = pstep(pp_params, opt_state, batch, jax.random.key(3))
    # dropout is disabled in this fixture, so train-mode losses agree too
    np.testing.assert_allclose(float(m_pp["lm_loss"]),
                               float(m_ref["lm_loss"]), rtol=2e-5)
    joined = join_llama_layers(pp_after["outer"], pp_after["layers"])
    # tolerances: adamw's m/sqrt(v) normalization turns ulp-level gradient
    # reduction-order differences into ~1e-3-relative deviations on real
    # updates (rtol), and into pure-noise absolute values on
    # mathematically-zero-gradient leaves like attention key biases
    # (softmax is invariant to a constant key shift), where both arms
    # amplify f32 noise to ~1e-4 (atol; real updates are lr=1e-2 scale)
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=str(path)),
        joined, p_ref)
    # freeze semantics: base llama kernels did not move
    k0 = params["llama"]["model"]["layer_0"]["attn"]["q_proj"]["kernel"]
    k1 = joined["llama"]["model"]["layer_0"]["attn"]["q_proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    # ...and the trained leaves actually moved
    a0 = params["llama"]["model"]["layer_0"]["attn"]["q_proj"]["lora_a"]
    a1 = joined["llama"]["model"]["layer_0"]["attn"]["q_proj"]["lora_a"]
    assert np.abs(np.asarray(a0) - np.asarray(a1)).max() > 0


def test_pipelined_eval_step_deterministic(mllm_and_data):
    mllm, params, batch = mllm_and_data
    cfg = ExperimentConfig(
        name="pp", model=ModelConfig(llama=mllm.llama, qformer=mllm.qformer),
        train=TrainConfig(batch_size=B))
    mesh = make_pipeline_mesh(4)
    pp_params = place_pipeline_params(
        dict(zip(("outer", "layers"), split_llama_layers(params, 4))), mesh)
    _, _, pev = make_pipelined_stage1_step(mllm, cfg, mesh,
                                           num_microbatches=2,
                                           pp_params=pp_params)
    a = float(pev(pp_params, batch)["lm_loss"])
    b = float(pev(pp_params, batch)["lm_loss"])
    assert a == b
    np.testing.assert_allclose(a, _reference_loss(mllm, params, batch),
                               rtol=2e-5)


def test_run_stage1_pipelined_exports_standard_tree(tmp_path):
    """The stage-1 runner under mesh.pipeline_parallel=2: trains one epoch
    on the GPipe path, joins the layer stack back, and exports a
    standard-layout artifact that import_mllm-style consumers can read."""
    from tsue_tpu.config import MeshConfig, get_preset
    from tsue_tpu.runner import run_stage1
    from tsue_tpu.train.checkpoint import restore_pytree

    cfg = get_preset("train_18_30")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            llama=dataclasses.replace(LlamaConfig.tiny(), lora_dropout=0.0),
            qformer=QFormerConfig(num_encoder_layers=1, num_decoder_layers=1,
                                  num_query_tokens=4)),
        data=dataclasses.replace(cfg.data, max_length=64),
        train=dataclasses.replace(cfg.train, batch_size=8),
        mesh=MeshConfig(pipeline_parallel=2, microbatches=2))
    out = run_stage1(cfg, data_path=None, out_dir=str(tmp_path / "runs"),
                     epochs=1, export_path=str(tmp_path / "export"),
                     synthetic_tracks=6)
    assert np.isfinite(out["final_lm_loss"])
    restored = restore_pytree(str(tmp_path / "export"))
    model = restored["llama"]["model"]
    assert "layer_0" in model and "layer_1" in model
    assert not any(k in ("layers", "outer") for k in restored)


def test_bad_shapes_raise(mllm_and_data):
    mllm, params, _ = mllm_and_data
    with pytest.raises(ValueError, match="divide"):
        split_llama_layers(params, n_stages=3)
    mesh = make_pipeline_mesh(4)
    pp_params = place_pipeline_params(
        dict(zip(("outer", "layers"), split_llama_layers(params, 4))), mesh)
    loss = make_pipelined_lm_loss(mllm, mesh, num_microbatches=3)
    bad = {"vision": jnp.zeros((B, T_VIS, 512)),
           "input_ids": jnp.zeros((B, PROMPT_LEN), jnp.int32),
           "attention_mask": jnp.ones((B, PROMPT_LEN), jnp.int32),
           "labels": jnp.zeros((B, PROMPT_LEN), jnp.int32)}
    with pytest.raises(ValueError, match="divisible"):
        loss(pp_params, bad, jax.random.key(0))
