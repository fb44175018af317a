"""Multi-chip sharded generation (parallel/serve_tp.py) on the 8-device
virtual CPU mesh: pure-DP bitwise parity, TP token agreement, FSDP
smoke, and the batch-divisibility contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.ops.sampling import SamplingConfig
from tsue_tpu.parallel.mesh import make_mesh
from tsue_tpu.parallel.serve_tp import make_sharded_generate_fn

MAX_NEW = 6


@pytest.fixture(scope="module")
def tiny_gen_setup():
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.models.fusion import MultiModalLLM
    llama = LlamaConfig.tiny()
    qf = QFormerConfig(vision_dim=32, hidden_size=32, num_heads=2,
                       num_encoder_layers=1, num_decoder_layers=1,
                       num_query_tokens=4, dropout=0.0)
    mllm = MultiModalLLM(llama=llama, qformer=qf, use_vision=True)
    B, T = 8, 16
    vision = jax.random.normal(jax.random.key(5), (B, 8, 32))
    ids = jax.random.randint(jax.random.key(6), (B, T), 3, 380)
    mask = jnp.ones((B, T), jnp.int32)
    variables = mllm.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          vision, ids, mask, False)
    cfg = SamplingConfig(do_sample=False)
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, T, eos_id=383, pad_id=0)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(9)))
    return mllm, variables, cfg, vision, ids, mask, ref


def test_pure_dp_bitwise_matches_single_device(tiny_gen_setup):
    """model_parallel=1: every batch row is computed whole on one device
    — the sharded program is the single-device math, bitwise."""
    mllm, variables, cfg, vision, ids, mask, ref = tiny_gen_setup
    mesh = make_mesh(model_parallel=1)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    np.testing.assert_array_equal(out, ref)


def test_tp_agrees_with_single_device(tiny_gen_setup):
    """model_parallel=2 splits contractions (psum partial-sum order
    differs), so greedy tokens agree except where the single-device
    chain was within reduction tolerance of a tie."""
    mllm, variables, cfg, vision, ids, mask, ref = tiny_gen_setup
    mesh = make_mesh(model_parallel=2)
    gen, svars = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                          ids.shape[1], eos_id=383,
                                          mesh=mesh)
    # the placement actually sharded something on the model axis
    q_kernel = svars["params"]["llama"]["model"]["layer_0"]["attn"][
        "q_proj"]["kernel"]
    assert any(ax == "model" for ax in q_kernel.sharding.spec
               if ax is not None)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    assert out.shape == ref.shape
    assert (out == ref).mean() >= 0.9


def test_fsdp_dp_smoke_bitwise(tiny_gen_setup):
    """fsdp=True (ZeRO weight sharding over data) changes placement, not
    math: pure-DP + fsdp stays bitwise."""
    mllm, variables, cfg, vision, ids, mask, ref = tiny_gen_setup
    mesh = make_mesh(model_parallel=1)
    gen, svars = make_sharded_generate_fn(
        mllm, variables, cfg, MAX_NEW, ids.shape[1], eos_id=383,
        mesh=mesh, fsdp=True, fsdp_min_size=0)
    emb = svars["params"]["llama"]["model"]["embed_tokens"]["embedding"]
    assert any(ax == "data" for ax in emb.sharding.spec if ax is not None)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    np.testing.assert_array_equal(out, ref)


def test_batch_must_divide_data_axis(tiny_gen_setup):
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    mesh = make_mesh(model_parallel=1)        # data axis = 8
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh)
    with pytest.raises(ValueError, match="divide"):
        gen(vision[:3], ids[:3], mask[:3], jax.random.key(9))


def test_int8_pure_dp_bitwise(tiny_gen_setup):
    """quantize_decode under pure DP == the single-device int8 decode,
    bitwise: quantization happens before placement (identical scales)
    and at tiny dims both paths take the same XLA dequant-fused dot."""
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.ops.quant import with_quantized_decode
    qvars = with_quantized_decode(variables)
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, ids.shape[1],
                               eos_id=383, pad_id=0)
    ref = np.asarray(ref_gen(qvars, vision, ids, mask, jax.random.key(9)))
    mesh = make_mesh(model_parallel=1)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh,
                                      quantize_decode=True)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    np.testing.assert_array_equal(out, ref)


def test_int8_tp_agrees_and_quant_tables_shard(tiny_gen_setup):
    """model_parallel=2 with quantize_decode: every w8 shards like its
    bf16 kernel twin, the per-output scale rides the output split, and
    greedy decode agrees with single-device int8 up to psum tie flips."""
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.generation import make_generate_fn
    from tsue_tpu.ops.quant import with_quantized_decode
    qvars = with_quantized_decode(variables)
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, ids.shape[1],
                               eos_id=383, pad_id=0)
    ref = np.asarray(ref_gen(qvars, vision, ids, mask, jax.random.key(9)))
    mesh = make_mesh(model_parallel=2)
    gen, svars = make_sharded_generate_fn(
        mllm, variables, cfg, MAX_NEW, ids.shape[1], eos_id=383,
        mesh=mesh, quantize_decode=True)
    layer = svars["quant"]["llama"]["model"]["layer_0"]
    assert layer["attn"]["q_proj"]["w8"].sharding.spec[1] == "model"
    assert layer["attn"]["q_proj"]["scale"].sharding.spec[0] == "model"
    assert layer["attn"]["o_proj"]["w8"].sharding.spec[0] == "model"
    assert layer["mlp"]["down_proj"]["w8"].sharding.spec[0] == "model"
    head_w8 = svars["quant"]["llama"]["lm_head_w8"]
    assert head_w8.sharding.spec[0] == "model"
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    assert out.shape == ref.shape
    assert (out == ref).mean() >= 0.9


def test_speculative_pure_dp_bitwise(tiny_gen_setup):
    """speculative=True under pure DP == the single-device speculative
    decode, bitwise (the window while_loop is plain XLA under GSPMD)."""
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.speculative import make_speculative_generate_fn
    ref_gen = make_speculative_generate_fn(mllm, cfg, MAX_NEW,
                                           ids.shape[1], eos_id=383,
                                           pad_id=0)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(9)))
    mesh = make_mesh(model_parallel=1)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh,
                                      speculative=True)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    np.testing.assert_array_equal(out, ref)


def test_speculative_tp_agrees(tiny_gen_setup):
    """speculative=True under TP=2 (+int8): the window forward's
    contractions split like the plain decode's — same psum tie caveat,
    same >=0.9 agreement bar vs the single-device int8 SPECULATIVE
    decode (the right arm: quantization error must hit both sides)."""
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.speculative import make_speculative_generate_fn
    from tsue_tpu.ops.quant import with_quantized_decode
    qvars = with_quantized_decode(variables)
    ref_gen = make_speculative_generate_fn(mllm, cfg, MAX_NEW,
                                           ids.shape[1], eos_id=383,
                                           pad_id=0)
    ref = np.asarray(ref_gen(qvars, vision, ids, mask,
                             jax.random.key(9)))
    mesh = make_mesh(model_parallel=2)
    gen, _ = make_sharded_generate_fn(
        mllm, variables, cfg, MAX_NEW, ids.shape[1], eos_id=383,
        mesh=mesh, speculative=True, quantize_decode=True)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    assert out.shape == ref.shape
    assert (out == ref).mean() >= 0.9


def test_pallas_prefill_partitions_in_generate(tiny_gen_setup):
    """The sharded generator no longer pins XLA attention: forcing the
    Pallas impl (interpreted on CPU), the flash prefill partitions via
    its custom_partitioning rules and the TP=2 decode still agrees with
    the single-device chain."""
    from tsue_tpu.ops.attention import attention_impl
    mllm, variables, cfg, vision, ids, mask, ref = tiny_gen_setup
    mesh = make_mesh(model_parallel=2)
    with attention_impl("pallas"):
        gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                          ids.shape[1], eos_id=383,
                                          mesh=mesh)
        out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    assert out.shape == ref.shape
    assert (out == ref).mean() >= 0.9


def test_quantize_kv_pure_dp_bitwise(tiny_gen_setup):
    """quantize_kv=True under pure DP == the single-device int8-KV
    decode, bitwise (the XLA dequant-fused attention partitions; the
    cache's int8/scale arrays ride the data axis)."""
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.generation import make_generate_fn
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, ids.shape[1],
                               eos_id=383, pad_id=0, quantize_kv=True)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(9)))
    mesh = make_mesh(model_parallel=1)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh,
                                      quantize_kv=True)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    np.testing.assert_array_equal(out, ref)


def test_fused_head_pure_dp_bitwise(tiny_gen_setup):
    """fused_head=True under pure DP == the single-device fused decode,
    bitwise (r5: the LM-head+top-k kernel shards over batch via
    ops/lmhead_topk.py ``_partitioned_lmhead_topk`` — serve_tp no longer
    rejects it)."""
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.generation import make_generate_fn
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, ids.shape[1],
                               eos_id=383, pad_id=0, fused_head=True)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(9)))
    mesh = make_mesh(model_parallel=1)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh,
                                      fused_head=True)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    np.testing.assert_array_equal(out, ref)


def test_fused_head_sampled_dp_bitwise(tiny_gen_setup):
    """The sampled fused-head chain (slice-space slot sampler) under
    pure DP is bitwise too — keys replicate, every row draws as on one
    chip."""
    mllm, variables, _, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.generation import make_generate_fn
    cfg = SamplingConfig()                     # sampled production chain
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, ids.shape[1],
                               eos_id=383, pad_id=0, fused_head=True)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(13)))
    mesh = make_mesh(model_parallel=1)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh,
                                      fused_head=True)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(13)))
    np.testing.assert_array_equal(out, ref)


def test_fused_head_tp_agrees(tiny_gen_setup):
    """fused_head under TP=2: the kernel's partition rule keeps the head
    weight whole per shard (the partitioner gathers the feature-sharded
    embedding at the op boundary), so greedy decode agrees with the
    single-device fused chain up to psum tie flips."""
    mllm, variables, cfg, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.generation import make_generate_fn
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, ids.shape[1],
                               eos_id=383, pad_id=0, fused_head=True)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(9)))
    mesh = make_mesh(model_parallel=2)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh,
                                      fused_head=True)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(9)))
    assert out.shape == ref.shape
    assert (out == ref).mean() >= 0.9


def test_sampled_dp_bitwise(tiny_gen_setup):
    """The production sampled chain under pure DP is also bitwise (the
    per-step keys are replicated; each row draws identically)."""
    mllm, variables, _, vision, ids, mask, _ = tiny_gen_setup
    from tsue_tpu.eval.generation import make_generate_fn
    cfg = SamplingConfig()                     # sampled production chain
    ref_gen = make_generate_fn(mllm, cfg, MAX_NEW, ids.shape[1],
                               eos_id=383, pad_id=0)
    ref = np.asarray(ref_gen(variables, vision, ids, mask,
                             jax.random.key(11)))
    mesh = make_mesh(model_parallel=1)
    gen, _ = make_sharded_generate_fn(mllm, variables, cfg, MAX_NEW,
                                      ids.shape[1], eos_id=383, mesh=mesh)
    out = np.asarray(gen(vision, ids, mask, jax.random.key(11)))
    np.testing.assert_array_equal(out, ref)
