"""Int8 weight-only decode (ops/quant.py): kernel parity, quantization
error bounds, collection plumbing, and end-to-end decode equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.ops.quant import (int8_matmul, int8_matmul_ref,
                                quantize_llama_params, quantize_weight,
                                with_quantized_decode)


class TestQuantizeWeight:
    def test_roundtrip_error_bound(self):
        w = jax.random.normal(jax.random.key(0), (96, 160)) * 0.3
        w8, scale = quantize_weight(w, axis=0)
        assert w8.dtype == jnp.int8
        assert scale.shape == (160,)
        err = np.abs(np.asarray(w) - np.asarray(w8, np.float32)
                     * np.asarray(scale))
        # symmetric rounding: error <= scale/2 per element
        assert (err <= np.asarray(scale) / 2 + 1e-7).all()

    def test_per_row_axis(self):
        w = jax.random.normal(jax.random.key(1), (48, 64))
        w8, scale = quantize_weight(w, axis=1)
        assert scale.shape == (48,)
        err = np.abs(np.asarray(w) - np.asarray(w8, np.float32)
                     * np.asarray(scale)[:, None])
        assert (err <= np.asarray(scale)[:, None] / 2 + 1e-7).all()


class TestInt8Matmul:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_kernel_matches_ref(self, dtype):
        ks = jax.random.split(jax.random.key(2), 2)
        x = jax.random.normal(ks[0], (16, 256)).astype(dtype)
        w8, scale = quantize_weight(
            jax.random.normal(ks[1], (256, 384)) * 0.1, axis=0)
        out = int8_matmul(x, w8, scale, interpret=True)
        ref = int8_matmul_ref(x, w8, scale)
        assert out.dtype == ref.dtype
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-5, rtol=1e-5)

    def test_out_dtype_and_3d(self):
        ks = jax.random.split(jax.random.key(3), 2)
        x = jax.random.normal(ks[0], (8, 1, 128)).astype(jnp.bfloat16)
        w8, scale = quantize_weight(
            jax.random.normal(ks[1], (128, 128)), axis=0)
        out = int8_matmul(x, w8, scale, out_dtype=jnp.float32,
                          interpret=True)
        assert out.shape == (8, 1, 128) and out.dtype == jnp.float32

    def test_hostile_shapes_fall_back(self):
        """K or N not 128-multiples, or M > 128, use the XLA formulation
        with identical quantized numerics."""
        ks = jax.random.split(jax.random.key(4), 2)
        for xs, ws in [((4, 96), (96, 128)), ((200, 128), (128, 128))]:
            x = jax.random.normal(ks[0], xs)
            w8, scale = quantize_weight(jax.random.normal(ks[1], ws),
                                        axis=0)
            np.testing.assert_allclose(
                np.asarray(int8_matmul(x, w8, scale)),
                np.asarray(int8_matmul_ref(x, w8, scale)), atol=1e-6)


@pytest.fixture(scope="module")
def tiny_mllm():
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.models.fusion import MultiModalLLM
    llama = LlamaConfig.tiny()
    qf = QFormerConfig(vision_dim=32, hidden_size=32, num_heads=2,
                       num_encoder_layers=1, num_decoder_layers=1,
                       num_query_tokens=4, dropout=0.0)
    mllm = MultiModalLLM(llama=llama, qformer=qf, use_vision=True)
    B, T = 2, 24
    vision = jax.random.normal(jax.random.key(5), (B, 8, 32))
    ids = jax.random.randint(jax.random.key(6), (B, T), 3, 380)
    mask = jnp.ones((B, T), jnp.int32)
    variables = mllm.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          vision, ids, mask, False)
    return mllm, variables, vision, ids, mask


class TestQuantCollection:
    def test_structure_mirrors_projections(self, tiny_mllm):
        mllm, variables, *_ = tiny_mllm
        quant = quantize_llama_params(variables["params"])
        llayers = quant["llama"]["model"]
        for i in range(mllm.llama.num_layers):
            lq = llayers[f"layer_{i}"]
            for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
                assert lq["attn"][proj]["w8"].dtype == jnp.int8
            for proj in ("gate_proj", "up_proj", "down_proj"):
                assert lq["mlp"][proj]["w8"].dtype == jnp.int8
        # tied LM head lives at the LlamaForCausalLM scope, (D, V) layout
        D, V = mllm.llama.hidden_size, mllm.llama.vocab_size
        assert quant["llama"]["lm_head_w8"].shape == (D, V)
        assert quant["llama"]["lm_head_scale"].shape == (V,)
        # norms / qformer / embeddings stay bf16 (no quant entries), and
        # the MLLM's vision q_proj Dense (same name, different module)
        # must not get a dead int8 copy
        assert "input_norm" not in llayers["layer_0"]
        assert "qformer" not in quant
        assert "q_proj" not in quant

    def test_decode_logits_close_and_training_untouched(self, tiny_mllm):
        """Quantized decode-step logits track the bf16 logits within the
        int8 error budget; the training forward (quant_ok never set)
        ignores the collection entirely (bit-identical loss)."""
        mllm, variables, vision, ids, mask = tiny_mllm
        qvars = with_quantized_decode(variables)
        cache_len = ids.shape[1] + 8

        def first_logits(v):
            caches, last_hidden, prefix_len, fmask = mllm.apply(
                v, vision, ids, mask, cache_len, method=mllm.prefill)
            l0 = mllm.apply(
                v, last_hidden,
                method=lambda m, h: m.llama_mod.logits_from_hidden(
                    h, quant_ok=True))
            tok = jnp.argmax(l0, axis=-1).astype(jnp.int32)
            l1, _ = mllm.apply(v, tok, 0, prefix_len, caches, fmask,
                               cache_len, method=mllm.decode_step)
            return l0, l1

        l0, l1 = first_logits(variables)
        q0, q1 = first_logits(qvars)
        for a, b in ((l0, q0), (l1, q1)):
            diff = np.abs(np.asarray(a) - np.asarray(b)).max()
            spread = np.asarray(a).std()
            # lower bound pins ENGAGEMENT: int8 logits must actually
            # differ from the bf16 path (a dead quant path would give 0)
            assert 0 < diff < 0.25 * spread, (diff, spread)

        labels = jnp.where(ids > 50, ids, -100)
        loss = mllm.apply(variables, vision, ids, mask, labels,
                          method=mllm.lm_loss)
        qloss = mllm.apply(qvars, vision, ids, mask, labels,
                           method=mllm.lm_loss)
        assert float(loss) == float(qloss)

    def test_generation_runs_quantized(self, tiny_mllm):
        from tsue_tpu.eval.generation import make_generate_fn
        from tsue_tpu.ops.sampling import SamplingConfig
        mllm, variables, vision, ids, mask = tiny_mllm
        qvars = with_quantized_decode(variables)
        gen = make_generate_fn(mllm, SamplingConfig(), max_new_tokens=6,
                               prompt_len=ids.shape[1], eos_id=2)
        out = np.asarray(gen(qvars, vision, ids, mask, jax.random.key(7)))
        assert out.shape == (2, 6)
        assert out.dtype == np.int32
        assert (out >= 0).all() and (out < mllm.llama.vocab_size).all()


class TestGSPMDPartitioning:
    """The int8 VMEM-dequant kernel registers custom_partitioning rules
    (ops/quant.py _partitioned_int8_matmul): rows (decode batch) and
    output channels (Megatron column-parallel) shard freely, the
    contraction replicates — multi-chip serve paths keep the kernel
    instead of pinning the XLA formulation (serve_tp.py, r5)."""

    def _mesh(self, dp, tp):
        from jax.sharding import Mesh
        return Mesh(np.asarray(jax.devices()).reshape(dp, tp),
                    ("data", "model"))

    def test_sharded_matches_ref_no_allgather(self):
        import re
        from jax.sharding import NamedSharding, PartitionSpec as P
        ks = jax.random.split(jax.random.key(21), 2)
        x = jax.random.normal(ks[0], (16, 256)).astype(jnp.bfloat16)
        w8, scale = quantize_weight(
            jax.random.normal(ks[1], (256, 512)) * 0.1, axis=0)
        ref = int8_matmul(x, w8, scale, interpret=True)
        mesh = self._mesh(4, 2)
        f = jax.jit(lambda a, b, c: int8_matmul(a, b, c, interpret=True))
        args = (jax.device_put(x, NamedSharding(mesh, P("data", None))),
                jax.device_put(w8, NamedSharding(mesh, P(None, "model"))),
                jax.device_put(scale, NamedSharding(mesh, P("model"))))
        out = f(*args)
        assert out.sharding.spec == ("data", "model")
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-5, rtol=1e-5)
        hlo = f.lower(*args).compile().as_text()
        assert not re.findall(r"all-gather", hlo), \
            "int8 matmul operands were gathered — partition rules lost"

    def test_untileable_column_split_falls_back(self):
        """model axis (4) leaving a non-128-multiple per-shard width: the
        sanitizer replicates n (the partitioner reshards) — correct
        output, just not column-parallel."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        ks = jax.random.split(jax.random.key(22), 2)
        x = jax.random.normal(ks[0], (8, 128)).astype(jnp.bfloat16)
        w8, scale = quantize_weight(
            jax.random.normal(ks[1], (128, 384)) * 0.1, axis=0)
        ref = int8_matmul(x, w8, scale, interpret=True)
        mesh = self._mesh(2, 4)                   # 384/4 = 96, not %128
        f = jax.jit(lambda a, b, c: int8_matmul(a, b, c, interpret=True))
        out = f(jax.device_put(x, NamedSharding(mesh, P("data", None))),
                jax.device_put(w8, NamedSharding(mesh, P(None, "model"))),
                jax.device_put(scale, NamedSharding(mesh, P("model"))))
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-5, rtol=1e-5)
