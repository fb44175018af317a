"""Int8 KV cache (ops/kv_quant.py): quantization bounds, write-path
equivalence, kernel parity, and end-to-end decode engagement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.ops.kv_quant import (attend_int8_kv, dequantize_kv,
                                   quantize_cache, quantize_kv,
                                   update_kv_int8, _attend_int8_impl,
                                   _mask3)


class TestQuantizeKV:
    def test_roundtrip_error_bound(self):
        x = jax.random.normal(jax.random.key(0), (2, 10, 3, 16)) * 0.7
        x8, s = quantize_kv(x)
        assert x8.dtype == jnp.int8 and s.shape == (2, 10, 3)
        err = np.abs(np.asarray(x) - np.asarray(dequantize_kv(
            x8, s, jnp.float32)))
        assert (err <= np.asarray(s)[..., None] / 2 + 1e-7).all()

    def test_quantize_cache_structure(self):
        k = jax.random.normal(jax.random.key(1), (2, 8, 2, 16))
        v = jax.random.normal(jax.random.key(2), (2, 8, 2, 16))
        out = quantize_cache([(k, v), (v, k)])
        assert len(out) == 2 and len(out[0]) == 4
        k8, ks, v8, vs = out[0]
        assert k8.shape == k.shape and ks.shape == (2, 8, 2)


class TestUpdateKVInt8:
    def _empty(self, B, S, H, D):
        z8 = jnp.zeros((B, S, H, D), jnp.int8)
        zs = jnp.zeros((B, S, H), jnp.float32)
        return (z8, zs, z8, zs)

    def test_scalar_index_write_matches_direct_quant(self):
        B, S, H, D = 2, 12, 2, 16
        k = jax.random.normal(jax.random.key(3), (B, 3, H, D))
        v = jax.random.normal(jax.random.key(4), (B, 3, H, D))
        cache = update_kv_int8(self._empty(B, S, H, D), k, v, 5)
        k8, ks, v8, vs = cache
        k8d, ksd = quantize_kv(k)
        np.testing.assert_array_equal(np.asarray(k8[:, 5:8]),
                                      np.asarray(k8d))
        np.testing.assert_allclose(np.asarray(ks[:, 5:8]), np.asarray(ksd))
        assert not np.asarray(k8[:, :5]).any()
        assert not np.asarray(k8[:, 8:]).any()

    def test_per_row_window_write(self):
        B, S, H, D, W = 3, 16, 2, 16, 2
        k = jax.random.normal(jax.random.key(5), (B, W, H, D))
        v = jax.random.normal(jax.random.key(6), (B, W, H, D))
        slots = jnp.array([0, 4, 9])
        cache = update_kv_int8(self._empty(B, S, H, D), k, v, slots)
        k8, ks, _, _ = cache
        k8d, ksd = quantize_kv(k)
        for b, s0 in enumerate([0, 4, 9]):
            np.testing.assert_array_equal(
                np.asarray(k8[b, s0:s0 + W]), np.asarray(k8d[b]))
            np.testing.assert_allclose(
                np.asarray(ks[b, s0:s0 + W]), np.asarray(ksd[b]))


class TestAttendKernelParity:
    """Interpret-mode Pallas kernel vs the XLA-dequant reference at
    Llama-like head dims (G*D = 128-multiple engages the kernel path)."""

    def _cache(self, B, S, Hkv, D, key):
        ks = jax.random.split(key, 2)
        k = jax.random.normal(ks[0], (B, S, Hkv, D), jnp.float32) * 0.5
        v = jax.random.normal(ks[1], (B, S, Hkv, D), jnp.float32) * 0.5
        return quantize_cache([(k, v)])[0]

    @pytest.mark.parametrize("Tq", [1, 4])
    def test_kernel_matches_xla_dequant(self, Tq):
        B, S, Hkv, D, Hq = 3, 40, 8, 64, 16
        cache = self._cache(B, S, Hkv, D, jax.random.key(7))
        q = jax.random.normal(jax.random.key(8), (B, Tq, Hq, D),
                              jnp.float32)
        mask = (jax.random.uniform(jax.random.key(9), (B, S)) > 0.3)
        mask = mask.at[:, :Tq + 1].set(True)   # keep >=1 valid key per q
        if Tq > 1:
            m4 = jnp.broadcast_to(mask[:, None, None, :], (B, 1, Tq, S))
            mask_in = m4
        else:
            mask_in = mask
        out_kernel = _attend_int8_impl(
            q, *cache, _mask3(mask_in, B, Tq, S), D ** -0.5,
            interpret=True)
        from tsue_tpu.ops.attention import _xla_attention
        kd = dequantize_kv(cache[0], cache[1], jnp.float32)
        vd = dequantize_kv(cache[2], cache[3], jnp.float32)
        out_ref = _xla_attention(q, kd, vd, mask_in, False, D ** -0.5)
        np.testing.assert_allclose(np.asarray(out_kernel),
                                   np.asarray(out_ref),
                                   atol=2e-5, rtol=2e-5)

    def test_dispatch_uses_kernel_for_qualifying_heads(self):
        """Under kv_attn_impl("kernel"), attend_int8_kv picks the kernel
        path when the group lanes tile (on CPU it runs interpreted with
        identical math) and matches the default XLA formulation."""
        from tsue_tpu.ops.kv_quant import kv_attn_impl
        B, S, Hkv, D, Hq = 2, 24, 8, 64, 16
        cache = self._cache(B, S, Hkv, D, jax.random.key(10))
        q = jax.random.normal(jax.random.key(11), (B, 1, Hq, D))
        mask = jnp.ones((B, S), bool)
        with kv_attn_impl("kernel"):
            out = attend_int8_kv(q, cache, mask)
        from tsue_tpu.ops.attention import _xla_attention
        kd = dequantize_kv(cache[0], cache[1], q.dtype)
        vd = dequantize_kv(cache[2], cache[3], q.dtype)
        ref = _xla_attention(q, kd, vd, mask, False, D ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


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


class TestEndToEnd:
    def test_decode_logits_close_and_engaged(self, tiny_mllm):
        """One decode step over a quantized cache tracks the bf16-cache
        logits within the int8 budget — and actually differs (a dead
        int8 path would give exactly 0)."""
        mllm, variables, vision, ids, mask = tiny_mllm
        cache_len = ids.shape[1] + 8

        def step_logits(quant_cache):
            caches, last_hidden, prefix_len, fmask = mllm.apply(
                variables, vision, ids, mask, cache_len,
                method=mllm.prefill)
            if quant_cache:
                caches = quantize_cache(caches)
            l0 = mllm.apply(
                variables, last_hidden,
                method=lambda m, h: m.llama_mod.logits_from_hidden(h))
            tok = jnp.argmax(l0, axis=-1).astype(jnp.int32)
            l1, caches2 = mllm.apply(variables, tok, 0, prefix_len,
                                     caches, fmask, cache_len,
                                     method=mllm.decode_step)
            return l1, caches2

        l1, _ = step_logits(False)
        q1, qcaches = step_logits(True)
        diff = np.abs(np.asarray(l1) - np.asarray(q1)).max()
        spread = np.asarray(l1).std()
        assert 0 < diff < 0.25 * spread, (diff, spread)
        # the new cache stays int8 (writes quantize on the way in)
        assert qcaches[0][0].dtype == jnp.int8
        assert len(qcaches[0]) == 4

    def test_generation_runs_and_speculative_matches_plain(self, tiny_mllm):
        """quantize_kv generation produces valid tokens, and greedy
        speculative decoding over the int8 cache commits exactly the
        plain int8-cache greedy outputs (the spec invariant holds
        because window and step writes quantize identically)."""
        from tsue_tpu.eval.generation import make_generate_fn
        from tsue_tpu.eval.speculative import make_speculative_generate_fn
        from tsue_tpu.ops.sampling import SamplingConfig
        mllm, variables, vision, ids, mask = tiny_mllm
        cfg = SamplingConfig(do_sample=False)
        gen = make_generate_fn(mllm, cfg, max_new_tokens=8,
                               prompt_len=ids.shape[1], eos_id=2,
                               early_exit_chunk=None, quantize_kv=True)
        out = np.asarray(gen(variables, vision, ids, mask,
                             jax.random.key(12)))
        assert out.shape == (2, 8)
        assert (out >= 0).all() and (out < mllm.llama.vocab_size).all()
        spec = make_speculative_generate_fn(
            mllm, cfg, max_new_tokens=8, prompt_len=ids.shape[1],
            eos_id=2, window=4, quantize_kv=True)
        sout = np.asarray(spec(variables, vision, ids, mask))
        np.testing.assert_array_equal(out, sout)


class TestGSPMDPartitioning:
    """The opt-in VMEM-dequant kernel registers custom_partitioning rules
    (ops/kv_quant.py _partitioned_attend_int8): batch shards freely, so
    an explicit kv_attn_impl("kernel") scope stays legal under a mesh
    (serve_tp.py drops its trace-time pins, r5)."""

    def test_sharded_kernel_matches_and_no_allgather(self):
        import re
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from tsue_tpu.ops.kv_quant import kv_attn_impl
        B, S, Hkv, D, Hq = 8, 24, 8, 64, 16
        ks = jax.random.split(jax.random.key(31), 3)
        k = jax.random.normal(ks[0], (B, S, Hkv, D)) * 0.5
        v = jax.random.normal(ks[1], (B, S, Hkv, D)) * 0.5
        cache = quantize_cache([(k, v)])[0]
        q = jax.random.normal(ks[2], (B, 1, Hq, D))
        mask = jnp.ones((B, S), bool)
        with kv_attn_impl("kernel"):
            ref = attend_int8_kv(q, cache, mask, interpret=True)
            mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
            qsh = NamedSharding(mesh, P("data"))

            def shd(x):
                return jax.device_put(
                    x, NamedSharding(mesh, P(*("data",) + (None,) *
                                             (x.ndim - 1))))

            f = jax.jit(lambda q_, c, m: attend_int8_kv(
                q_, c, m, interpret=True))
            args = (shd(q), tuple(shd(c) for c in cache), shd(mask))
            out = f(*args)
        assert out.sharding.spec[0] == "data"
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        hlo = f.lower(*args).compile().as_text()
        assert not re.findall(r"all-gather", hlo), \
            "int8-KV attention operands were gathered under the mesh"
