"""Llama decoder tests: causality, masking, LoRA, LM loss, KV-cache parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import LlamaConfig, QFormerConfig
from tsue_tpu.models.llama import (LlamaForCausalLM, LlamaModel,
                                   causal_lm_loss, init_kv_cache)

CFG = LlamaConfig.tiny()
B, T, D = 2, 10, CFG.hidden_size


@pytest.fixture(scope="module")
def lm():
    model = LlamaForCausalLM(CFG)
    vs = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                    input_ids=jnp.zeros((B, T), jnp.int32),
                    attention_mask=jnp.ones((B, T), jnp.int32))
    return model, vs


def _embed(model, vs, ids):
    return model.apply(vs, ids, method=model.embed)


class TestLlamaCore:
    def test_forward_shapes(self, lm):
        model, vs = lm
        ids = jax.random.randint(jax.random.key(2), (B, T), 0, CFG.vocab_size)
        embeds = _embed(model, vs, ids)
        out = model.apply(vs, embeds, jnp.ones((B, T), jnp.int32),
                          compute_logits=True)
        assert out["hidden"].shape == (B, T, D)
        assert out["logits"].shape == (B, T, CFG.vocab_size)
        assert jnp.isfinite(out["hidden"]).all()

    def test_causality(self, lm):
        """Perturbing a future token must not change earlier hiddens."""
        model, vs = lm
        ids = jax.random.randint(jax.random.key(3), (B, T), 3, 200)
        e1 = _embed(model, vs, ids)
        ids2 = ids.at[:, -1].set((ids[:, -1] + 7) % 200)
        e2 = _embed(model, vs, ids2)
        h1 = model.apply(vs, e1, jnp.ones((B, T), jnp.int32))["hidden"]
        h2 = model.apply(vs, e2, jnp.ones((B, T), jnp.int32))["hidden"]
        np.testing.assert_allclose(np.asarray(h1[:, :-1]),
                                   np.asarray(h2[:, :-1]), atol=1e-5)
        assert not np.allclose(np.asarray(h1[:, -1]), np.asarray(h2[:, -1]))

    def test_padding_invariance(self, lm):
        """Changing content at masked (pad) positions leaves valid hiddens."""
        model, vs = lm
        ids = jax.random.randint(jax.random.key(4), (B, T), 3, 200)
        mask = jnp.asarray(np.array([[1] * 6 + [0] * 4] * B), jnp.int32)
        e1 = _embed(model, vs, ids)
        ids2 = ids.at[:, 6:].set(77)
        e2 = _embed(model, vs, ids2)
        h1 = model.apply(vs, e1, mask)["hidden"]
        h2 = model.apply(vs, e2, mask)["hidden"]
        np.testing.assert_allclose(np.asarray(h1[:, :6]),
                                   np.asarray(h2[:, :6]), atol=1e-5)

    def test_lm_loss_matches_manual(self, lm):
        model, vs = lm
        ids = jax.random.randint(jax.random.key(5), (B, T), 3, 200)
        labels = ids.at[:, :4].set(-100)  # mask a prompt span
        e = _embed(model, vs, ids)
        out = model.apply(vs, e, jnp.ones((B, T), jnp.int32), labels=labels)
        logits = np.asarray(model.apply(vs, e, jnp.ones((B, T), jnp.int32),
                                        compute_logits=True)["logits"],
                            np.float64)
        # manual shifted CE
        tot, cnt = 0.0, 0
        for b in range(B):
            for t in range(T - 1):
                lab = int(labels[b, t + 1])
                if lab == -100:
                    continue
                row = logits[b, t]
                tot += np.log(np.exp(row - row.max()).sum()) + row.max() - row[lab]
                cnt += 1
        np.testing.assert_allclose(float(out["loss"]), tot / cnt, rtol=1e-5)

    def test_all_ignored_labels_zero_loss(self, lm):
        model, vs = lm
        ids = jnp.ones((B, T), jnp.int32)
        labels = jnp.full((B, T), -100, jnp.int32)
        e = _embed(model, vs, ids)
        out = model.apply(vs, e, jnp.ones((B, T), jnp.int32), labels=labels)
        assert float(out["loss"]) == 0.0

    def test_chunked_loss_untied_head(self):
        """Regression (review finding): the chunked path must not call the
        lm_head flax submodule inside the checkpointed scan body — with
        tie_word_embeddings=False that raised UnexpectedTracerError."""
        import dataclasses
        cfg_d = dataclasses.replace(CFG, tie_word_embeddings=False)
        cfg_c = dataclasses.replace(cfg_d, loss_chunk=3)
        dense = LlamaForCausalLM(cfg_d)
        chunked = LlamaForCausalLM(cfg_c)
        ids = jax.random.randint(jax.random.key(9), (B, T), 3, 200)
        labels = ids.at[:, :2].set(-100)
        mask = jnp.ones((B, T), jnp.int32)
        vs = chunked.init({"params": jax.random.key(0),
                           "dropout": jax.random.key(1)},
                          input_ids=ids, attention_mask=mask, labels=labels)
        assert "lm_head" in vs["params"]  # init created the untied head
        e = dense.apply(vs, ids, method=dense.embed)
        ld = dense.apply(vs, e, mask, labels=labels)["loss"]
        lc = chunked.apply(vs, e, mask, labels=labels)["loss"]
        np.testing.assert_allclose(float(lc), float(ld), rtol=1e-6)

    @pytest.mark.parametrize("chunk", [4, 5])  # 5 does not divide T-1
    def test_chunked_loss_matches_dense_value_and_grads(self, lm, chunk):
        """causal_lm_loss_chunked == the dense loss, value AND gradients
        (the chunked path never materializes (B, T, V) logits — it must
        not change training numerics)."""
        import dataclasses
        model, vs = lm
        cfg_c = dataclasses.replace(CFG, loss_chunk=chunk)
        model_c = LlamaForCausalLM(cfg_c)
        ids = jax.random.randint(jax.random.key(6), (B, T), 3, 200)
        labels = ids.at[:, :3].set(-100)
        mask = jnp.ones((B, T), jnp.int32)
        e = _embed(model, vs, ids)

        def dense_loss(params):
            return model.apply({"params": params}, e, mask,
                               labels=labels)["loss"]

        def chunked_loss(params):
            return model_c.apply({"params": params}, e, mask,
                                 labels=labels)["loss"]

        params = vs["params"]
        ld, gd = jax.value_and_grad(dense_loss)(params)
        lc, gc = jax.value_and_grad(chunked_loss)(params)
        np.testing.assert_allclose(float(lc), float(ld), rtol=1e-6)
        for (kd, vd), (kc, vc) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(gd),
                       key=lambda kv: str(kv[0])),
                sorted(jax.tree_util.tree_leaves_with_path(gc),
                       key=lambda kv: str(kv[0]))):
            assert str(kd) == str(kc)
            np.testing.assert_allclose(np.asarray(vc), np.asarray(vd),
                                       atol=1e-5, err_msg=str(kd))


class TestLoRA:
    def test_lora_params_exist_and_noop_at_init(self):
        cfg = CFG
        model = LlamaForCausalLM(cfg)
        embeds = jnp.ones((1, 4, cfg.hidden_size))
        vs = model.init({"params": jax.random.key(0)},
                        input_ids=jnp.zeros((1, 4), jnp.int32))
        flat = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
        paths = ["/".join(str(getattr(k, "key", k)) for k in p)
                 for p, _ in flat]
        assert any("lora_a" in p for p in paths)
        assert any("lora_b" in p for p in paths)
        # q_proj and v_proj only (PEFT default targets)
        assert not any("k_proj" in p and "lora" in p for p in paths)
        # lora_b zero-init => adapter is a no-op at init: perturbing lora_a
        # changes nothing, perturbing lora_b does
        import flax
        h0 = model.apply(vs, embeds, None)["hidden"]
        flat_p = flax.traverse_util.flatten_dict(vs["params"])
        pa = {k: (v + 1.0 if k[-1] == "lora_a" else v)
              for k, v in flat_p.items()}
        ha = model.apply({"params": flax.traverse_util.unflatten_dict(pa)},
                         embeds, None)["hidden"]
        np.testing.assert_allclose(np.asarray(h0), np.asarray(ha), atol=1e-6)
        pb = {k: (v + 0.01 if k[-1] == "lora_b" else v)
              for k, v in flat_p.items()}
        hb = model.apply({"params": flax.traverse_util.unflatten_dict(pb)},
                         embeds, None)["hidden"]
        assert not np.allclose(np.asarray(h0), np.asarray(hb))

    def test_no_lora_config_has_no_lora_params(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, use_lora=False)
        model = LlamaForCausalLM(cfg)
        vs = model.init({"params": jax.random.key(0)},
                        input_ids=jnp.zeros((1, 4), jnp.int32))
        flat = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
        assert not any("lora" in str(p) for p, _ in flat)


class TestKVCache:
    def test_decode_matches_prefill(self):
        """Step-by-step cached decode == full-sequence forward."""
        model = LlamaModel(CFG)
        ids = jax.random.randint(jax.random.key(6), (B, T), 3, 200)
        vs = model.init({"params": jax.random.key(0)},
                        input_ids=ids,
                        attention_mask=jnp.ones((B, T), jnp.int32))
        embeds = model.apply(vs, ids, method=model.embed)
        full, _ = model.apply(vs, embeds, jnp.ones((B, T), jnp.int32))

        caches = init_kv_cache(CFG, B, T)
        outs = []
        for t in range(T):
            pos = jnp.full((B, 1), t, jnp.int32)
            kv_mask = (jnp.arange(T)[None, :] <= t)
            kv_mask = jnp.broadcast_to(kv_mask, (B, T)).astype(jnp.int32)
            h, caches = model.apply(vs, embeds[:, t:t + 1], None, pos,
                                    True, caches, t, kv_mask)
            outs.append(h)
        dec = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(dec),
                                   atol=2e-4)


class TestRope:
    def test_rope_rotation_preserves_norm(self):
        from tsue_tpu.models.llama import apply_rope, rope_inv_freq
        x = jax.random.normal(jax.random.key(0), (2, 5, 4, CFG.head_dim))
        pos = jnp.broadcast_to(jnp.arange(5), (2, 5))
        y = apply_rope(x, pos, jnp.asarray(rope_inv_freq(CFG)))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(x)),
                                   np.linalg.norm(np.asarray(y)), rtol=1e-5)

    def test_rope_relative_shift(self):
        """RoPE dot products depend only on relative positions."""
        from tsue_tpu.models.llama import apply_rope, rope_inv_freq
        inv = jnp.asarray(rope_inv_freq(CFG))
        q = jax.random.normal(jax.random.key(1), (1, 1, 1, CFG.head_dim))
        k = jax.random.normal(jax.random.key(2), (1, 1, 1, CFG.head_dim))
        def score(pq, pk):
            qr = apply_rope(q, jnp.array([[pq]]), inv)
            kr = apply_rope(k, jnp.array([[pk]]), inv)
            return float(jnp.sum(qr * kr))
        np.testing.assert_allclose(score(3, 1), score(10, 8), rtol=1e-4)
