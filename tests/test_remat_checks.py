"""Remat option, checkify wrapper, bf16 casting helper."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import LlamaConfig
from tsue_tpu.models.llama import LlamaForCausalLM
from tsue_tpu.utils.checks import checked


class TestRemat:
    def test_remat_forward_and_grad_match(self):
        cfg = LlamaConfig.tiny()
        cfg_r = dataclasses.replace(cfg, remat=True)
        ids = jax.random.randint(jax.random.key(0), (2, 8), 3, 200)
        mask = jnp.ones((2, 8), jnp.int32)
        m1, m2 = LlamaForCausalLM(cfg), LlamaForCausalLM(cfg_r)
        vs = m1.init({"params": jax.random.key(1)}, input_ids=ids,
                     attention_mask=mask)

        def loss(model, params):
            out = model.apply({"params": params}, input_ids=ids,
                              attention_mask=mask, labels=ids)
            return out["loss"]

        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(vs["params"])
        l2, g2 = jax.value_and_grad(lambda p: loss(m2, p))(vs["params"])
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    @pytest.mark.parametrize("policy", ["dots", "dots_no_batch"])
    def test_remat_policy_value_and_grad_match_full(self, policy):
        """Selective checkpoint policies (save matmul outputs, recompute
        elementwise) must be numerically identical to the full-recompute
        default — the policy only changes WHAT the backward recomputes."""
        cfg = dataclasses.replace(LlamaConfig.tiny(), remat=True)
        cfg_p = dataclasses.replace(cfg, remat_policy=policy)
        ids = jax.random.randint(jax.random.key(0), (2, 8), 3, 200)
        mask = jnp.ones((2, 8), jnp.int32)
        m1, m2 = LlamaForCausalLM(cfg), LlamaForCausalLM(cfg_p)
        vs = m1.init({"params": jax.random.key(1)}, input_ids=ids,
                     attention_mask=mask)

        def loss(model, params):
            out = model.apply({"params": params}, input_ids=ids,
                              attention_mask=mask, labels=ids)
            return out["loss"]

        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(vs["params"])
        l2, g2 = jax.value_and_grad(lambda p: loss(m2, p))(vs["params"])
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_remat_policy_unknown_raises(self):
        cfg = dataclasses.replace(LlamaConfig.tiny(), remat=True,
                                  remat_policy="bogus")
        with pytest.raises(ValueError, match="remat_policy"):
            LlamaForCausalLM(cfg).init(
                {"params": jax.random.key(0)},
                input_ids=jnp.ones((1, 4), jnp.int32))


class TestCheckify:
    def test_nan_raises(self):
        @jax.jit
        def f(x):
            return jnp.log(x).sum()

        good = checked(f)(jnp.ones(3))
        assert np.isfinite(float(good))
        with pytest.raises(Exception, match="nan"):
            checked(f)(jnp.asarray([-1.0, 1.0, 2.0]))
