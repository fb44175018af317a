"""Fused NLinear + metric kernels: parity vs XLA references."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.eval.metrics import ade_fde
from tsue_tpu.ops.metric_kernels import fused_ade_fde
from tsue_tpu.ops.nlinear import nlinear_fused, nlinear_ref

B, C, TI, TO = 4, 64, 18, 30


@pytest.fixture(scope="module")
def nlinear_inputs():
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (B, C, TI))
    w = jax.random.normal(ks[1], (C, TI, TO)) * 0.1
    b = jax.random.normal(ks[2], (C, TO)) * 0.1
    return x, w, b


class TestNLinear:
    def test_parity(self, nlinear_inputs):
        x, w, b = nlinear_inputs
        ref = nlinear_ref(x, w, b)
        out = nlinear_fused(x, w, b, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients(self, nlinear_inputs):
        x, w, b = nlinear_inputs
        g1 = jax.grad(lambda *a: jnp.sum(nlinear_fused(*a, True) ** 2),
                      argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(lambda *a: jnp.sum(nlinear_ref(*a) ** 2),
                      argnums=(0, 1, 2))(x, w, b)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)

    def test_last_value_passthrough(self):
        """Zero weights/bias => output is the last input value repeated."""
        x = jax.random.normal(jax.random.key(1), (B, C, TI))
        w = jnp.zeros((C, TI, TO))
        b = jnp.zeros((C, TO))
        out = nlinear_fused(x, w, b, True)
        np.testing.assert_allclose(
            np.asarray(out),
            np.broadcast_to(np.asarray(x[:, :, -1:]), (B, C, TO)),
            atol=1e-6)


class TestFusedRMSNorm:
    """fused_rmsnorm (Pallas, interpret) vs the XLA formulation."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_parity(self, dtype):
        from tsue_tpu.ops.fused import fused_rmsnorm, rmsnorm_ref
        x = jax.random.normal(jax.random.key(3), (2, 96, 256)).astype(dtype)
        s = 1.0 + 0.1 * jax.random.normal(jax.random.key(4), (256,))
        out = fused_rmsnorm(x, s, 1e-5, interpret=True)
        ref = rmsnorm_ref(x, s, 1e-5)
        assert out.dtype == ref.dtype
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=1e-6, rtol=1e-6)

    def test_gradients(self):
        from tsue_tpu.ops.fused import fused_rmsnorm, rmsnorm_ref
        x = jax.random.normal(jax.random.key(5), (192, 128))
        s = 1.0 + 0.1 * jax.random.normal(jax.random.key(6), (128,))
        g1 = jax.grad(
            lambda x_, s_: jnp.sum(fused_rmsnorm(x_, s_, 1e-5, True) ** 2),
            argnums=(0, 1))(x, s)
        g2 = jax.grad(
            lambda x_, s_: jnp.sum(rmsnorm_ref(x_, s_, 1e-5) ** 2),
            argnums=(0, 1))(x, s)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-5, rtol=1e-5)

    def test_small_shapes_fall_back(self):
        """M < 128 (decode steps) and K % 128 != 0 use the XLA path."""
        from tsue_tpu.ops.fused import fused_rmsnorm, rmsnorm_ref
        for shape in [(16, 256), (40, 96)]:
            x = jax.random.normal(jax.random.key(7), shape)
            s = jnp.ones((shape[-1],))
            np.testing.assert_allclose(
                np.asarray(fused_rmsnorm(x, s, 1e-5)),
                np.asarray(rmsnorm_ref(x, s, 1e-5)), atol=0)


class TestSwigluMatmul:
    """(silu(gate) * up) @ W fused kernel vs the XLA reference."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_parity(self, dtype):
        from tsue_tpu.ops.fused import swiglu_matmul, swiglu_matmul_ref
        ks = jax.random.split(jax.random.key(8), 3)
        g = jax.random.normal(ks[0], (2, 80, 384)).astype(dtype)
        u = jax.random.normal(ks[1], (2, 80, 384)).astype(dtype)
        w = (jax.random.normal(ks[2], (384, 128)) * 0.05).astype(dtype)
        out = swiglu_matmul(g, u, w, interpret=True)
        ref = swiglu_matmul_ref(g.reshape(-1, 384), u.reshape(-1, 384),
                                w).reshape(2, 80, 128)
        assert out.dtype == ref.dtype
        tol = 1e-5 if dtype == jnp.float32 else 5e-2
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=tol, rtol=tol)

    def test_k_loop_accumulation(self):
        """K larger than one block exercises the scratch accumulator."""
        from tsue_tpu.ops.fused import _swiglu_fwd_impl, swiglu_matmul_ref
        ks = jax.random.split(jax.random.key(9), 3)
        g = jax.random.normal(ks[0], (256, 4096))
        u = jax.random.normal(ks[1], (256, 4096))
        w = jax.random.normal(ks[2], (4096, 256)) * 0.02
        out = _swiglu_fwd_impl(g, u, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(swiglu_matmul_ref(g, u, w)),
                                   atol=1e-4, rtol=1e-4)

    def test_gradients(self):
        from tsue_tpu.ops.fused import swiglu_matmul, swiglu_matmul_ref
        ks = jax.random.split(jax.random.key(10), 3)
        g = jax.random.normal(ks[0], (160, 128))
        u = jax.random.normal(ks[1], (160, 128))
        w = jax.random.normal(ks[2], (128, 128)) * 0.05
        g1 = jax.grad(
            lambda *a: jnp.sum(swiglu_matmul(*a, interpret=True) ** 2),
            argnums=(0, 1, 2))(g, u, w)
        g2 = jax.grad(lambda *a: jnp.sum(swiglu_matmul_ref(*a) ** 2),
                      argnums=(0, 1, 2))(g, u, w)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)


class TestFusedLlamaPath:
    """The Llama block under fused_scope("on") (interpreted kernels on CPU)
    matches the default XLA path — both forward and gradients."""

    def test_model_forward_and_grad_parity(self):
        from tsue_tpu.config import LlamaConfig
        from tsue_tpu.models.llama import LlamaForCausalLM
        from tsue_tpu.ops.fused import fused_scope
        cfg = LlamaConfig(vocab_size=64, hidden_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=32,
                          intermediate_size=256, rope_scaling_factor=1.0,
                          use_lora=False, remat=False, loss_chunk=0)
        model = LlamaForCausalLM(cfg)
        ids = jax.random.randint(jax.random.key(11), (2, 96), 0, 64)
        labels = jnp.where(ids > 4, ids, -100)
        params = model.init(jax.random.key(0), input_ids=ids,
                            labels=labels)["params"]

        def loss_fn(p):
            return model.apply({"params": p}, input_ids=ids,
                               labels=labels)["loss"]

        ref_loss, ref_grad = jax.value_and_grad(loss_fn)(params)
        with fused_scope("on"):
            loss, grad = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss), float(ref_loss),
                                   atol=1e-5, rtol=1e-5)
        ref_flat = jax.tree_util.tree_leaves(ref_grad)
        for a, b_ in zip(jax.tree_util.tree_leaves(grad), ref_flat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)


class TestFusedMetrics:
    def test_parity_with_eval_metrics(self):
        ks = jax.random.split(jax.random.key(2), 3)
        pred = jax.random.uniform(ks[0], (B, 2, TO))
        gt = jax.random.uniform(ks[1], (B, 2, TO))
        stat = jnp.asarray(
            np.tile(np.array([100., 900., 50., 350.], np.float32), (B, 1)))
        per = fused_ade_fde(pred, gt, stat, interpret=True)  # (B, 2)
        ref_ade, ref_fde = ade_fde(pred, gt, stat)
        np.testing.assert_allclose(float(per[:, 0].mean()), float(ref_ade),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(per[:, 1].mean()), float(ref_fde),
                                   rtol=1e-5)
