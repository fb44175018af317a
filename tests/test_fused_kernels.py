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
