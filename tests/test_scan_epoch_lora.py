"""Full-epoch scan trainer equivalence + fused LoRA kernel parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import (DataConfig, ExperimentConfig, LaneEncoderConfig,
                             LTSFConfig, ModelConfig, TrainConfig)
from tsue_tpu.data import BatchIterator
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.ops.lora import lora_matmul, lora_ref
from tsue_tpu.train.trainer import (TrainState, make_optimizer,
                                    make_scan_epoch, make_train_step,
                                    stack_epoch_batches)
from tsue_tpu.utils.precision import cast_params

CFG = ExperimentConfig(
    name="scan", data=DataConfig(seq_len=6, out_len=6),
    model=ModelConfig(use_llm=False,
                      lane=LaneEncoderConfig(d_model=16, nhead=2,
                                             num_layers=1),
                      ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
    train=TrainConfig(batch_size=8, lr=1e-3, freeze_regime="joint"))


class TestScanEpoch:
    def test_scan_equals_loop(self, small_windows):
        it = BatchIterator(small_windows, batch_size=8, shuffle=True, seed=1)
        model = TrajectoryModel(CFG.model, 6, 6)
        b0 = {k: jnp.asarray(v) for k, v in next(iter(it)).items()}
        vs = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)}, b0, False)
        apply_fn = lambda v, b, det, rngs=None, **kw: model.apply(v, b, det,
                                                                 rngs=rngs, **kw)
        tx = make_optimizer(CFG, vs["params"])
        rng = jax.random.key(9)

        # loop
        s_loop = TrainState.create(apply_fn, vs["params"], tx)
        step = jax.jit(make_train_step(CFG))
        for b in it:
            s_loop, _ = step(s_loop, {k: jnp.asarray(v)
                                      for k, v in b.items()}, rng)

        # scan (same iterator order)
        s_scan = TrainState.create(apply_fn, vs["params"], tx)
        batches = stack_epoch_batches(it)
        s_scan, losses = jax.jit(make_scan_epoch(CFG),
                                 donate_argnums=0)(s_scan, batches, rng)

        assert int(s_loop.step) == int(s_scan.step) == losses.shape[0]
        for a, b_ in zip(jax.tree.leaves(s_loop.params),
                         jax.tree.leaves(s_scan.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-6)


class TestLoRAKernel:
    @pytest.mark.parametrize("M,K,N,r", [(32, 64, 128, 8), (40, 32, 96, 4)])
    def test_parity(self, M, K, N, r):
        ks = jax.random.split(jax.random.key(0), 4)
        x = jax.random.normal(ks[0], (M, K))
        w = jax.random.normal(ks[1], (K, N)) * 0.05
        a = jax.random.normal(ks[2], (K, r)) * 0.05
        b = jax.random.normal(ks[3], (r, N)) * 0.05
        ref = lora_ref(x, w, a, b, 4.0)
        out = lora_matmul(x, w, a, b, 4.0, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_gradients(self):
        ks = jax.random.split(jax.random.key(1), 4)
        x = jax.random.normal(ks[0], (16, 32))
        w = jax.random.normal(ks[1], (32, 48)) * 0.1
        a = jax.random.normal(ks[2], (32, 4)) * 0.1
        b = jax.random.normal(ks[3], (4, 48)) * 0.1
        g1 = jax.grad(lambda *p: jnp.sum(lora_matmul(*p, 4.0, True) ** 2),
                      argnums=(0, 1, 2, 3))(x, w, a, b)
        g2 = jax.grad(lambda *p: jnp.sum(lora_ref(*p, 4.0) ** 2),
                      argnums=(0, 1, 2, 3))(x, w, a, b)
        for u, v in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       atol=1e-4, rtol=1e-4)


class TestPrecision:
    def test_cast_roundtrip(self):
        params = {"w": jnp.ones((2, 2)), "i": jnp.ones((2,), jnp.int32)}
        bf = cast_params(params)
        assert bf["w"].dtype == jnp.bfloat16
        assert bf["i"].dtype == jnp.int32
