"""LTSF forecaster + no-LLM TrajectoryModel: shapes, grads, training slice."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import (DataConfig, ExperimentConfig, ModelConfig,
                             TrainConfig)
from tsue_tpu.data import BatchIterator, build_windows
from tsue_tpu.eval.metrics import ade_fde, candidate_rollout, min_ade_fde_rmse
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.train.losses import denorm, denorm_mse_loss
from tsue_tpu.train.trainer import (TrainState, freeze_label,
                                    make_optimizer, make_train_step)

from tsue_tpu.config import LaneEncoderConfig, LTSFConfig

# small config: tests exercise wiring/semantics, not capacity; full-size
# configs are covered by the bench/e2e paths on real hardware
NO_LLM = ModelConfig(
    use_llm=False,
    lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
    ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16))


def _cfg(seq_len=6, out_len=6):
    return ExperimentConfig(
        name="t", data=DataConfig(seq_len=seq_len, out_len=out_len),
        model=NO_LLM,
        train=TrainConfig(batch_size=8, lr=1e-3, freeze_regime="joint"))


def _init(cfg, batch):
    model = TrajectoryModel(cfg.model, cfg.data.seq_len, cfg.data.out_len)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        batch, False)
    return model, variables


@pytest.fixture(scope="module")
def batch(small_windows):
    it = BatchIterator(small_windows, batch_size=8, shuffle=False)
    b = next(iter(it))
    return {k: jnp.asarray(v) for k, v in b.items()}


class TestModel:
    def test_forward_shape(self, batch):
        cfg = _cfg()
        model, variables = _init(cfg, batch)
        pred = model.apply(variables, batch, True)
        assert pred.shape == (8, 2, 6)
        assert jnp.isfinite(pred).all()

    def test_dropout_stochasticity(self, batch):
        cfg = _cfg()
        model, variables = _init(cfg, batch)
        p1 = model.apply(variables, batch, False,
                         rngs={"dropout": jax.random.key(1)})
        p2 = model.apply(variables, batch, False,
                         rngs={"dropout": jax.random.key(2)})
        p1b = model.apply(variables, batch, False,
                          rngs={"dropout": jax.random.key(1)})
        assert not jnp.allclose(p1, p2)
        assert jnp.allclose(p1, p1b)  # explicit-key reproducibility

    def test_empty_polygon_zero_embedding(self, batch):
        from tsue_tpu.models.lane_encoder import LanePolygonEncoder
        enc = LanePolygonEncoder()
        poly = jnp.asarray(np.random.randn(4, 64, 2), jnp.float32)
        plen = jnp.array([64, 10, 0, 3], jnp.int32)
        vs = enc.init(jax.random.key(0), poly, plen)
        out = enc.apply(vs, poly, plen)
        assert out.shape == (4, 64)
        np.testing.assert_allclose(out[2], 0.0)
        assert not np.allclose(out[1], 0.0)

    def test_last_value_residual(self, batch):
        """Zero-weight model still predicts near the last input position."""
        cfg = _cfg()
        model, variables = _init(cfg, batch)
        zeroed = jax.tree.map(jnp.zeros_like, variables["params"])
        pred = model.apply({"params": zeroed}, batch, True)
        last = batch["traj_in"][:, :, -1:]
        np.testing.assert_allclose(np.asarray(pred),
                                   np.broadcast_to(np.asarray(last),
                                                   pred.shape), atol=1e-5)


class TestLossesMetrics:
    def test_denorm_roundtrip(self, batch):
        den = denorm(batch["traj_out"], batch["norm_stat"])
        ns = np.asarray(batch["norm_stat"])
        assert (np.asarray(den[:, 0]).min(axis=1) >= ns[:, 0] - 1e-3).all()
        assert (np.asarray(den[:, 0]).max(axis=1) <= ns[:, 1] + 1e-3).all()

    def test_perfect_prediction_zero(self, batch):
        loss = denorm_mse_loss(batch["traj_out"], batch["traj_out"],
                               batch["norm_stat"])
        assert float(loss) == 0.0
        ade, fde = ade_fde(batch["traj_out"], batch["traj_out"],
                           batch["norm_stat"])
        assert float(ade) < 1e-3 and float(fde) < 1e-3

    def test_known_offset_ade(self, batch):
        """Shift denormalized pred by exactly 3px in x => ADE = FDE = 3."""
        ns = np.asarray(batch["norm_stat"])
        range_x = ns[:, 1] - ns[:, 0]
        shift = 3.0 / range_x  # normalized-units shift per sample
        pred = np.asarray(batch["traj_out"]).copy()
        pred[:, 0, :] += shift[:, None]
        ade, fde = ade_fde(jnp.asarray(pred), batch["traj_out"],
                           batch["norm_stat"])
        np.testing.assert_allclose(float(ade), 3.0, rtol=1e-4)
        np.testing.assert_allclose(float(fde), 3.0, rtol=1e-4)

    def test_min_metrics_pick_best_candidate(self, batch):
        gt = batch["traj_out"]
        bad = gt + 0.5
        cands = jnp.stack([bad, gt, bad], axis=1)  # (B,3,2,T)
        mins = min_ade_fde_rmse(cands, gt, batch["norm_stat"])
        for m in mins:
            assert float(m) < 1e-3

    def test_candidate_rollout_vmap(self, batch):
        cfg = _cfg()
        model, variables = _init(cfg, batch)

        def apply_fn(vs, b, det, rngs):
            return model.apply(vs, b, det, rngs=rngs)

        cands = candidate_rollout(apply_fn, variables, batch, 4,
                                  jax.random.key(0))
        assert cands.shape == (8, 4, 2, 6)
        # candidates differ (dropout active)
        assert not jnp.allclose(cands[:, 0], cands[:, 1])


class TestFreezeRegimes:
    def test_labels(self):
        assert freeze_label(("mllm", "llama", "layer_0", "q_proj"), "frozen_mllm") == "freeze"
        assert freeze_label(("mllm", "qformer", "w"), "frozen_mllm") == "freeze"
        assert freeze_label(("ltsf", "decoder", "w"), "frozen_mllm") == "train"
        assert freeze_label(("mllm", "llama", "lora_a"), "lora_only") == "train"
        assert freeze_label(("mllm", "llama", "q_proj", "kernel"), "lora_only") == "freeze"
        assert freeze_label(("mllm", "qformer", "w"), "lora_only") == "train"
        assert freeze_label(("mllm", "llama", "lora_a"), "full_freeze") == "freeze"
        assert freeze_label(("mllm", "qformer", "w"), "full_freeze") == "train"
        assert freeze_label(("anything",), "joint") == "train"

    def test_frozen_params_do_not_move(self, batch):
        """With a fake 'mllm' param group frozen, updates leave it unchanged."""
        cfg = dataclasses.replace(_cfg(), train=TrainConfig(
            batch_size=8, lr=1e-2, freeze_regime="frozen_mllm"))
        model, variables = _init(cfg, batch)
        # graft a fake mllm subtree to exercise the mask without the LLM
        params = dict(variables["params"])
        params["mllm"] = {"w": jnp.ones((4, 4))}
        tx = make_optimizer(cfg, params)

        def apply_fn(vs, b, det, rngs=None, **kw):
            inner = {k: v for k, v in vs["params"].items() if k != "mllm"}
            out = model.apply({"params": inner}, b, det, rngs=rngs)
            # touch the fake param so it gets a grad
            return out + 0.0 * vs["params"]["mllm"]["w"].sum()

        state = TrainState.create(apply_fn, params, tx)
        step = jax.jit(make_train_step(cfg))
        new_state, m = step(state, batch, jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(new_state.params["mllm"]["w"]),
                                      np.ones((4, 4)))
        # trainable parts did move
        moved = jax.tree.map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
            {k: v for k, v in state.params.items() if k != "mllm"},
            {k: v for k, v in new_state.params.items() if k != "mllm"})
        assert any(jax.tree.leaves(moved))


class TestTrainingSlice:
    def test_loss_decreases(self, small_windows):
        """End-to-end: 30 steps of the jit'ed train step reduce the loss."""
        cfg = _cfg()
        it = BatchIterator(small_windows, batch_size=8, shuffle=True, seed=0)
        b0 = {k: jnp.asarray(v) for k, v in next(iter(it)).items()}
        model, variables = _init(cfg, b0)

        def apply_fn(vs, b, det, rngs=None, **kw):
            return model.apply(vs, b, det, rngs=rngs)

        tx = make_optimizer(cfg, variables["params"])
        state = TrainState.create(apply_fn, variables["params"], tx)
        step = jax.jit(make_train_step(cfg))
        rng = jax.random.key(0)
        losses = []
        for epoch in range(10):
            it.set_epoch(epoch)
            for batch in it:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                state, m = step(state, batch, rng)
                losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    def test_nan_guard_skips_bad_step(self, batch):
        cfg = _cfg()
        model, variables = _init(cfg, batch)

        def apply_fn(vs, b, det, rngs=None, **kw):
            return model.apply(vs, b, det, rngs=rngs)

        tx = make_optimizer(cfg, variables["params"])
        state = TrainState.create(apply_fn, variables["params"], tx)
        step = jax.jit(make_train_step(cfg))
        bad = dict(batch)
        bad["traj_out"] = batch["traj_out"].at[0, 0, 0].set(jnp.nan)
        new_state, m = step(state, bad, jax.random.key(0))
        assert not jnp.isfinite(m["loss"])
        # params unchanged thanks to apply_if_finite
        same = jax.tree.map(lambda a, b: np.allclose(np.asarray(a),
                                                     np.asarray(b)),
                            state.params, new_state.params)
        assert all(jax.tree.leaves(same))
