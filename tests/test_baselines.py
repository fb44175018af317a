"""Baseline models: shapes, training steps, candidate sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tsue_tpu.data import BatchIterator
from tsue_tpu.eval.metrics import min_ade_fde_rmse
from tsue_tpu.models.baselines import (BASELINE_REGISTRY, CSLSTM,
                                       GAILDiscriminator, GAILGenerator,
                                       MMTrans, SocialSTGCNN, TrajectronPP,
                                       cv_candidates)
from tsue_tpu.train.baseline_steps import (make_baseline_eval_fn,
                                           make_baseline_train_step,
                                           make_gail_train_step)

T_IN, T_OUT = 6, 6


@pytest.fixture(scope="module")
def batch(small_windows):
    b = next(iter(BatchIterator(small_windows, batch_size=8, shuffle=False)))
    return {k: jnp.asarray(v) for k, v in b.items()}


def _small(cls, **kw):
    defaults = dict(seq_len=T_IN, out_len=T_OUT, hidden_dim=32)
    if cls is MMTrans:
        defaults = dict(seq_len=T_IN, out_len=T_OUT, d_model=32, n_heads=4,
                        n_layers=1)
    defaults.update(kw)
    return cls(**defaults)


class TestCV:
    def test_noise_free_candidate_exact(self, batch):
        x = batch["traj_in"]
        pred = cv_candidates(x, T_OUT, rng=None, num_candidates=1)
        assert pred.shape == (8, 1, 2, T_OUT)
        last = np.asarray(x[:, :, -1])
        vel = last - np.asarray(x[:, :, -2])
        expect_t3 = last + vel * 4  # step index 3 => t+1 = 4
        np.testing.assert_allclose(np.asarray(pred[:, 0, :, 3]), expect_t3,
                                   rtol=1e-5)

    def test_candidates_differ_with_noise(self, batch):
        pred = cv_candidates(batch["traj_in"], T_OUT, jax.random.key(0),
                             num_candidates=5, noise_scale=0.1)
        assert pred.shape == (8, 5, 2, T_OUT)
        assert not np.allclose(np.asarray(pred[:, 0]), np.asarray(pred[:, 1]))

    def test_min_metrics_improve_with_k(self, batch):
        """More noisy candidates can only lower the min metrics."""
        gt = batch["traj_out"]
        p2 = cv_candidates(batch["traj_in"], T_OUT, jax.random.key(1), 2, 0.05)
        p10 = jnp.concatenate(
            [p2, cv_candidates(batch["traj_in"], T_OUT, jax.random.key(2),
                               8, 0.05)], axis=1)
        m2 = min_ade_fde_rmse(p2, gt, batch["norm_stat"])
        m10 = min_ade_fde_rmse(p10, gt, batch["norm_stat"])
        assert float(m10[0]) <= float(m2[0]) + 1e-6


@pytest.mark.parametrize("name", sorted(BASELINE_REGISTRY))
class TestBaselineModels:
    def test_forward_and_train_step(self, name, batch):
        model = _small(BASELINE_REGISTRY[name])
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "latent": jax.random.key(2), "noise": jax.random.key(3)}
        variables = model.init(rngs, batch, True)
        pred = model.apply(variables, batch, True)
        assert pred.shape == (8, 2, T_OUT)
        assert jnp.isfinite(pred).all()

        tx = optax.adamw(1e-3)
        step = jax.jit(make_baseline_train_step(model, tx))
        opt_state = tx.init(variables["params"])
        vs, opt_state, m = step(dict(variables), opt_state, batch,
                                jax.random.key(0))
        assert jnp.isfinite(m["loss"])
        # params moved
        moved = jax.tree.map(lambda a, b: not np.allclose(a, b),
                             variables["params"], vs["params"])
        assert any(jax.tree.leaves(moved))

    def test_candidate_eval(self, name, batch):
        model = _small(BASELINE_REGISTRY[name])
        rngs = {"params": jax.random.key(0), "dropout": jax.random.key(1),
                "latent": jax.random.key(2), "noise": jax.random.key(3)}
        variables = model.init(rngs, batch, True)
        cands = make_baseline_eval_fn(model)(variables, batch,
                                             jax.random.key(5), 3)
        assert cands.shape == (8, 3, 2, T_OUT)
        if name == "trajectron":  # stochastic latent => diverse candidates
            assert not np.allclose(np.asarray(cands[:, 0]),
                                   np.asarray(cands[:, 1]))


class TestSpecifics:
    def test_cslstm_teacher_vs_autoregressive(self, batch):
        model = _small(CSLSTM)
        vs = model.init({"params": jax.random.key(0)}, batch, True)
        auto = model.apply(vs, batch, True)
        forced = model.apply(vs, batch, True, teacher=batch["traj_out"])
        assert auto.shape == forced.shape
        # first step identical (same input), later steps diverge
        np.testing.assert_allclose(np.asarray(auto[:, :, 0]),
                                   np.asarray(forced[:, :, 0]), atol=1e-5)
        assert not np.allclose(np.asarray(auto[:, :, -1]),
                               np.asarray(forced[:, :, -1]))

    def test_stgcnn_updates_batch_stats(self, batch):
        model = _small(SocialSTGCNN)
        vs = model.init({"params": jax.random.key(0)}, batch, True)
        assert "batch_stats" in vs
        tx = optax.adamw(1e-3)
        step = jax.jit(make_baseline_train_step(model, tx))
        new_vs, _, _ = step(dict(vs), tx.init(vs["params"]), batch,
                            jax.random.key(0))
        changed = jax.tree.map(lambda a, b: not np.allclose(a, b),
                               vs["batch_stats"], new_vs["batch_stats"])
        assert any(jax.tree.leaves(changed))

    def test_trajectron_kl_positive(self, batch):
        from tsue_tpu.models.baselines.trajectron import kl_divergence
        model = _small(TrajectronPP)
        vs = model.init({"params": jax.random.key(0)}, batch, True)
        pred, (mu, logvar) = model.apply(vs, batch, False,
                                         rngs={"latent": jax.random.key(1)},
                                         return_latent=True)
        kl = kl_divergence(mu + 1.0, logvar)  # shifted mean => positive KL
        assert float(kl) > 0

    def test_gail_adversarial_step(self, batch):
        gen = _small(GAILGenerator)
        disc = _small(GAILDiscriminator)
        gvs = gen.init({"params": jax.random.key(0)}, batch, True)
        dvs = disc.init({"params": jax.random.key(1)}, batch["traj_in"],
                        batch["traj_out"])
        g_tx, d_tx = optax.adam(1e-3), optax.adam(1e-3)
        step = jax.jit(make_gail_train_step(gen, disc, g_tx, d_tx))
        gp, dp = gvs["params"], dvs["params"]
        go, do = g_tx.init(gp), d_tx.init(dp)
        for i in range(3):
            gp, dp, go, do, m = step(gp, dp, go, do, batch,
                                     jax.random.key(i))
        assert jnp.isfinite(m["g_loss"]) and jnp.isfinite(m["d_loss"])
        p = disc.apply({"params": dp}, batch["traj_in"], batch["traj_out"])
        assert ((p >= 0) & (p <= 1)).all()
