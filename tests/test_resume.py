"""Checkpoint/resume: interrupted training == uninterrupted training."""
import jax
import jax.numpy as jnp
import numpy as np

from tsue_tpu.config import (DataConfig, ExperimentConfig, LaneEncoderConfig,
                             LTSFConfig, ModelConfig, TrainConfig)
from tsue_tpu.data import BatchIterator
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.train.checkpoint import restore_train_state, save_train_state
from tsue_tpu.train.trainer import TrainState, make_optimizer, make_train_step

CFG = ExperimentConfig(
    name="resume", data=DataConfig(seq_len=6, out_len=6),
    model=ModelConfig(use_llm=False,
                      lane=LaneEncoderConfig(d_model=16, nhead=2,
                                             num_layers=1),
                      ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
    train=TrainConfig(batch_size=8, lr=1e-3, freeze_regime="joint"))


def _setup(small_windows):
    it = BatchIterator(small_windows, batch_size=8, shuffle=False)
    batches = [{k: jnp.asarray(v) for k, v in b.items()} for b in it][:4]
    model = TrajectoryModel(CFG.model, 6, 6)
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, batches[0], False)
    apply_fn = lambda v, b, det, rngs=None, **kw: model.apply(v, b, det, rngs=rngs, **kw)
    tx = make_optimizer(CFG, vs["params"])
    state = TrainState.create(apply_fn, vs["params"], tx)
    step = jax.jit(make_train_step(CFG))
    return batches, state, step


def test_resume_exact(small_windows, tmp_path):
    batches, state, step = _setup(small_windows)
    rng = jax.random.key(5)

    # uninterrupted: 4 steps
    s_full = state
    for b in batches:
        s_full, _ = step(s_full, b, rng)

    # interrupted: 2 steps -> save -> restore -> 2 steps
    s_a = state
    for b in batches[:2]:
        s_a, _ = step(s_a, b, rng)
    save_train_state(str(tmp_path / "ts"), s_a)
    s_b = restore_train_state(str(tmp_path / "ts"), state)
    assert int(s_b.step) == 2
    for b in batches[2:]:
        s_b, _ = step(s_b, b, rng)

    assert int(s_full.step) == int(s_b.step) == 4
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
