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
    save_train_state(str(tmp_path / "ts"), s_a, epoch=2, best_val=0.5)
    s_b, extra = restore_train_state(str(tmp_path / "ts"), state)
    assert int(s_b.step) == 2
    # epoch/best_val ride inside the orbax tree, atomic with its commit
    assert extra == {"epoch": 2, "best_val": 0.5}
    for b in batches[2:]:
        s_b, _ = step(s_b, b, rng)

    assert int(s_full.step) == int(s_b.step) == 4
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_subset_save_and_crash_swap_fallback(small_windows, tmp_path):
    """trainable_filter stores only the trainable subtree (frozen leaves
    rebuilt from the template at restore), and a crash mid-swap leaves a
    usable `.old` survivor that train_state_path resolves."""
    import os

    from flax import traverse_util
    from tsue_tpu.train.checkpoint import train_state_path

    batches, state, step = _setup(small_windows)
    # treat the ltsf subtree as "frozen" (rebuilt from the template)
    filt = lambda p: "ltsf" not in p
    s_a = state
    for b in batches[:2]:
        s_a, _ = step(s_a, b, jax.random.key(5))
    path = str(tmp_path / "ts")
    save_train_state(path, s_a, epoch=1, best_val=0.25, trainable_filter=filt)

    # on-disk params hold ONLY the trainable subtree
    flat_all = traverse_util.flatten_dict(jax.tree.map(np.asarray,
                                                       state.params))
    kept = {k for k in flat_all if filt(tuple(str(p) for p in k))}
    assert 0 < len(kept) < len(flat_all)
    from tsue_tpu.train.checkpoint import checkpoint_tree_shapes
    stored = {k[1:] for k in checkpoint_tree_shapes(path)
              if k and k[0] == "params"}
    assert stored == kept

    s_b, extra = restore_train_state(path, state, trainable_filter=filt)
    assert extra == {"epoch": 1, "best_val": 0.25}
    flat_b = traverse_util.flatten_dict(jax.tree.map(np.asarray, s_b.params))
    flat_a = traverse_util.flatten_dict(jax.tree.map(np.asarray, s_a.params))
    for k in flat_all:
        want = flat_a[k] if k in kept else flat_all[k]
        np.testing.assert_array_equal(flat_b[k], want)

    # crash mid-swap: live dir renamed away, only `.old` remains
    os.rename(path, path + ".old")
    assert train_state_path(path) == path + ".old"
    s_c, extra_c = restore_train_state(path, state, trainable_filter=filt)
    assert extra_c == {"epoch": 1, "best_val": 0.25}
    assert int(s_c.step) == 2


def test_pre_r4_guard_outer_checkpoint_restores(small_windows, tmp_path):
    """Checkpoints saved BEFORE the r4 NaN-guard relocation (guard
    wrapped the whole multi_transform; r4 moved it inside the "train"
    branch for the frozen-dW DCE win) restore through the
    _legacy_guard_outer shim: orbax structure-matches the old layout,
    then the moments/guard counters are rewrapped into the current one
    and training continues exactly where the old run stopped."""
    from tsue_tpu.train.checkpoint import _legacy_guard_outer
    batches, state, step = _setup(small_windows)
    rng = jax.random.key(5)
    s_a = state
    for b in batches[:2]:
        s_a, _ = step(s_a, b, rng)

    legacy_opt = _legacy_guard_outer(s_a.opt_state)
    assert legacy_opt is not None
    # the OLD layout: ApplyIfFiniteState at the top, multi_transform inside
    import optax
    assert isinstance(legacy_opt, optax.ApplyIfFiniteState)
    save_train_state(str(tmp_path / "old_ts"),
                     s_a.replace(opt_state=legacy_opt),
                     epoch=1, best_val=0.75)

    s_b, extra = restore_train_state(str(tmp_path / "old_ts"), state)
    assert extra == {"epoch": 1, "best_val": 0.75}
    # moments and guard counters identical to the pre-save state
    for a, b in zip(jax.tree.leaves(s_a.opt_state),
                    jax.tree.leaves(s_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed run == uninterrupted run
    s_full = s_a
    for b in batches[2:]:
        s_full, _ = step(s_full, b, rng)
        s_b, _ = step(s_b, b, rng)
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
