"""apply_if_finite_fast == optax.apply_if_finite: state, skips, numerics.

The max-|x| probe (train/guard.py) must be indistinguishable from
optax's per-element check: bitwise-equal all-finite trajectories,
identical skip/give-up behavior on NaN/Inf injections, and an opt_state
pytree that restores interchangeably (same ApplyIfFiniteState layout —
the checkpoint-compat property the r4->r5 restore shim protects).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tsue_tpu.train.guard import apply_if_finite_fast, clipped_apply_if_finite


def _make_pair(max_errors=3):
    inner = optax.chain(optax.clip_by_global_norm(1.0),
                        optax.adamw(5e-4, weight_decay=1e-4))
    return (optax.apply_if_finite(inner, max_errors),
            apply_if_finite_fast(
                optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(5e-4, weight_decay=1e-4)),
                max_errors))


def _params(seed=0):
    k = jax.random.key(seed)
    ka, kb = jax.random.split(k)
    return {"w": jax.random.normal(ka, (8, 16), jnp.float32),
            "b": jax.random.normal(kb, (16,), jnp.float32) * 0.1,
            "h": jax.random.normal(kb, (4, 4), jnp.bfloat16)}


def _grad_like(params, seed):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(100 + seed), len(leaves))
    return jax.tree_util.tree_unflatten(treedef, [
        jax.random.normal(kk, x.shape, x.dtype) for kk, x in
        zip(keys, leaves)])


def test_state_pytree_structure_identical():
    ref, fast = _make_pair()
    p = _params()
    s_ref, s_fast = ref.init(p), fast.init(p)
    assert (jax.tree_util.tree_structure(s_ref)
            == jax.tree_util.tree_structure(s_fast))
    for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                    jax.tree_util.tree_leaves(s_fast)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_all_finite_trajectory_bitwise():
    ref, fast = _make_pair()
    p_ref = p_fast = _params()
    s_ref, s_fast = ref.init(p_ref), fast.init(p_fast)
    for i in range(5):
        g = _grad_like(p_ref, i)
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_fast, s_fast = fast.update(g, s_fast, p_fast)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fast = optax.apply_updates(p_fast, u_fast)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_fast)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(s_fast.last_finite)
    assert int(s_fast.total_notfinite) == 0


@pytest.mark.parametrize("bad", [jnp.nan, jnp.inf, -jnp.inf])
def test_nonfinite_skips_identically(bad):
    ref, fast = _make_pair()
    p = _params()
    s_ref, s_fast = ref.init(p), fast.init(p)
    g = _grad_like(p, 0)
    g_bad = dict(g)
    g_bad["w"] = g["w"].at[3, 7].set(bad)
    u_ref, s_ref = ref.update(g_bad, s_ref, p)
    u_fast, s_fast = fast.update(g_bad, s_fast, p)
    for u in (u_ref, u_fast):                    # rejected -> zero updates
        assert all(float(jnp.abs(x).max()) == 0.0
                   for x in jax.tree_util.tree_leaves(u))
    for s in (s_ref, s_fast):
        assert not bool(s.last_finite)
        assert int(s.notfinite_count) == 1
        assert int(s.total_notfinite) == 1
    # bf16 leaf carries the non-finite value
    g_bad2 = dict(g)
    g_bad2["h"] = g["h"].at[0, 0].set(bad)
    _, s_fast2 = fast.update(g_bad2, fast.init(p), p)
    assert not bool(s_fast2.last_finite)


def test_gives_up_after_max_consecutive_errors():
    ref, fast = _make_pair(max_errors=2)
    p = _params()
    s_ref, s_fast = ref.init(p), fast.init(p)
    g = _grad_like(p, 0)
    g_bad = dict(g)
    g_bad["b"] = g["b"].at[0].set(jnp.nan)
    for i in range(4):
        u_ref, s_ref = ref.update(g_bad, s_ref, p)
        u_fast, s_fast = fast.update(g_bad, s_fast, p)
        assert int(s_fast.notfinite_count) == int(s_ref.notfinite_count)
        ref_zero = all(float(jnp.abs(x).max() if x.size else 0.0) == 0.0
                       for x in jax.tree_util.tree_leaves(u_ref)
                       if jnp.issubdtype(x.dtype, jnp.inexact))
        fast_zero = all(float(jnp.abs(x).max() if x.size else 0.0) == 0.0
                        for x in jax.tree_util.tree_leaves(u_fast)
                        if jnp.issubdtype(x.dtype, jnp.inexact))
        assert ref_zero == fast_zero
    # after the limit both accept (NaN flows through, matching optax)
    assert not fast_zero


def test_recovery_resets_count():
    _, fast = _make_pair(max_errors=5)
    p = _params()
    s = fast.init(p)
    g = _grad_like(p, 0)
    g_bad = dict(g)
    g_bad["w"] = g["w"].at[0, 0].set(jnp.inf)
    _, s = fast.update(g_bad, s, p)
    assert int(s.notfinite_count) == 1
    _, s = fast.update(g, s, p)
    assert int(s.notfinite_count) == 0
    assert bool(s.last_finite)
    assert int(s.total_notfinite) == 1


def test_states_restore_interchangeably():
    """An opt_state from the optax wrapper drops into the fast one."""
    ref, fast = _make_pair()
    p = _params()
    s_ref = ref.init(p)
    g = _grad_like(p, 1)
    u1, s1 = ref.update(g, s_ref, p)
    # hand the optax-produced state to the fast update (restore path)
    u2, s2 = fast.update(_grad_like(p, 2), s1, p)
    assert bool(s2.last_finite)
    assert (jax.tree_util.tree_structure(s2)
            == jax.tree_util.tree_structure(s1))


# ---------------------------------------------------------------------------
# clipped_apply_if_finite: probe == clip's global norm, one fused pass
# ---------------------------------------------------------------------------

def _make_fused_pair(max_errors=3, clip=1.0):
    ref = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(clip),
                    optax.adamw(5e-4, weight_decay=1e-4)), max_errors)
    fused = clipped_apply_if_finite(
        clip, optax.adamw(5e-4, weight_decay=1e-4), max_errors)
    return ref, fused


def test_fused_state_pytree_structure_identical():
    """identity() stands in for the removed clip stage, so opt_states
    from apply_if_finite(chain(clip, adamw)) checkpoints restore."""
    ref, fused = _make_fused_pair()
    p = _params()
    s_ref, s_fused = ref.init(p), fused.init(p)
    assert (jax.tree_util.tree_structure(s_ref)
            == jax.tree_util.tree_structure(s_fused))
    for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                    jax.tree_util.tree_leaves(s_fused)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.parametrize("scale", [1.0, 1e-3, 50.0])
def test_fused_all_finite_trajectory(scale):
    """Below the clip threshold (scale=1e-3) the fused guard+clip is
    BITWISE optax's unfused chain (clip is identity, nothing recomputed).
    Above it, the formula is identical but the shared global-norm
    reduction compiles outside the lax.cond (that sharing is the whole
    point) while optax's compiles inside the branch — reduction order
    may differ in the last ulp, so allow <=1e-5 relative."""
    ref, fused = _make_fused_pair()
    p_ref = p_fused = _params()
    s_ref, s_fused = ref.init(p_ref), fused.init(p_fused)
    for i in range(5):
        g = jax.tree_util.tree_map(
            lambda x: (x * scale).astype(x.dtype), _grad_like(p_ref, i))
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_fused, s_fused = fused.update(g, s_fused, p_fused)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fused = optax.apply_updates(p_fused, u_fused)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_fused)):
            if scale == 1e-3:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            else:
                np.testing.assert_allclose(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    rtol=1e-5, atol=1e-7)
    assert bool(s_fused.last_finite)
    assert int(s_fused.total_notfinite) == 0


@pytest.mark.parametrize("bad", [jnp.nan, jnp.inf, -jnp.inf])
def test_fused_nonfinite_skips_identically(bad):
    ref, fused = _make_fused_pair()
    p = _params()
    s_ref, s_fused = ref.init(p), fused.init(p)
    g = _grad_like(p, 0)
    g_bad = dict(g)
    g_bad["w"] = g["w"].at[3, 7].set(bad)
    u_ref, s_ref = ref.update(g_bad, s_ref, p)
    u_fused, s_fused = fused.update(g_bad, s_fused, p)
    for u in (u_ref, u_fused):
        assert all(float(jnp.abs(x).max()) == 0.0
                   for x in jax.tree_util.tree_leaves(u))
    for s in (s_ref, s_fused):
        assert not bool(s.last_finite)
        assert int(s.notfinite_count) == 1
    # bf16 leaf carries it
    g_bad2 = dict(g)
    g_bad2["h"] = g["h"].at[0, 0].set(bad)
    _, s2 = fused.update(g_bad2, fused.init(p), p)
    assert not bool(s2.last_finite)


def test_fused_gives_up_and_recovers():
    ref, fused = _make_fused_pair(max_errors=2)
    p = _params()
    s_ref, s_fused = ref.init(p), fused.init(p)
    g = _grad_like(p, 0)
    g_bad = dict(g)
    g_bad["b"] = g["b"].at[0].set(jnp.nan)
    for _ in range(4):
        _, s_ref = ref.update(g_bad, s_ref, p)
        _, s_fused = fused.update(g_bad, s_fused, p)
        assert int(s_fused.notfinite_count) == int(s_ref.notfinite_count)
    # recovery resets the count
    _, s_fused = fused.update(g, fused.init(p), p)
    assert int(s_fused.notfinite_count) == 0


def test_fused_restores_from_unfused_checkpoint():
    """An opt_state produced by apply_if_finite(chain(clip, adamw))
    drops straight into the fused transform (the checkpoint-compat
    property the docstring promises)."""
    ref, fused = _make_fused_pair()
    p = _params()
    _, s1 = ref.update(_grad_like(p, 1), ref.init(p), p)
    u2, s2 = fused.update(_grad_like(p, 2), s1, p)
    assert bool(s2.last_finite)
    assert (jax.tree_util.tree_structure(s2)
            == jax.tree_util.tree_structure(s1))
    # and the update it produces matches the unfused one from same state
    u2r, _ = ref.update(_grad_like(p, 2), s1, p)
    for a, b in zip(jax.tree_util.tree_leaves(u2r),
                    jax.tree_util.tree_leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nan_propagates_through_max():
    """The probe's correctness rests on XLA maximum propagating NaN."""
    x = jnp.array([1.0, jnp.nan, 2.0], jnp.float32)
    assert not bool(jnp.isfinite(jnp.max(jnp.abs(x))))
    y = jnp.array([[1.0, -jnp.inf]], jnp.bfloat16)
    assert not bool(jnp.isfinite(jnp.max(jnp.abs(y.astype(jnp.float32)))))
