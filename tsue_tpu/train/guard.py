"""Non-finite-gradient guard reformulations — MEASURED A WASH; not wired.

Two drop-ins for ``optax.apply_if_finite`` (ref skip-bad-step semantics,
ref modify_scripts/modify_train.py:1188-1194), built against the r5
joint-step profile which showed the guard's per-leaf
``all(isfinite(leaf))`` checks costing **96 ms of the 521 ms joint-step
device time (466 is-finite_reduce_fusion ops)**.  Both were measured
interleaved on the real chip (scripts/ab_guard.py) and neither wins:
optax 537.8 / max-|x| probe 537.8 / clip-norm-shared probe 535.8 ms per
joint step, no-guard ceiling 517.1 — the entire guard is a 3.9%
wall-clock item and its device-time bucket is name-for-name invariant
under reformulation (abs_reduce_fusion 95.91 ms vs
is-finite_reduce_fusion 96.02 ms).  Full post-mortem: PARITY.md "Joint
train-step profile".  The trainers keep ``optax.apply_if_finite``; this
module is retained as the measured evidence + A/B arms, and because
both transforms are exact drop-ins should a larger-tree regime ever
make the trade worth re-measuring.

``apply_if_finite_fast`` probes ``max(|leaf|)`` per leaf and one
``isfinite`` on the scalar maximum.  Detection is EXACTLY equivalent,
not approximately: XLA's ``maximum`` propagates NaN (IEEE 754-2019
maximum semantics, pinned by test), so ``max over leaves of max(|x|)``
is finite iff every element of every inexact leaf is finite — no
cancellation or overflow caveat (unlike a sum probe, |x| maxima never
combine values).  The update path, the state pytree (optax's own
``ApplyIfFiniteState``) and the give-up-after-``max_consecutive_errors``
behavior are identical, so checkpointed opt_states restore
interchangeably and the all-finite trajectory is bitwise the optax one
(tests/test_guard.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax


def _finite_probe(flat_updates) -> jnp.ndarray:
    """Scalar f32 max of |x| over every inexact leaf (NaN-propagating);
    -inf (finite trivially true) when there is nothing to check."""
    maxima = [jnp.max(jnp.abs(u.astype(jnp.float32)))
              for u in flat_updates
              if jnp.issubdtype(u.dtype, jnp.inexact) and u.size]
    if not maxima:
        return jnp.float32(0.0)
    probe = maxima[0]
    for m in maxima[1:]:
        probe = jnp.maximum(probe, m)
    return probe


def apply_if_finite_fast(
    inner: optax.GradientTransformation, max_consecutive_errors: int
) -> optax.GradientTransformationExtraArgs:
    """``optax.apply_if_finite`` with the max-|x| finiteness probe."""
    inner = optax.with_extra_args_support(inner)

    def init(params):
        return optax.ApplyIfFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            last_finite=jnp.array(True, jnp.bool_),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def update(updates, state, params=None, **extra_args):
        inner_state = state.inner_state
        isfinite = jnp.isfinite(
            _finite_probe(jax.tree_util.tree_leaves(updates)))
        notfinite_count = jnp.where(
            isfinite, jnp.zeros([], jnp.int32),
            optax.safe_increment(state.notfinite_count))

        def do_update(_):
            return inner.update(updates, inner_state, params, **extra_args)

        def reject_update(_):
            return jax.tree_util.tree_map(jnp.zeros_like,
                                          updates), inner_state

        new_updates, new_inner_state = lax.cond(
            jnp.logical_or(isfinite,
                           notfinite_count > max_consecutive_errors),
            do_update, reject_update, operand=None)

        return new_updates, optax.ApplyIfFiniteState(
            notfinite_count=notfinite_count,
            last_finite=isfinite,
            total_notfinite=jnp.where(
                isfinite, state.total_notfinite,
                optax.safe_increment(state.total_notfinite)),
            inner_state=new_inner_state,
        )

    return optax.GradientTransformationExtraArgs(init=init, update=update)


def clipped_apply_if_finite(
    clip_norm: float, inner: optax.GradientTransformation,
    max_consecutive_errors: int,
) -> optax.GradientTransformationExtraArgs:
    """Fused ``clip_by_global_norm(clip_norm)`` + ``apply_if_finite``:
    the finiteness probe IS the clip's global norm.  Measured 1.004× vs
    the optax guard (within session noise) — see the module docstring;
    kept as an A/B arm, not wired into the trainers.

    Design rationale (why sharing the reduction *should* have won): the
    r5 profiles showed any standalone reduce pass over the full joint
    gradient tree (466 leaves) costs ~96 ms device time whether it is
    ``isfinite``-all or ``max|x|`` (is-finite_reduce_fusion 96.02 ms vs
    abs_reduce_fusion 95.91 ms, identical totals), while the clip's own
    sum-of-squares reduces cost 3.4 ms because XLA fuses ONE reduce
    consumer into each backward producer fusion — a second pass over
    already-consumed gradients cannot fuse.  So guard and clip share one
    reduction here: ``isfinite(global_norm)`` detects every NaN/Inf
    (both propagate through sum-of-squares; finite values cannot produce
    them short of f32 overflow at |g| > 1.8e19, where the step is
    garbage and skipping is correct) and the clip scaling reuses the
    same norm via CSE.  It still measured flat because the guard's
    device-time bucket is mostly NOT on the step's critical path (the
    no-guard ceiling reclaims only 20.7 ms of it — PARITY.md).

    State layout: ``ApplyIfFiniteState(inner_state=(EmptyState, inner
    state...))`` — the leading ``optax.identity()`` stands in for the
    removed clip stage so the pytree structure stays byte-identical to
    ``apply_if_finite(chain(clip_by_global_norm, inner))`` checkpoints.

    All-finite numerics: bitwise the unfused chain's while the clip is
    inactive; when it triggers, the clip update replicates optax's
    formula (``lax.select(g_norm < max_norm, t, (t / g_norm) *
    max_norm)``) on the identically-computed ``optax.global_norm``
    value, but that value compiles OUTSIDE the lax.cond (the sharing is
    the point) vs optax's inside-the-branch copy, so reduction order may
    differ in the last ulp (<=1e-5 relative, tests/test_guard.py).
    """
    chained = optax.with_extra_args_support(
        optax.chain(optax.identity(), inner))

    def init(params):
        return optax.ApplyIfFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            last_finite=jnp.array(True, jnp.bool_),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=chained.init(params),
        )

    def update(updates, state, params=None, **extra_args):
        inner_state = state.inner_state
        g_norm = optax.global_norm(updates)
        isfinite = jnp.isfinite(g_norm)
        notfinite_count = jnp.where(
            isfinite, jnp.zeros([], jnp.int32),
            optax.safe_increment(state.notfinite_count))

        def do_update(_):
            trigger = jnp.squeeze(g_norm < clip_norm)

            def clip_fn(t):
                return lax.select(
                    trigger, t,
                    (t / g_norm.astype(t.dtype)) * jnp.asarray(
                        clip_norm, t.dtype))

            clipped = jax.tree_util.tree_map(clip_fn, updates)
            return chained.update(clipped, inner_state, params,
                                  **extra_args)

        def reject_update(_):
            return jax.tree_util.tree_map(jnp.zeros_like,
                                          updates), inner_state

        new_updates, new_inner_state = lax.cond(
            jnp.logical_or(isfinite,
                           notfinite_count > max_consecutive_errors),
            do_update, reject_update, operand=None)

        return new_updates, optax.ApplyIfFiniteState(
            notfinite_count=notfinite_count,
            last_finite=isfinite,
            total_notfinite=jnp.where(
                isfinite, state.total_notfinite,
                optax.safe_increment(state.total_notfinite)),
            inner_state=new_inner_state,
        )

    return optax.GradientTransformationExtraArgs(init=init, update=update)
