"""Checkpointing: Orbax-backed save/restore + stage-1 -> stage-2 handoff.

The reference saves bare ``state_dict`` files on val improvement with no
optimizer state or step (ref scripts/train.py:1219-1224) and hand-remaps
keys for the no-LoRA ablation (ref scripts/ablation_study_without_lora.py:
1070-1084).  Here:

- full train state (params + opt_state + step) via orbax, async-capable;
- ``save_best`` keeps the best-val params exactly like the reference's
  best-ckpt protocol, but rank-safe (process 0 writes, all processes agree
  on the metric because the split/loss are seeded);
- ``export_mllm`` / ``import_mllm`` implement the stage-1 -> stage-2
  artifact handoff (ref mllm_lora_ddp_finetuned.pt consumed at
  scripts/train.py:1137-1138, strict=True);
- ``strip_lora`` drops lora_* leaves for loading LoRA checkpoints into
  no-LoRA models (the reference's key-stripping loader).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

from flax import traverse_util


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_pytree(path: str, tree: Any):
    """Save a pytree (params or full state) to ``path`` (absolute dir).

    COLLECTIVE in multi-process runs: every process must call it with the
    same path/decision.  Orbax's save performs internal cross-process
    syncs (single-writer coordination), so a process-0-only call leaves
    the other processes' collective streams misaligned — the next barrier
    pairs with orbax's internal sync and fails with a name mismatch
    (reproduced in tests/test_two_process.py's probe scenario)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        import shutil
        # racing removals across same-host processes are fine: orbax's
        # pre-save barrier below keeps anyone from writing early
        shutil.rmtree(path, ignore_errors=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"save_pytree:{path}")
    ckptr = _checkpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree))
    ckptr.wait_until_finished()


def restore_pytree(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (same structure) restores types/shapes."""
    ckptr = _checkpointer()
    if target is not None:
        target = jax.tree.map(np.asarray, target)
        return ckptr.restore(os.path.abspath(path), target=target)
    return ckptr.restore(os.path.abspath(path))


def checkpoint_tree_shapes(path: str) -> dict:
    """Flat key-path -> stored shape for an on-disk checkpoint (orbax
    metadata — no tensor reads)."""
    meta = _checkpointer().metadata(os.path.abspath(path))
    # orbax >= 0.6: StepMetadata.item_metadata.tree; older: the tree itself
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
    return {k: tuple(getattr(v, "shape", ()) or ())
            for k, v in traverse_util.flatten_dict(tree).items()}


def restore_merge(path: str, target: Any) -> Any:
    """Restore a checkpoint holding the full ``target`` tree OR any leaf
    subset of it, merging restored leaves over ``target``.

    Frozen-regime best checkpoints deliberately store only the trainable
    subtree (``BestCheckpointer._subset``); the eval CLIs
    (scripts/test.py, test_10.py, capstone.py — ref scripts/test.py:
    1273-1276 load-best-then-test flow) don't know which regime produced
    the artifact they are pointed at, so the on-disk structure is read
    from checkpoint metadata and intersected with ``target``.  Keys on
    disk that don't exist in ``target``, or whose stored shape differs
    (e.g. an 18->30 forecaster checkpoint evaluated under an 18->18
    preset), raise with the offending paths — the moral equivalent of the
    reference's strict=True load (ref scripts/train.py:1137-1138)."""
    shapes = checkpoint_tree_shapes(path)
    tgt = traverse_util.flatten_dict(jax.tree.map(np.asarray, target))
    extra = set(shapes) - set(tgt)
    if extra:
        raise ValueError(
            f"checkpoint {path} holds {len(extra)} keys absent from the "
            f"model tree (e.g. {sorted(extra)[:3]}); wrong preset/model "
            "config for this artifact?")
    bad = [(k, shapes[k], tuple(np.shape(tgt[k])))
           for k in shapes if shapes[k] != tuple(np.shape(tgt[k]))]
    if bad:
        k, s_ck, s_tg = bad[0]
        raise ValueError(
            f"checkpoint {path}: {len(bad)} leaves have mismatched shapes "
            f"(e.g. {'/'.join(map(str, k))}: stored {s_ck} vs model {s_tg})"
            " — was the checkpoint trained under a different preset/"
            "horizon?  Pass the training preset (e.g. --preset "
            "train_18_30) to the eval CLI.")
    sub = {k: tgt[k] for k in shapes}
    restored = restore_pytree(path,
                              target=traverse_util.unflatten_dict(sub))
    tgt.update(traverse_util.flatten_dict(restored))
    return traverse_util.unflatten_dict(tgt)


class BestCheckpointer:
    """Best-val checkpoint protocol (ref scripts/train.py:1219-1224).

    ``maybe_save`` is collective (all processes call; orbax writes from
    the primary host).  On multi-host runs without a shared filesystem,
    callers must restore from an in-memory copy instead of
    ``restore_best`` (tsue_tpu.runner does this automatically).

    ``trainable_filter(path_strs) -> bool`` restricts the artifact to the
    trainable subtree: in the frozen-MLLM regime the 1.3B frozen params
    never change, so saving them on every val improvement is pure waste
    (device->host transfer of ~4 GB per save; measured ~minutes through a
    remote-tunnel TPU).  ``restore_best`` then merges the saved subset
    over the caller's target tree.
    """

    def __init__(self, directory: str, trainable_filter=None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.best_val = float("inf")
        self.trainable_filter = trainable_filter

    @property
    def best_path(self):
        return os.path.join(self.directory, "best")

    def _subset(self, params):
        return _trainable_subset(params, self.trainable_filter)

    def maybe_save(self, val_loss: float, params) -> bool:
        import math
        if not math.isfinite(val_loss) or val_loss >= self.best_val:
            return False
        self.best_val = val_loss
        # collective: every process calls (the val metric is a replicated
        # SPMD scalar so the decision agrees); orbax writes from the
        # primary host only, and its internal syncs need all processes
        # participating — see save_pytree
        save_pytree(self.best_path, self._subset(params))
        return True

    def restore_best(self, target=None):
        """Restore; with a trainable_filter, merge the subset over target."""
        if self.trainable_filter is None:
            return restore_pytree(self.best_path, target)
        sub_target = self._subset(target)
        restored = restore_pytree(self.best_path, target=sub_target)
        merged = traverse_util.flatten_dict(target)
        merged.update(traverse_util.flatten_dict(restored))
        return traverse_util.unflatten_dict(merged)


# ---------------------------------------------------------------------------
# Full train-state save/resume (params + opt_state + step)
# ---------------------------------------------------------------------------

def _trainable_subset(params, trainable_filter):
    if trainable_filter is None:
        return params
    flat = traverse_util.flatten_dict(params)
    kept = {k: v for k, v in flat.items()
            if trainable_filter(tuple(str(p) for p in k))}
    return traverse_util.unflatten_dict(kept)


def save_train_state(path: str, state, *, epoch: int = 0,
                     best_val: float = float("inf"), trainable_filter=None):
    """Persist a TrainState for exact resume (the reference never saves
    optimizer state or step — SURVEY.md §5 checkpoint gaps).

    - ``epoch``/``best_val`` ride INSIDE the orbax tree, atomic with its
      commit, so a crash can never leave state and loop-progress metadata
      disagreeing (no sidecar file).
    - ``trainable_filter`` restricts the stored params to the trainable
      subtree: in the frozen-MLLM regime the 1.3B frozen leaves never
      change and are rebuilt deterministically at restore time, so
      persisting them per save is minutes of device->host transfer for
      zero information (same contract as ``BestCheckpointer``).  The
      opt_state is stored whole — frozen leaves under
      ``optax.multi_transform`` are empty ``MaskedNode``s.
    - the save is crash-safe: orbax finalizes into ``path + ".tmp"``
      (itself atomic via orbax's rename commit), then the previous good
      state is swapped out via renames; ``train_state_path`` falls back
      to the ``.old`` survivor if a crash lands mid-swap, so the last
      durable checkpoint is never destroyed by a failed save."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    save_pytree(tmp, {"step": np.asarray(state.step),
                      "params": _trainable_subset(state.params,
                                                  trainable_filter),
                      "opt_state": state.opt_state,
                      "extra": {"epoch": np.asarray(int(epoch)),
                                "best_val": np.asarray(float(best_val))}})
    if jax.process_index() == 0:
        import shutil
        old = path + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"swap_train_state:{path}")


def train_state_path(path: str) -> Optional[str]:
    """Resolve the live train-state dir; fall back to the ``.old`` swap
    survivor a crash mid-``save_train_state`` can leave behind."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        return path
    if os.path.exists(path + ".old"):
        return path + ".old"
    return None


def _legacy_guard_outer(opt_state):
    """Pre-r4 opt_state layout shim (round-trip pair with
    ``_modernize_opt_state``).

    r4 moved ``optax.apply_if_finite`` INSIDE the multi_transform "train"
    branch (train/trainer.py + train/stage1.py — the frozen-dW DCE fix,
    scripts/ab_frozen_dce.py), which changed the opt_state pytree from
    ``ApplyIfFiniteState(inner=PartitionState({train, freeze}))`` to
    ``PartitionState({train: ApplyIfFiniteState(inner), freeze})``.
    Checkpoints saved before that change restore against the OLD
    structure; this builds the old-layout template from a new-layout
    one.  Returns None when the template is not the guarded-multi-
    transform shape (custom optimizers: no migration path applies)."""
    import optax
    inner_states = getattr(opt_state, "inner_states", None)
    if not isinstance(inner_states, dict) or "train" not in inner_states:
        return None
    masked = inner_states["train"]          # multi_transform's MaskedState
    guard = getattr(masked, "inner_state", None)
    if not isinstance(guard, optax.ApplyIfFiniteState):
        return None
    legacy_part = opt_state._replace(
        inner_states={**inner_states,
                      "train": masked._replace(
                          inner_state=guard.inner_state)})
    return guard._replace(inner_state=legacy_part)


def _modernize_opt_state(legacy, template):
    """Rewrap a restored pre-r4 (guard-outer) opt_state into the current
    (guard-inside-train-branch) layout — inverse of
    ``_legacy_guard_outer``.  Optimizer moments and guard counters are
    preserved exactly; resume continues where the old run stopped."""
    part = legacy.inner_state
    old_masked = part.inner_states["train"]
    new_guard = template.inner_states["train"].inner_state._replace(
        notfinite_count=legacy.notfinite_count,
        last_finite=legacy.last_finite,
        total_notfinite=legacy.total_notfinite,
        inner_state=old_masked.inner_state)
    return part._replace(
        inner_states={**part.inner_states,
                      "train": old_masked._replace(
                          inner_state=new_guard)})


def restore_train_state(path: str, state, *, trainable_filter=None):
    """Restore into an existing TrainState template (same tx/apply_fn).

    Returns ``(state, extra)`` with ``extra = {"epoch", "best_val"}`` as
    saved by ``save_train_state``.  ``trainable_filter`` must match the
    one used at save time; restored trainable leaves are merged over the
    template's (deterministically rebuilt) frozen subtree.  Checkpoints
    written before the r4 NaN-guard relocation restore through the
    ``_legacy_guard_outer`` shim (moments preserved)."""
    resolved = train_state_path(path)
    if resolved is None:
        raise FileNotFoundError(f"no train state at {path} (or .old)")
    target = {"step": np.asarray(state.step),
              "params": _trainable_subset(state.params, trainable_filter),
              "opt_state": state.opt_state,
              "extra": {"epoch": np.asarray(0),
                        "best_val": np.asarray(float("inf"))}}
    try:
        tree = restore_pytree(resolved, target=target)
    except Exception:
        legacy_opt = _legacy_guard_outer(state.opt_state)
        if legacy_opt is None:
            raise
        tree = restore_pytree(resolved,
                              target={**target, "opt_state": legacy_opt})
        tree["opt_state"] = _modernize_opt_state(tree["opt_state"],
                                                 state.opt_state)
    if trainable_filter is None:
        params = tree["params"]
    else:
        merged = traverse_util.flatten_dict(state.params)
        merged.update(traverse_util.flatten_dict(tree["params"]))
        params = traverse_util.unflatten_dict(merged)
    new = state.replace(step=jnp_asarray(tree["step"]), params=params,
                        opt_state=tree["opt_state"])
    return new, {"epoch": int(tree["extra"]["epoch"]),
                 "best_val": float(tree["extra"]["best_val"])}


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


# ---------------------------------------------------------------------------
# Stage handoff + LoRA surgery
# ---------------------------------------------------------------------------

def export_mllm(params: Any, path: str):
    """Save the mllm subtree (stage-1 artifact, ref train.py:1137)."""
    save_pytree(path, params["mllm"])


def import_mllm(params: Any, path: str) -> Any:
    """Load a stage-1 mllm checkpoint into a full model tree (strict:
    structures must match, like the reference's strict=True)."""
    mllm = restore_pytree(path, target=params["mllm"])
    new = dict(params)
    new["mllm"] = mllm
    return new


def strip_lora(params: Any) -> Any:
    """Drop lora_a/lora_b leaves (no-LoRA ablation loader,
    ref ablation_study_without_lora.py:1070-1084)."""
    flat = traverse_util.flatten_dict(params)
    kept = {k: v for k, v in flat.items()
            if not any(p in ("lora_a", "lora_b") for p in k)}
    return traverse_util.unflatten_dict(kept)
