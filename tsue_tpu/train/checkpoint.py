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
        if self.trainable_filter is None:
            return params
        flat = traverse_util.flatten_dict(params)
        kept = {k: v for k, v in flat.items()
                if self.trainable_filter(tuple(str(p) for p in k))}
        return traverse_util.unflatten_dict(kept)

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

def save_train_state(path: str, state):
    """Persist a TrainState for exact resume (the reference never saves
    optimizer state or step — SURVEY.md §5 checkpoint gaps)."""
    save_pytree(path, {"step": np.asarray(state.step),
                       "params": state.params,
                       "opt_state": state.opt_state})


def restore_train_state(path: str, state):
    """Restore into an existing TrainState template (same tx/apply_fn)."""
    target = {"step": np.asarray(state.step), "params": state.params,
              "opt_state": state.opt_state}
    tree = restore_pytree(path, target=target)
    return state.replace(step=jnp_asarray(tree["step"]),
                         params=tree["params"],
                         opt_state=tree["opt_state"])


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
