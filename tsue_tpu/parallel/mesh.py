"""Device mesh + sharding utilities.

The reference's distributed runtime is torchrun + DDP/NCCL with
DistributedSampler (ref scripts/train.py:1044-1049, 1092-1098,1127-1132).
The TPU-native equivalent: a ``jax.sharding.Mesh`` over all devices with a
``data`` axis (pure DP, like the reference) and an optional ``model`` axis
for tensor-parallel Llama; batches sharded over ``data`` via NamedSharding;
gradient all-reduce is implicit in jit'ed mean-loss differentiation (XLA
inserts psum over ICI — no NCCL calls to port).

Works identically on 1 real TPU chip, an 8-device virtual CPU mesh
(tests), or a pod slice (multi-process).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(model_parallel: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"model_parallel={model_parallel} must divide "
                         f"device count {n}")
    dp = n // model_parallel
    arr = np.asarray(devices).reshape(dp, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a (per-process) host batch onto the mesh, sharded over data.

    Single-process: device_put with NamedSharding. Multi-process: each
    process contributes its local shard of the global batch
    (make_array_from_process_local_data handles DCN layouts).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state in pure DP)."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)


def is_primary() -> bool:
    """Rank-0 gating (ref ``local_rank==0``, scripts/train.py:1219)."""
    return jax.process_index() == 0


_DIST_ENV_KEYS = ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")

# Cloud-TPU-VM device nodes: their presence means libtpu drives real local
# chips, where jax.distributed.initialize() autodetects the coordinator via
# the TPU metadata server (no env vars are set on plain GCE pods) and is a
# safe no-op-equivalent on a single host (process_count stays 1).
_TPU_DEVICE_GLOBS = ("/dev/accel*", "/dev/vfio/*")


def _on_tpu_vm() -> bool:
    import glob
    return any(glob.glob(g) for g in _TPU_DEVICE_GLOBS)


def initialize_distributed() -> bool:
    """Multi-host init (replaces torchrun + dist.init_process_group,
    ref scripts/train.py:1044-1049).  Called by every CLI via
    scripts/_common.py before first device use.

    The attempt is made when (a) TSUE_DISTRIBUTED=1 forces it (failure
    raises — a pod run that silently degrades to independent single-host
    jobs trains garbage), (b) a coordinator env var is present, or (c) the
    host is a real TPU VM (GCE pods set NO env vars; JAX autodetects the
    coordinator from the TPU metadata server).  TSUE_DISTRIBUTED=0 disables
    everything.  Probing ``jax.process_count()`` instead would initialize
    the backend and break ``jax.distributed.initialize``, which must run
    first — hence env/device detection, not backend probing."""
    import os
    forced = os.environ.get("TSUE_DISTRIBUTED")
    if forced == "0":
        return False
    if not (forced == "1" or any(os.environ.get(k) for k in _DIST_ENV_KEYS)
            or _on_tpu_vm()):
        return False
    try:
        jax.distributed.initialize()
        return True
    except Exception as e:
        if forced == "1":
            raise RuntimeError(
                "TSUE_DISTRIBUTED=1 but jax.distributed.initialize() "
                "failed; refusing to continue as a silent single-host "
                f"job: {e}") from e
        # already initialized, or single-host autodetection unavailable
        import warnings
        warnings.warn(f"jax.distributed.initialize() not used: {e}")
        return False


def barrier(name: str = "barrier"):
    """Cross-process sync (ref dist.barrier, check_generation.py:369)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)
