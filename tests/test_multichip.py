"""Multi-device correctness on the 8-device virtual CPU mesh (conftest).

SURVEY.md §4 prescribes exercising pjit sharding without TPUs; the reference
capability being covered is the DDP runtime (grad all-reduce, ref
scripts/train.py:1044-1049,1127-1132) and the multihost eval gather (ref
scripts/check_generation.py:359-369).

- dp-only and dp×tp one-step equivalence vs a single device (same batch,
  same rng → same loss and updated params, up to reduction-order noise);
- TP partition-spec sanity for every Llama param;
- the process_allgather eval-gather path;
- the driver-facing dryrun entry, in-process (conftest already provisions
  the mesh) — the subprocess re-exec path is what the driver exercises.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import __graft_entry__ as graft
from tsue_tpu.parallel.mesh import make_mesh, shard_batch
from tsue_tpu.parallel.sharding import param_spec, shard_params, tree_shardings
from tsue_tpu.train.trainer import TrainState, make_train_step


def _tiny_setup(batch_size=8):
    from tsue_tpu.models.tsue import TrajectoryModel
    cfg = graft._flagship_cfg(vocab_size=384, tiny=True)
    model = TrajectoryModel(cfg.model, cfg.data.seq_len, cfg.data.out_len)
    batch = graft._make_batch(cfg, batch_size)
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, batch, False)

    def apply_fn(vs, b, det, rngs=None, **kw):
        return model.apply(vs, b, det, rngs=rngs, **kw)

    return cfg, model, apply_fn, variables["params"], batch


def _one_step(cfg, apply_fn, params, batch):
    """One train step with a plain-SGD transform: the updated params are
    then an affine function of the gradients, so single-vs-multi-device
    equality tests exactly the grad all-reduce (Adam would amplify
    reduction-order noise on near-zero grads into sign flips; the full
    make_optimizer path is covered by the dryrun test below)."""
    import optax
    state = TrainState.create(apply_fn, params, optax.sgd(1e-2))
    step = jax.jit(make_train_step(cfg))
    state, metrics = step(state, batch, jax.random.key(7))
    return float(metrics["loss"]), jax.device_get(state.params)


def _assert_updates_close(ref, other, orig, rel=1e-5):
    """Updated-param trees must agree to ``rel`` of the GLOBAL update scale.

    Elementwise rtol is wrong here: the synthetic denorm-MSE loss is ~5e5,
    so f32 reduction-order noise has an absolute floor set by the dominant
    gradient magnitudes — individual near-cancelling elements (e.g. biases)
    carry that same absolute noise.  Measured single-vs-8-device diffs are
    ~1e-7 of the max update; 1e-5 gives 100x headroom."""
    leaves_r, treedef_r = jax.tree_util.tree_flatten(ref)
    leaves_o, treedef_o = jax.tree_util.tree_flatten(other)
    leaves_0 = jax.tree_util.tree_leaves(orig)
    assert treedef_r == treedef_o
    scale = max(float(np.max(np.abs(np.asarray(lr) - np.asarray(l0))))
                for lr, l0 in zip(leaves_r, leaves_0))
    assert scale > 0, "step did not move any param"
    for lr, lo in zip(leaves_r, leaves_o):
        d = float(np.max(np.abs(np.asarray(lr) - np.asarray(lo))))
        assert d <= rel * scale + 1e-8, (d, rel * scale)


@pytest.fixture(scope="module")
def tiny():
    return _tiny_setup()


def test_eight_devices_available():
    assert len(jax.devices()) >= 8
    assert jax.devices()[0].platform == "cpu"


def test_dp_step_matches_single_device(tiny):
    cfg, model, apply_fn, params, batch = tiny
    # single-device reference (mesh of one device)
    ref_loss, ref_params = _one_step(cfg, apply_fn, params, batch)

    mesh = make_mesh(model_parallel=1)          # 8-way pure DP
    with mesh:
        p = jax.device_put(params, NamedSharding(mesh, P()))
        b = shard_batch(batch, mesh)
        dp_loss, dp_params = _one_step(cfg, apply_fn, p, b)

    assert np.isclose(ref_loss, dp_loss, rtol=1e-5), (ref_loss, dp_loss)
    _assert_updates_close(ref_params, dp_params, params)


def test_dp_tp_step_matches_single_device(tiny):
    cfg, model, apply_fn, params, batch = tiny
    ref_loss, ref_params = _one_step(cfg, apply_fn, params, batch)

    mesh = make_mesh(model_parallel=2)          # dp4 × tp2
    with mesh:
        p = shard_params(params, mesh)
        b = shard_batch(batch, mesh)
        tp_loss, tp_params = _one_step(cfg, apply_fn, p, b)

    assert np.isclose(ref_loss, tp_loss, rtol=1e-5), (ref_loss, tp_loss)
    _assert_updates_close(ref_params, tp_params, params)


def test_llama_param_specs_cover_tp_rules():
    """Every Llama projection gets its Megatron-style spec; tp=2 divides."""
    from tsue_tpu.config import LlamaConfig
    from tsue_tpu.models.llama import LlamaModel

    cfg = LlamaConfig.tiny()
    model = LlamaModel(cfg)
    ids = jnp.zeros((2, 8), jnp.int32)
    params = model.init({"params": jax.random.key(0)}, input_ids=ids,
                        attention_mask=jnp.ones_like(ids))["params"]
    mesh = make_mesh(model_parallel=2)
    shardings = tree_shardings(params, mesh)

    expected = {
        ("q_proj", "kernel"): P(None, "model"),
        ("k_proj", "kernel"): P(None, "model"),
        ("v_proj", "kernel"): P(None, "model"),
        ("o_proj", "kernel"): P("model", None),
        ("gate_proj", "kernel"): P(None, "model"),
        ("up_proj", "kernel"): P(None, "model"),
        ("down_proj", "kernel"): P("model", None),
        ("q_proj", "lora_b"): P(None, "model"),
        ("v_proj", "lora_b"): P(None, "model"),
        ("embed_tokens", "embedding"): P(None, "model"),
    }
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(shardings)
    seen = set()
    for (path, leaf), sh in zip(flat_p, flat_s):
        strs = tuple(str(getattr(p, "key", p)) for p in path)
        suffix = strs[-2:]
        want = expected.get(suffix, P())
        # spec as derived from the rules, pre-divisibility-fallback
        assert param_spec(strs, leaf.ndim) == want, (strs, sh.spec, want)
        if suffix in expected:
            seen.add(suffix)
            # tp=2 must actually divide these dims in the tiny config:
            # the rule should survive the divisibility guard
            assert sh.spec == want, (strs, sh.spec, want)
            for dim, axis in enumerate(want):
                if axis is not None:
                    assert leaf.shape[dim] % 2 == 0, (strs, leaf.shape)
    assert seen == set(expected), f"rules never matched: {set(expected)-seen}"


def test_fsdp_step_matches_single_device(tiny):
    """dp4 x tp2 with ZeRO-3-style FSDP param sharding: XLA must
    all-gather weights on use and reduce-scatter grads, with the same
    update as the single-device step.  min_size lowered so the tiny
    config's kernels actually shard."""
    cfg, model, apply_fn, params, batch = tiny
    ref_loss, ref_params = _one_step(cfg, apply_fn, params, batch)

    mesh = make_mesh(model_parallel=2)
    with mesh:
        p = shard_params(params, mesh, fsdp=True, fsdp_min_size=256)
        # engagement: at least one leaf must actually be data-sharded,
        # and its per-device footprint must shrink by the dp degree (the
        # point of ZeRO-3: each device holds 1/dp of the big params)
        n_fsdp = 0
        for leaf in jax.tree_util.tree_leaves(p):
            if any(a == "data" for a in leaf.sharding.spec):
                n_fsdp += 1
                shard_bytes = leaf.addressable_shards[0].data.nbytes
                assert shard_bytes * mesh.shape["data"] <= leaf.nbytes
        assert n_fsdp > 0
        b = shard_batch(batch, mesh)
        loss, new_params = _one_step(cfg, apply_fn, p, b)

    assert np.isclose(ref_loss, loss, rtol=1e-5), (ref_loss, loss)
    _assert_updates_close(ref_params, new_params, params)


def test_fsdp_spec_augmentation():
    """FSDP picks the largest free divisible dim; composes with TP; small
    params and non-divisible dims stay put."""
    from tsue_tpu.parallel.sharding import _fsdp_augment
    mesh = make_mesh(model_parallel=2)      # data=4, model=2
    with mesh:
        # TP'd gate kernel: model on dim 1 -> data goes to dim 0
        assert _fsdp_augment(P(None, "model"), (2048, 8192), mesh) \
            == P("data", "model")
        # plain 2-D kernel: largest dim gets data
        assert _fsdp_augment(P(), (512, 1024), mesh) == P(None, "data")
        # small param: untouched
        assert _fsdp_augment(P(), (64, 64), mesh) == P()
        # largest dim not divisible by 4 -> next one
        assert _fsdp_augment(P(), (1023, 512), mesh, min_size=1024) \
            == P(None, "data")
        # nothing divisible -> unchanged
        assert _fsdp_augment(P(), (1023, 513), mesh, min_size=1024) == P()


def test_shard_params_divisibility_fallback():
    """An axis tp doesn't divide must fall back to replication, not crash."""
    mesh = make_mesh(model_parallel=8)
    x = jnp.ones((4, 6))   # 6 % 8 != 0
    sharded = shard_params({"llama": {"q_proj": {"kernel": x}}}, mesh)
    sh = sharded["llama"]["q_proj"]["kernel"].sharding
    assert sh.spec == P()


def test_runner_tp_fsdp_smoke(tmp_path):
    """run_stage2 end-to-end with model_parallel=2 + fsdp=True: exercises
    the runner's shard_params placement wiring on the virtual mesh (the
    sharded-step math itself is pinned by the equivalence tests above)."""
    import dataclasses

    from test_runner_pipeline import _tiny_cfg
    from tsue_tpu.config import MeshConfig
    from tsue_tpu.runner import run_stage2

    cfg = dataclasses.replace(
        _tiny_cfg(), mesh=MeshConfig(model_parallel=2, fsdp=True))
    m = run_stage2(cfg, None, str(tmp_path), epochs=1, save_viz=False,
                   synthetic_tracks=8)
    assert np.isfinite(m["test_ade"]) and m["test_ade"] > 0


def test_process_allgather_eval_gather():
    """The eval gather path (generation.py:152-158).  Single-process, so the
    gather must be an identity-shaped no-op over mesh-sharded arrays."""
    from jax.experimental import multihost_utils
    rows = np.arange(64, dtype=np.int32).reshape(8, 8)
    out = multihost_utils.process_allgather(rows)
    np.testing.assert_array_equal(np.concatenate(np.atleast_3d(out))
                                  if out.ndim == 3 else out, rows)


def test_dryrun_multichip_inprocess():
    """conftest provisions 8 CPU devices, so the driver entry runs the
    in-process path end-to-end (the subprocess path is covered by the
    driver itself and by test_dryrun_subprocess_path)."""
    graft.dryrun_multichip(8)


def test_dryrun_asserts_when_too_few_devices():
    with pytest.raises(AssertionError):
        graft._dryrun_impl(1024)


def test_initialize_distributed_single_process_noop(monkeypatch):
    """CLI startup calls this (scripts/_common.py); without a multi-process
    environment it must return False without touching jax.distributed."""
    import pytest
    from tsue_tpu.parallel import mesh as M
    for k in M._COORD_ENV_KEYS + ("TPU_WORKER_HOSTNAMES",
                                  "TSUE_DISTRIBUTED"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setattr(M, "_on_tpu_vm", lambda: False)
    assert M.initialize_distributed() is False
    assert jax.process_count() == 1

    # falsy TSUE_DISTRIBUTED disables even when a coordinator env var is set
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    for off in ("0", "false", "NO", " off "):
        monkeypatch.setenv("TSUE_DISTRIBUTED", off)
        assert M.initialize_distributed() is False
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")

    # forcing on a host where init cannot succeed must raise loudly — a pod
    # run silently degrading to independent single-host jobs trains garbage.
    # Any truthy spelling forces (launch scripts export =true/=yes too).
    for on in ("1", "true", "yes"):
        monkeypatch.setenv("TSUE_DISTRIBUTED", on)
        with pytest.raises(RuntimeError, match="TSUE_DISTRIBUTED"):
            M.initialize_distributed()
    assert jax.process_count() == 1

    # a detected coordinator env var is an equally explicit multi-host
    # signal: init failure must raise, not silently continue single-host
    monkeypatch.delenv("TSUE_DISTRIBUTED")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    with pytest.raises(RuntimeError, match="JAX_COORDINATOR_ADDRESS"):
        M.initialize_distributed()
    assert jax.process_count() == 1
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")

    # TPU_WORKER_HOSTNAMES with >1 host = real pod: failure raises ...
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    with pytest.raises(RuntimeError, match="2 hosts"):
        M.initialize_distributed()
    # ... but the platform sets it even on single-host slices, where a
    # failed autodetection must warn-and-continue, not brick the CLI
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a")
    with pytest.warns(UserWarning):
        assert M.initialize_distributed() is False
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")

    # TPU-VM device-file heuristic alone: warn-and-continue (single-host
    # TPU VMs are routine; autodetection may legitimately be unavailable)
    monkeypatch.setattr(M, "_on_tpu_vm", lambda: True)
    with pytest.warns(UserWarning):
        assert M.initialize_distributed() is False
    assert jax.process_count() == 1
