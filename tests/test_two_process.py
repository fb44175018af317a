"""Real 2-process distributed test (VERDICT r2 item 2).

Launches two subprocesses with 4 forced host devices each and a localhost
coordinator; the worker (tests/distributed_worker.py) exercises every
``jax.process_count() > 1`` branch — sharded global batches, the full
run_stage2 loop (collective best-ckpt save + in-memory restore), the
generation gather, and barriers.  The parent then runs the IDENTICAL
config single-process on its own 8-device mesh and asserts metric parity:
same global program, same seeded data, so 2x4 and 1x8 must agree.

Reference capability being replaced: torchrun + NCCL DDP + all_gather_object
(ref scripts/train.py:1044-1049, check_generation.py:359-369).
"""
import dataclasses
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # ~5 min: 2 jax.distributed subprocesses

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(proc_id: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    return env


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("dist"))
    port = _free_port()
    script = os.path.join(REPO, "tests", "distributed_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), "2", str(port), out_dir],
        env=_worker_env(i), cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {i} timed out (collective deadlock?)")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {i} failed rc={p.returncode}\n{out[-4000:]}")
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line in worker output:\n{out[-2000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return results, out_dir


def test_both_processes_complete_and_agree(worker_results):
    results, _ = worker_results
    assert {r["proc"] for r in results} == {0, 1}
    r0, r1 = sorted(results, key=lambda r: r["proc"])
    # SPMD metrics are replicated: both processes must report identical
    # train/eval numbers
    for k in ("test_ade", "test_fde", "min_ade", "min_fde", "min_rmse"):
        np.testing.assert_allclose(r0[k], r1[k], rtol=1e-6, err_msg=k)
    assert r0["n_gen"] > 0        # process 0 decoded gathered generations
    assert r1["n_gen"] == -1      # process 1 returned no records


def test_artifacts_written_once(worker_results):
    results, out_dir = worker_results
    # collective best-ckpt save: the artifact exists exactly once
    ckpt = os.path.join(out_dir, "mllm_free_18_18", "ckpt", "best")
    assert os.path.exists(ckpt)
    gen = os.path.join(out_dir, "gen.txt")
    assert os.path.exists(gen)
    with open(gen) as f:
        assert "GENERATED:" in f.read()


def test_two_process_matches_single_process(worker_results, tmp_path):
    """2 procs x 4 devices == 1 proc x 8 devices: same seeded data, same
    global SPMD program, so the metrics must match."""
    from tsue_tpu.config import (DataConfig, LaneEncoderConfig, LTSFConfig,
                                 ModelConfig, TrainConfig, get_preset)
    from tsue_tpu.runner import run_stage2

    results, _ = worker_results
    r0 = sorted(results, key=lambda r: r["proc"])[0]
    cfg = dataclasses.replace(
        get_preset("mllm_free_18_18"),
        data=DataConfig(seq_len=6, out_len=6, max_length=64,
                        use_text=False, use_vision=False),
        model=ModelConfig(use_llm=False,
                          lane=LaneEncoderConfig(d_model=16, nhead=2,
                                                 num_layers=1),
                          ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
        train=TrainConfig(batch_size=8, lr=1e-3, freeze_regime="joint"))
    m = run_stage2(cfg, None, str(tmp_path), epochs=2,
                   eval_candidates=2, save_viz=False, synthetic_tracks=8)
    for k in ("test_ade", "test_fde", "min_ade", "min_fde", "min_rmse"):
        np.testing.assert_allclose(m[k], r0[k], rtol=1e-4, err_msg=k)
