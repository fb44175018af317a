"""Test configuration: force an 8-device virtual CPU mesh.

The environment's sitecustomize registers the remote-TPU (axon) backend at
interpreter startup with JAX_PLATFORMS=axon, so plain env-var settings are
too late/overridden — ``jax.config.update`` before first backend use is the
reliable override (SURVEY.md §4: exercise pjit sharding without TPUs via
xla_force_host_platform_device_count).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-dominated on CPU.
# Host-fingerprinted dir — stale AOT entries from another machine SIGILL.
from tsue_tpu.utils.jax_cache import configure as _configure_cache
_configure_cache(jax)
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()[:1]))

import numpy as np
import pytest


def pytest_configure(config):
    # two-tier suite (CLAUDE.md): `-m "not heavy"` is the fast tier;
    # heavy = long trainings / real CLI or multi-process subprocesses
    config.addinivalue_line(
        "markers", "heavy: slow tests (long trainings, real subprocesses) "
        "— run the fast tier with -m 'not heavy'")


@pytest.fixture(scope="session")
def synthetic_tracks():
    from tsue_tpu.data.schema import make_synthetic_tracks
    return make_synthetic_tracks(num_tracks=12, track_len=400, seed=0)


@pytest.fixture(scope="session")
def small_data_cfg():
    from tsue_tpu.config import DataConfig
    # max_length must exceed the ~430-byte prompt under the byte tokenizer
    # so the answer span gets real (non -100) labels
    return DataConfig(seq_len=6, out_len=6, stride=6, max_length=640)


@pytest.fixture(scope="session")
def tokenizer():
    from tsue_tpu.data.tokenizer import ByteTokenizer
    return ByteTokenizer()


@pytest.fixture(scope="session")
def small_windows(synthetic_tracks, small_data_cfg, tokenizer):
    from tsue_tpu.data.windowing import build_windows
    ds = build_windows(synthetic_tracks, small_data_cfg, tokenizer)
    assert len(ds) > 0
    return ds
