"""Unit tests for scripts/_common.apply_overrides flag plumbing.

Pins the round-3 review finding: --tiny replaces cfg.model.llama with
LlamaConfig.tiny(), so overrides that touch the llama config must be
applied AFTER the tiny swap or they silently vanish.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from _common import apply_overrides, base_parser  # noqa: E402

from tsue_tpu.config import get_preset  # noqa: E402


def _args(*argv):
    return base_parser("t").parse_args(list(argv))


def test_remat_policy_survives_tiny():
    cfg = apply_overrides(get_preset("joint_24_24"),
                          _args("--tiny", "--remat-policy", "dots"))
    assert cfg.model.llama.remat is True          # policy implies remat
    assert cfg.model.llama.remat_policy == "dots"
    assert cfg.model.llama.hidden_size == 64      # tiny still applied


def test_remat_flag_alone_keeps_default_policy():
    cfg = apply_overrides(get_preset("train_18_30"), _args("--remat"))
    assert cfg.model.llama.remat is True
    assert cfg.model.llama.remat_policy == "full"


def test_no_flags_leave_preset_untouched():
    pre = get_preset("train_18_30")
    cfg = apply_overrides(pre, _args())
    assert cfg.model.llama.remat == pre.model.llama.remat
    assert cfg.train.rng_impl == pre.train.rng_impl


def test_loss_chunk_survives_tiny():
    cfg = apply_overrides(get_preset("train_18_30"),
                          _args("--tiny", "--loss-chunk", "264"))
    assert cfg.model.llama.loss_chunk == 264
    assert cfg.model.llama.hidden_size == 64      # tiny still applied


def test_loss_chunk_zero_forces_dense():
    cfg = apply_overrides(get_preset("train_18_30"),
                          _args("--loss-chunk", "0"))
    assert cfg.model.llama.loss_chunk == 0


@pytest.mark.parametrize("impl", ["threefry2x32", "rbg"])
def test_rng_impl_and_batch_survive_tiny(impl):
    cfg = apply_overrides(
        get_preset("train_18_30"),
        _args("--tiny", "--rng-impl", impl, "--batch-size", "4"))
    assert cfg.train.rng_impl == impl
    assert cfg.train.batch_size == 4
