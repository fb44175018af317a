"""Preset hyperparameters mirror each reference script's args dict.

Each reference variant is a whole-file copy whose only meaningful deltas
are horizons, freeze regime, and a handful of hyperparameters (SURVEY.md
§2.7); these golden values pin the mapping so preset edits can't silently
drift from the scripts they reproduce.
"""
from tsue_tpu.config import PRESETS, get_preset

# (preset, seq_len, out_len, regime, bs, lr, epochs) — values from the
# reference args dicts cited in config.py's preset comments
GOLDEN = [
    ("train_18_30", 18, 30, "frozen_mllm", 16, 5e-4, 300),
    ("seed_fix_24_24", 24, 24, "joint", 16, 5e-4, 3),
    ("joint_24_24", 24, 24, "joint", 16, 5e-4, 300),
    ("im_kim_modified_24_24", 24, 24, "joint", 16, 1e-4, 300),
    ("full_freeze_30_6", 30, 6, "full_freeze", 8, 1e-5, 300),
    ("lora_only_18_18", 18, 18, "lora_only", 8, 1e-5, 500),
    ("joint_debug_18_30", 18, 30, "joint", 8, 1e-5, 300),
]


def test_every_preset_is_well_formed():
    for name, cfg in PRESETS.items():
        assert cfg.name == name
        assert cfg.data.seq_len > 0 and cfg.data.out_len > 0
        assert cfg.train.freeze_regime in ("frozen_mllm", "joint",
                                           "lora_only", "full_freeze")


def test_golden_hyperparameters():
    for name, seq, out, regime, bs, lr, epochs in GOLDEN:
        c = get_preset(name)
        assert (c.data.seq_len, c.data.out_len) == (seq, out), name
        assert c.train.freeze_regime == regime, name
        assert c.train.batch_size == bs, name
        assert c.train.lr == lr, name
        assert c.train.epochs == epochs, name
        assert c.train.weight_decay == 1e-4, name  # every ref AdamW uses it
        # every reference args dict sets ltsf_nhead=2 (train.py:1360,
        # modify_im_kim_train.py:941, modify_scripts/test.py:1082, ...)
        assert c.model.ltsf.nhead == 2, name


def test_im_kim_modified_dropout_and_depth():
    c = get_preset("im_kim_modified_24_24")
    assert c.model.llama.lora_dropout == 0.05
    assert c.model.ltsf.dropout == 0.05
    assert c.model.qformer.num_encoder_layers == 2
    assert c.model.qformer.num_decoder_layers == 2


def test_ablation_flags():
    assert get_preset("ablation_no_llm").model.use_llm is False
    assert get_preset("ablation_no_lora").model.llama.use_lora is False
    assert get_preset("ablation_no_vision_18_12").model.use_vision is False
    assert get_preset("mllm_free_18_18").model.use_llm is False
