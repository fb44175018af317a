"""Export tsue_tpu params back to the reference's torch state_dict layout.

The inverse of :mod:`tsue_tpu.models.torch_import`: a stage-1
``MultiModalLLM`` param tree becomes a state_dict loadable (strict) into
the reference's ``LlamaMultiModal`` module (the ``mllm_lora_ddp_finetuned
.pt`` artifact consumed at ref scripts/train.py:1137-1138), and a stage-2
``TrajectoryModel`` tree becomes the full ``MultiModalTrajectoryModel``
state_dict the reference saves on val improvement (ref
scripts/train.py:1219-1224).  With both directions a reference user can
fine-tune here and evaluate there, or round-trip a migration without
losing the original toolchain.

All structure is inferred from the param tree itself (layer counts from
key names, head counts from the (d, h, dh) attention kernel shapes, PEFT
vs plain-HF llama naming from the presence of LoRA leaves), so the
exporters take only the params.

Key layouts produced (mirroring torch_import's docstring):

  qformer.vision_proj.{weight,bias}
  qformer.encoder.layers.{i}.self_attn.in_proj_{weight,bias} (packed qkv)
  qformer.decoder.layers.{i}.{self_attn,multihead_attn,linear1/2,norm1/2/3}
  q_proj.* / vision_modality_embedding / text_modality_embedding
  llama_wrapper.llama_model.[base_model.model.]model.layers.{i}... with
      PEFT decorations (``base_layer`` / ``lora_A.default`` /
      ``lora_B.default``) exactly where the tree carries LoRA leaves
  lane_polygon_encoder.* / mllm.* / ltsf.* (stage 2)

Numeric faithfulness is pinned by tests/test_torch_export.py: export →
``load_state_dict(strict=True)`` into the reference-layout torch mirrors
→ forward parity, plus a bitwise import(export(params)) round-trip.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _set_linear(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _np(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _set_norm(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _set_mha(out: Dict, prefix: str, p: Dict) -> None:
    """tsue MHA (q/k/v kernel (d,h,dh), o kernel (h,dh,d)) ->
    torch nn.MultiheadAttention in_proj/out_proj tensors."""
    d = _np(p["q"]["kernel"]).shape[0]
    ws, bs = [], []
    for name in ("q", "k", "v"):
        ws.append(_np(p[name]["kernel"]).reshape(d, d).T)   # (d_out, d_in)
        bs.append(_np(p[name]["bias"]).reshape(d))
    out[f"{prefix}.in_proj_weight"] = np.concatenate(ws, axis=0)
    out[f"{prefix}.in_proj_bias"] = np.concatenate(bs, axis=0)
    out[f"{prefix}.out_proj.weight"] = _np(p["o"]["kernel"]).reshape(d, d).T
    out[f"{prefix}.out_proj.bias"] = _np(p["o"]["bias"])


def _set_encoder_layer(out: Dict, prefix: str, p: Dict) -> None:
    """EncoderBlock params -> torch nn.TransformerEncoderLayer keys."""
    _set_mha(out, f"{prefix}.self_attn", p["MHA_0"])
    _set_linear(out, f"{prefix}.linear1", p["FFN_0"]["Dense_0"])
    _set_linear(out, f"{prefix}.linear2", p["FFN_0"]["Dense_1"])
    _set_norm(out, f"{prefix}.norm1", p["LayerNorm_0"])
    _set_norm(out, f"{prefix}.norm2", p["LayerNorm_1"])


def _set_decoder_layer(out: Dict, prefix: str, p: Dict) -> None:
    """DecoderBlock params -> torch nn.TransformerDecoderLayer keys."""
    _set_mha(out, f"{prefix}.self_attn", p["self_attn"])
    _set_mha(out, f"{prefix}.multihead_attn", p["cross_attn"])
    _set_linear(out, f"{prefix}.linear1", p["FFN_0"]["Dense_0"])
    _set_linear(out, f"{prefix}.linear2", p["FFN_0"]["Dense_1"])
    _set_norm(out, f"{prefix}.norm1", p["LayerNorm_0"])
    _set_norm(out, f"{prefix}.norm2", p["LayerNorm_1"])
    _set_norm(out, f"{prefix}.norm3", p["LayerNorm_2"])


def _layer_indices(p: Dict, pattern: str) -> list:
    """Sorted layer indices present in a subtree, e.g. enc_0/enc_1 -> [0,1]."""
    idx = []
    for k in p:
        m = re.fullmatch(pattern, k)
        if m:
            idx.append(int(m.group(1)))
    return sorted(idx)


def export_reference_qformer(p: Dict, prefix: str = "qformer") -> Dict:
    out: Dict[str, np.ndarray] = {}
    _set_linear(out, f"{prefix}.vision_proj", p["vision_proj"])
    out[f"{prefix}.query_tokens"] = _np(p["query_tokens"])
    for i in _layer_indices(p, r"enc_(\d+)"):
        _set_encoder_layer(out, f"{prefix}.encoder.layers.{i}", p[f"enc_{i}"])
    for i in _layer_indices(p, r"dec_(\d+)"):
        _set_decoder_layer(out, f"{prefix}.decoder.layers.{i}", p[f"dec_{i}"])
    return out


def export_reference_llama(p: Dict, prefix: str = "llama_wrapper.llama_model"
                           ) -> Dict:
    """Flax llama subtree -> HF/PEFT state_dict keys.

    PEFT decorations (``base_model.model.`` wrapper prefix, ``base_layer``
    on adapted projections, ``lora_A/B.default``) are emitted exactly
    where the tree carries ``lora_a``/``lora_b`` leaves, matching what
    ``peft.get_peft_model`` produces for the reference's LoraConfig (ref
    scripts/train.py:433-440).  A LoRA-free tree yields plain HF names —
    the layout of the no-LoRA ablation (ref
    scripts/ablation_study_without_lora.py:1070-1084)."""
    model = p["model"]
    layers = _layer_indices(model, r"layer_(\d+)")
    has_lora = any(
        "lora_a" in model[f"layer_{i}"]["attn"].get(proj, {})
        for i in layers
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"))
    base = f"{prefix}.base_model.model" if has_lora else prefix
    out: Dict[str, np.ndarray] = {}
    emb = _np(model["embed_tokens"]["embedding"])
    out[f"{base}.model.embed_tokens.weight"] = emb
    out[f"{base}.model.norm.weight"] = _np(model["final_norm"]["scale"])
    # torch state_dicts carry tied weights under both names (the importer's
    # audit treats the lm_head alias as consumed when tied)
    out[f"{base}.lm_head.weight"] = (_np(p["lm_head"]["kernel"]).T
                                     if "lm_head" in p else emb)
    for i in layers:
        lp = model[f"layer_{i}"]
        hf = f"{base}.model.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sub = lp["attn"][proj]
            if "lora_a" in sub:
                out[f"{hf}.self_attn.{proj}.base_layer.weight"] = \
                    _np(sub["kernel"]).T
                out[f"{hf}.self_attn.{proj}.lora_A.default.weight"] = \
                    _np(sub["lora_a"]).T
                out[f"{hf}.self_attn.{proj}.lora_B.default.weight"] = \
                    _np(sub["lora_b"]).T
            else:
                out[f"{hf}.self_attn.{proj}.weight"] = _np(sub["kernel"]).T
        for proj in ("gate_proj", "up_proj", "down_proj"):
            sub = lp["mlp"][proj]
            if "lora_a" in sub:
                out[f"{hf}.mlp.{proj}.base_layer.weight"] = \
                    _np(sub["kernel"]).T
                out[f"{hf}.mlp.{proj}.lora_A.default.weight"] = \
                    _np(sub["lora_a"]).T
                out[f"{hf}.mlp.{proj}.lora_B.default.weight"] = \
                    _np(sub["lora_b"]).T
            else:
                out[f"{hf}.mlp.{proj}.weight"] = _np(sub["kernel"]).T
        out[f"{hf}.input_layernorm.weight"] = _np(lp["input_norm"]["scale"])
        out[f"{hf}.post_attention_layernorm.weight"] = \
            _np(lp["post_attn_norm"]["scale"])
    return out


def export_reference_mllm(p: Dict) -> Dict:
    """``MultiModalLLM`` params -> reference ``LlamaMultiModal`` state_dict
    (the stage-1 artifact layout, ref scripts/train.py:459-530)."""
    out = export_reference_qformer(p["qformer"])
    out["vision_modality_embedding"] = _np(p["vision_modality_embedding"])
    out["text_modality_embedding"] = _np(p["text_modality_embedding"])
    if "q_proj" in p:
        _set_linear(out, "q_proj", p["q_proj"])
    out.update(export_reference_llama(p["llama"]))
    return out


# ---------------------------------------------------------------------------
# Stage-2 full model (lane encoder + MLLM + LTSF), ref train.py:847-964
# ---------------------------------------------------------------------------

def _set_per_channel_linears(out: Dict, prefix: str, p: Dict) -> None:
    """PerChannelLinear {kernel (C,T_in,T_out), bias (C,T_out)} -> torch
    ModuleList of per-channel nn.Linear (ref scripts/train.py:703-709)."""
    k, b = _np(p["kernel"]), _np(p["bias"])
    for c in range(k.shape[0]):
        out[f"{prefix}.{c}.weight"] = k[c].T
        out[f"{prefix}.{c}.bias"] = b[c]


def export_reference_lane_encoder(p: Dict,
                                  prefix: str = "lane_polygon_encoder"
                                  ) -> Dict:
    out: Dict[str, np.ndarray] = {}
    _set_linear(out, f"{prefix}.input_proj", p["input_proj"])
    out[f"{prefix}.pos_embedding"] = _np(p["pos_embedding"])
    for i in _layer_indices(p, r"block_(\d+)"):
        _set_encoder_layer(out, f"{prefix}.encoder.layers.{i}",
                           p[f"block_{i}"])
    return out


def export_reference_ltsf(p: Dict, prefix: str = "ltsf") -> Dict:
    out: Dict[str, np.ndarray] = {}
    # Dense kernel (2, C) -> Conv1d(k=1) weight (C, 2, 1)
    out[f"{prefix}.token_proj.weight"] = \
        _np(p["token_proj"]["kernel"]).T[:, :, None]
    out[f"{prefix}.token_proj.bias"] = _np(p["token_proj"]["bias"])
    _set_per_channel_linears(out, f"{prefix}.nlinear_encoder.encoder_linears",
                             p["nlinear_encoder"]["linears"])
    out[f"{prefix}.pos_encoding"] = _np(p["pos_encoding"])
    ab = p["attn_block"]
    _set_norm(out, f"{prefix}.attn_block.norm1", ab["norm1"])
    _set_norm(out, f"{prefix}.attn_block.norm2", ab["norm2"])
    _set_mha(out, f"{prefix}.attn_block.mha", ab["mha"])
    _set_linear(out, f"{prefix}.attn_block.ffn.0", ab["ffn1"])
    _set_linear(out, f"{prefix}.attn_block.ffn.3", ab["ffn2"])
    dec = p["decoder"]
    _set_per_channel_linears(out, f"{prefix}.decoder.decoder_linears",
                             dec["linears"])
    _set_linear(out, f"{prefix}.decoder.lane_fc", dec["lane_fc"])
    _set_linear(out, f"{prefix}.decoder.post_mlp.0", dec["post_mlp1"])
    _set_linear(out, f"{prefix}.decoder.post_mlp.3", dec["post_mlp2"])
    _set_norm(out, f"{prefix}.decoder.fusion_layer.0", dec["fusion_ln"])
    _set_linear(out, f"{prefix}.decoder.fusion_layer.1", dec["fusion_fc1"])
    _set_linear(out, f"{prefix}.decoder.fusion_layer.3", dec["fusion_fc2"])
    _set_linear(out, f"{prefix}.decoder.out_proj", dec["out_proj"])
    if "cross_attn" in dec:
        _set_linear(out, f"{prefix}.decoder.dec_proj", dec["dec_proj"])
        _set_linear(out, f"{prefix}.decoder.dec_unproj", dec["dec_unproj"])
        _set_mha(out, f"{prefix}.decoder.cross_attn", dec["cross_attn"])
    return out


def export_reference_stage2(p: Dict) -> Dict:
    """``TrajectoryModel`` params -> reference ``MultiModalTrajectoryModel``
    state_dict (the best-val artifact, ref scripts/train.py:1219-1224)."""
    out = export_reference_lane_encoder(p["lane_encoder"])
    if "mllm" in p:
        out.update({f"mllm.{k}": v
                    for k, v in export_reference_mllm(p["mllm"]).items()})
    out.update(export_reference_ltsf(p["ltsf"]))
    return out


def to_torch_state_dict(exported: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """numpy export -> torch tensors (for ``torch.save``)."""
    import torch
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in exported.items()}
