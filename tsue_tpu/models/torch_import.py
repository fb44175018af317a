"""Import the reference's torch MLLM checkpoint into the Flax tree.

The stage-1 artifact ``mllm_lora_ddp_finetuned.pt`` (consumed at ref
scripts/train.py:1137 with strict=True) is a torch ``state_dict`` of the
reference's ``LlamaMultiModal`` module:

  qformer.vision_proj.{weight,bias}
  qformer.encoder.layers.{i}.self_attn.in_proj_{weight,bias}   (packed qkv)
  qformer.encoder.layers.{i}.self_attn.out_proj.{weight,bias}
  qformer.encoder.layers.{i}.linear1/linear2, norm1/norm2
  qformer.query_tokens
  qformer.decoder.layers.{i}.self_attn / multihead_attn / linear1/2 /
                              norm1/norm2/norm3
  q_proj.{weight,bias}
  vision_modality_embedding / text_modality_embedding
  llama_wrapper.llama_model.[base_model.model.]model.layers.{i}...
      with PEFT names: q_proj.base_layer.weight, q_proj.lora_A.default.weight
      (r,in), q_proj.lora_B.default.weight (out,r)

This module converts those tensors to the tsue_tpu ``MultiModalLLM`` param
layout so a reference user can carry their fine-tuned stage-1 checkpoint
over.  LoRA: lora_a = lora_A.T (in,r), lora_b = lora_B.T (r,out); the
no-LoRA surgery of ref scripts/ablation_study_without_lora.py:1070-1084 is
just ``tsue_tpu.train.checkpoint.strip_lora`` after import.

torch TransformerEncoder/DecoderLayer semantics (post-LN, ReLU) match
tsue_tpu.models.layers.EncoderBlock/DecoderBlock; flax auto-names the two
(three) LayerNorms LayerNorm_0/1(/2) and attention projections q/k/v/o —
verified numerically in tests/test_torch_import.py.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np
from flax import traverse_util


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


class _KeyRecorder(dict):
    """Dict view that records every key read into ``consumed`` (mapped back
    through ``origin`` to the original checkpoint key names).  Used by the
    reference-checkpoint compatibility audit (tests/test_reference_ckpt_compat)
    to prove every checkpoint key is mapped."""

    def __init__(self, data, consumed: set, origin=None):
        super().__init__(data)
        self._consumed = consumed
        self._origin = origin or {}

    def __getitem__(self, k):
        self._consumed.add(self._origin.get(k, k))
        return super().__getitem__(k)


def _j(prefix: str, rest: str) -> str:
    return f"{prefix}.{rest}" if prefix else rest


def _mha(sd: Dict, prefix: str, d_model: int, num_heads: int) -> Dict:
    """torch nn.MultiheadAttention -> tsue MHA (q/k/v/o DenseGeneral)."""
    dh = d_model // num_heads
    out = {}
    w = _np(sd[_j(prefix, "in_proj_weight")])          # (3d, d)
    b = _np(sd[_j(prefix, "in_proj_bias")])            # (3d,)
    for i, name in enumerate(("q", "k", "v")):
        wi = w[i * d_model:(i + 1) * d_model]        # (d_out, d_in)
        bi = b[i * d_model:(i + 1) * d_model]
        out[name] = {"kernel": wi.T.reshape(d_model, num_heads, dh),
                     "bias": bi.reshape(num_heads, dh)}
    wo = _np(sd[_j(prefix, "out_proj.weight")])        # (d, d)
    bo = _np(sd[_j(prefix, "out_proj.bias")])
    out["o"] = {"kernel": wo.T.reshape(num_heads, dh, d_model), "bias": bo}
    return out


def _linear(sd, prefix):
    out = {"kernel": _np(sd[_j(prefix, "weight")]).T}
    if _j(prefix, "bias") in sd:
        out["bias"] = _np(sd[_j(prefix, "bias")])
    return out


def _norm(sd, prefix):
    return {"scale": _np(sd[_j(prefix, "weight")]),
            "bias": _np(sd[_j(prefix, "bias")])}


def _ffn(sd, prefix):
    return {"Dense_0": _linear(sd, _j(prefix, "linear1")),
            "Dense_1": _linear(sd, _j(prefix, "linear2"))}


def convert_torch_encoder_layer(sd: Dict, prefix: str, d_model: int,
                                num_heads: int) -> Dict:
    """torch nn.TransformerEncoderLayer -> EncoderBlock params."""
    return {
        "MHA_0": _mha(sd, _j(prefix, "self_attn"), d_model, num_heads),
        "FFN_0": _ffn(sd, prefix),
        "LayerNorm_0": _norm(sd, _j(prefix, "norm1")),
        "LayerNorm_1": _norm(sd, _j(prefix, "norm2")),
    }


def convert_torch_decoder_layer(sd: Dict, prefix: str, d_model: int,
                                num_heads: int) -> Dict:
    """torch nn.TransformerDecoderLayer -> DecoderBlock params."""
    return {
        "self_attn": _mha(sd, _j(prefix, "self_attn"), d_model, num_heads),
        "cross_attn": _mha(sd, _j(prefix, "multihead_attn"), d_model,
                           num_heads),
        "FFN_0": _ffn(sd, prefix),
        "LayerNorm_0": _norm(sd, _j(prefix, "norm1")),
        "LayerNorm_1": _norm(sd, _j(prefix, "norm2")),
        "LayerNorm_2": _norm(sd, _j(prefix, "norm3")),
    }


def convert_reference_qformer(sd: Dict, hidden: int, num_heads: int,
                              enc_layers: int, dec_layers: int,
                              prefix: str = "qformer") -> Dict:
    out = {"vision_proj": _linear(sd, _j(prefix, "vision_proj")),
           "query_tokens": _np(sd[_j(prefix, "query_tokens")])}
    for i in range(enc_layers):
        out[f"enc_{i}"] = convert_torch_encoder_layer(
            sd, _j(prefix, f"encoder.layers.{i}"), hidden, num_heads)
    for i in range(dec_layers):
        out[f"dec_{i}"] = convert_torch_decoder_layer(
            sd, _j(prefix, f"decoder.layers.{i}"), hidden, num_heads)
    return out


_PEFT_PREFIX_RE = re.compile(
    r"^llama_wrapper\.llama_model\.(?:base_model\.model\.)?")


def convert_reference_llama(sd: Dict, num_layers: int,
                            consumed: set | None = None) -> Dict:
    """PEFT/HF llama keys inside the reference mllm -> flax llama subtree.

    When ``consumed`` is given, every original checkpoint key whose tensor
    ends up in the returned tree is added to it (tied ``lm_head.weight``
    counts as consumed — it duplicates ``embed_tokens.weight``).
    """
    # strip wrapper prefixes and PEFT decorations to plain HF names
    plain = {}
    origin = {}
    lora = {}
    for k, v in sd.items():
        m = _PEFT_PREFIX_RE.match(k)
        if not m:
            continue
        k2 = k[m.end():]
        if ".lora_A." in k2 or ".lora_B." in k2:
            lora[k2] = (k, v)
            continue
        k2 = k2.replace(".base_layer.", ".")
        plain[k2] = v
        origin[k2] = k
    from tsue_tpu.models.llama_loader import convert_hf_state_dict
    if consumed is not None:
        plain_view = _KeyRecorder(plain, consumed, origin)
        # torch keeps tied weights under both names; the lm_head alias is
        # covered by reading embed_tokens ONLY when the tensors really are
        # tied — an untied lm_head would be silently dropped, and the audit
        # must surface that, not paper over it
        if "lm_head.weight" in origin and "model.embed_tokens.weight" in plain:
            lm, emb = plain["lm_head.weight"], plain["model.embed_tokens.weight"]
            if lm is emb or np.array_equal(_np(lm), _np(emb)):
                consumed.add(origin["lm_head.weight"])
    else:
        plain_view = plain
    tree = convert_hf_state_dict(plain_view, num_layers)
    # graft LoRA adapters
    flat = traverse_util.flatten_dict(tree)
    for k, (orig_k, v) in lora.items():
        m = re.match(r"model\.layers\.(\d+)\.self_attn\.(\w+_proj)\."
                     r"lora_([AB])\.\w+\.weight", k)
        if not m:
            continue
        i, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        name = "lora_a" if ab == "A" else "lora_b"
        flat[("model", f"layer_{i}", "attn", proj, name)] = _np(v).T
        if consumed is not None:
            consumed.add(orig_k)
    return traverse_util.unflatten_dict(flat)


def convert_reference_mllm(sd: Dict, qformer_cfg, llama_cfg,
                           consumed: set | None = None) -> Dict:
    """Full reference LlamaMultiModal state_dict -> MultiModalLLM params.

    ``consumed`` (optional set) collects every checkpoint key that was
    mapped; the compat audit asserts ``set(sd) - consumed == set()``.
    """
    sd_view = _KeyRecorder(sd, consumed) if consumed is not None else sd
    out = {
        "qformer": convert_reference_qformer(
            sd_view, qformer_cfg.hidden_size, qformer_cfg.num_heads,
            qformer_cfg.num_encoder_layers, qformer_cfg.num_decoder_layers),
        "vision_modality_embedding": _np(sd_view["vision_modality_embedding"]),
        "text_modality_embedding": _np(sd_view["text_modality_embedding"]),
        "llama": convert_reference_llama(sd, llama_cfg.num_layers, consumed),
    }
    if "q_proj.weight" in sd:
        out["q_proj"] = _linear(sd_view, "q_proj")
    return out


# ---------------------------------------------------------------------------
# Stage-2 full-model state_dict (MLLM + lane encoder + LTSF forecaster)
# ---------------------------------------------------------------------------

def _per_channel_linears(sd: Dict, prefix: str, channels: int) -> Dict:
    """torch ModuleList of per-channel nn.Linear(T_in, T_out) ->
    PerChannelLinear {kernel (C, T_in, T_out), bias (C, T_out)}.

    The reference's ``individual=True`` NLinear keeps one Linear per
    channel (ref scripts/train.py:703-709, 772-778); tsue_tpu batches them
    into one einsum weight."""
    ws = [_np(sd[f"{prefix}.{c}.weight"]).T for c in range(channels)]
    bs = [_np(sd[f"{prefix}.{c}.bias"]) for c in range(channels)]
    return {"kernel": np.stack(ws), "bias": np.stack(bs)}


def convert_reference_lane_encoder(sd: Dict, lane_cfg,
                                   prefix: str = "lane_polygon_encoder"
                                   ) -> Dict:
    """Ref LanePolygonEncoder (scripts/train.py:352-383) -> flax params."""
    out = {"input_proj": _linear(sd, _j(prefix, "input_proj")),
           "pos_embedding": _np(sd[_j(prefix, "pos_embedding")])}
    for i in range(lane_cfg.num_layers):
        out[f"block_{i}"] = convert_torch_encoder_layer(
            sd, _j(prefix, f"encoder.layers.{i}"), lane_cfg.d_model,
            lane_cfg.nhead)
    return out


def convert_reference_ltsf(sd: Dict, ltsf_cfg, cross_dim: int, seq_len: int,
                           out_len: int, prefix: str = "ltsf",
                           use_cross_attn: bool = True) -> Dict:
    """Ref TransformerLTSF stack (scripts/train.py:659-842) -> flax params.

    Maps: Conv1d(k=1) token_proj -> Dense; the per-channel NLinear
    ModuleLists -> batched PerChannelLinear kernels; attn_block
    (norm1/mha/ffn.0/ffn.3); decoder (decoder_linears, lane_fc,
    post_mlp.0/.3, dec_proj/dec_unproj, cross_attn,
    fusion_layer.0(LN)/.1/.3, out_proj)."""
    C = ltsf_cfg.d_model
    # Conv1d weight (C_out, C_in, 1) -> Dense kernel (C_in, C_out)
    conv_w = _np(sd[_j(prefix, "token_proj.weight")])
    out = {
        "token_proj": {"kernel": conv_w[:, :, 0].T,
                       "bias": _np(sd[_j(prefix, "token_proj.bias")])},
        "nlinear_encoder": {"linears": _per_channel_linears(
            sd, _j(prefix, "nlinear_encoder.encoder_linears"), C)},
        "pos_encoding": _np(sd[_j(prefix, "pos_encoding")]),
        "attn_block": {
            "norm1": _norm(sd, _j(prefix, "attn_block.norm1")),
            "norm2": _norm(sd, _j(prefix, "attn_block.norm2")),
            "mha": _mha(sd, _j(prefix, "attn_block.mha"), C,
                        ltsf_cfg.nhead),
            "ffn1": _linear(sd, _j(prefix, "attn_block.ffn.0")),
            "ffn2": _linear(sd, _j(prefix, "attn_block.ffn.3")),
        },
    }
    dec = {
        "linears": _per_channel_linears(
            sd, _j(prefix, "decoder.decoder_linears"), C),
        "lane_fc": _linear(sd, _j(prefix, "decoder.lane_fc")),
        "post_mlp1": _linear(sd, _j(prefix, "decoder.post_mlp.0")),
        "post_mlp2": _linear(sd, _j(prefix, "decoder.post_mlp.3")),
        "fusion_ln": _norm(sd, _j(prefix, "decoder.fusion_layer.0")),
        "fusion_fc1": _linear(sd, _j(prefix, "decoder.fusion_layer.1")),
        "fusion_fc2": _linear(sd, _j(prefix, "decoder.fusion_layer.3")),
        "out_proj": _linear(sd, _j(prefix, "decoder.out_proj")),
    }
    if use_cross_attn:
        dec["dec_proj"] = _linear(sd, _j(prefix, "decoder.dec_proj"))
        dec["dec_unproj"] = _linear(sd, _j(prefix, "decoder.dec_unproj"))
        dec["cross_attn"] = _mha(sd, _j(prefix, "decoder.cross_attn"),
                                 cross_dim, ltsf_cfg.cross_nhead)
    out["decoder"] = dec
    return out


def convert_reference_stage2(sd: Dict, model_cfg, seq_len: int,
                             out_len: int,
                             consumed: set | None = None) -> Dict:
    """Full stage-2 ``MultiModalTrajectoryModel`` state_dict ->
    ``TrajectoryModel`` params.

    The reference saves the whole model (lane_polygon_encoder + mllm +
    ltsf) on val improvement (ref scripts/train.py:1219-1224:
    ``torch.save(ddp_model.module.state_dict(), ...)``); this importer
    lets such a checkpoint be evaluated here — the only route to a true
    reference-vs-tsue ADE/FDE numeric parity check.

    ``consumed`` (optional set) collects every checkpoint key that was
    mapped; the compat audit asserts full coverage.
    """
    sd_view = _KeyRecorder(sd, consumed) if consumed is not None else sd
    out = {"lane_encoder": convert_reference_lane_encoder(
        sd_view, model_cfg.lane)}
    if model_cfg.use_llm:
        mllm_sd = {k[len("mllm."):]: v for k, v in sd.items()
                   if k.startswith("mllm.")}
        sub_consumed: set | None = set() if consumed is not None else None
        out["mllm"] = convert_reference_mllm(
            mllm_sd, model_cfg.qformer, model_cfg.llama, sub_consumed)
        if consumed is not None:
            consumed.update("mllm." + k for k in sub_consumed)
    out["ltsf"] = convert_reference_ltsf(
        sd_view, model_cfg.ltsf, model_cfg.llama.hidden_size, seq_len,
        out_len, use_cross_attn=model_cfg.use_llm)
    return out


def merge_into(target_params: Dict, converted: Dict) -> Dict:
    """Shape-checked merge of a converted subtree over an init tree."""
    tgt = traverse_util.flatten_dict(target_params)
    src = traverse_util.flatten_dict(converted)
    for k, v in src.items():
        if k not in tgt:
            raise KeyError(f"imported key {k} missing in target")
        if tuple(np.shape(tgt[k])) != tuple(np.shape(v)):
            raise ValueError(f"shape mismatch at {k}: "
                             f"{np.shape(tgt[k])} vs {np.shape(v)}")
        tgt[k] = np.asarray(v, dtype=np.asarray(tgt[k]).dtype)
    return traverse_util.unflatten_dict(tgt)
