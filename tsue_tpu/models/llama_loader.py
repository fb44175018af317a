"""HF Llama checkpoint ingestion into the Flax LlamaForCausalLM tree.

The reference obtains weights via ``AutoModelForCausalLM.from_pretrained``
(ref scripts/train.py:427-431).  Air-gapped TPU pods load from a local HF
checkout instead; this module maps an HF ``state_dict`` (torch CPU tensors
or numpy arrays) onto the tsue_tpu.models.llama parameter tree:

  model.embed_tokens.weight                     -> model/embed_tokens/embedding
  model.layers.{i}.self_attn.{q,k,v,o}_proj.weight
       (out,in) transposed                      -> model/layer_{i}/attn/.../kernel
  model.layers.{i}.mlp.{gate,up,down}_proj.weight -> .../mlp/.../kernel
  model.layers.{i}.input_layernorm.weight       -> .../input_norm/scale
  model.layers.{i}.post_attention_layernorm.weight -> .../post_attn_norm/scale
  model.norm.weight                             -> model/final_norm/scale
  lm_head.weight (untied only)                  -> lm_head/kernel (transposed)

Head layout and the half-split RoPE rotation match HF's Llama convention,
verified by the logit-parity test (tests/test_llama_loader.py) against a
randomly initialized ``transformers`` model.  LoRA adapter params (if the
target tree has them) are left at their PEFT-style init (B=0 no-op).
"""
from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

from flax import traverse_util


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_hf_state_dict(state_dict: Dict[str, Any],
                          num_layers: int,
                          tie_word_embeddings: bool = True) -> Dict:
    """HF key/value mapping -> nested flax param dict for LlamaForCausalLM."""
    flat = {}
    flat[("model", "embed_tokens", "embedding")] = _np(
        state_dict["model.embed_tokens.weight"])
    flat[("model", "final_norm", "scale")] = _np(
        state_dict["model.norm.weight"])
    if not tie_word_embeddings and "lm_head.weight" in state_dict:
        flat[("lm_head", "kernel")] = _np(state_dict["lm_head.weight"]).T
    for i in range(num_layers):
        hf = f"model.layers.{i}"
        fx = ("model", f"layer_{i}")
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            flat[fx + ("attn", name, "kernel")] = _np(
                state_dict[f"{hf}.self_attn.{name}.weight"]).T
        for name in ("gate_proj", "up_proj", "down_proj"):
            flat[fx + ("mlp", name, "kernel")] = _np(
                state_dict[f"{hf}.mlp.{name}.weight"]).T
        flat[fx + ("input_norm", "scale")] = _np(
            state_dict[f"{hf}.input_layernorm.weight"])
        flat[fx + ("post_attn_norm", "scale")] = _np(
            state_dict[f"{hf}.post_attention_layernorm.weight"])
    return traverse_util.unflatten_dict(flat)


def load_hf_llama(target_params: Dict, state_dict: Dict[str, Any],
                  num_layers: int,
                  tie_word_embeddings: bool = True) -> Dict:
    """Merge converted HF weights into an initialized param tree.

    Base weights are replaced; params absent from the checkpoint (LoRA
    adapters) keep their init values.  Shapes are validated leaf-by-leaf.
    """
    converted = traverse_util.flatten_dict(
        convert_hf_state_dict(state_dict, num_layers, tie_word_embeddings))
    tgt = traverse_util.flatten_dict(target_params)
    for k, v in converted.items():
        if k not in tgt:
            raise KeyError(f"converted key {k} not in target tree")
        if tuple(tgt[k].shape) != tuple(v.shape):
            raise ValueError(
                f"shape mismatch at {k}: target {tgt[k].shape} vs "
                f"checkpoint {v.shape}")
        tgt[k] = v.astype(np.asarray(tgt[k]).dtype)
    return traverse_util.unflatten_dict(tgt)


def load_hf_llama_from_dir(target_params: Dict, path: str, num_layers: int,
                           tie_word_embeddings: bool = True) -> Dict:
    """Load from a local HF checkout (pytorch_model.bin or *.safetensors)."""
    import os
    sd = {}
    st_files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    if st_files:
        from safetensors.numpy import load_file
        for f in sorted(st_files):
            sd.update(load_file(os.path.join(path, f)))
    else:
        import torch
        bins = [f for f in os.listdir(path)
                if re.match(r"pytorch_model.*\.bin", f)]
        for f in sorted(bins):
            sd.update(torch.load(os.path.join(path, f),
                                 map_location="cpu"))
    return load_hf_llama(target_params, sd, num_layers,
                         tie_word_embeddings)
