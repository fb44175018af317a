"""Reference-checkpoint compatibility audit (VERDICT r1 item 9).

Builds a torch module with the reference ``LlamaMultiModal``'s EXACT
parameter key layout — same attribute names as ref scripts/train.py:459-530,
the HF Llama wrapped by the real ``peft.get_peft_model`` with the reference's
LoraConfig (ref scripts/train.py:433-440) — and asserts that
``convert_reference_mllm``:

1. consumes every checkpoint key (unmapped parameter keys == set());
2. produces every leaf of the tsue_tpu ``MultiModalLLM`` param tree
   (unused target leaves == set());
3. is numerically faithful: the torch module's fused forward (image tokens
   + modality embeddings + Llama last hidden state, ref train.py:504-554)
   matches the Flax model after import, LoRA adapters active.

The artifact being modeled is ``mllm_lora_ddp_finetuned.pt``, consumed at
ref scripts/train.py:1137-1138 with ``strict=True`` — so key-for-key
coverage here means a real reference checkpoint loads without surgery.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
peft = pytest.importorskip("peft")
transformers = pytest.importorskip("transformers")

import torch.nn as tnn

import jax
import jax.numpy as jnp
from flax import traverse_util

from tsue_tpu.config import LlamaConfig, QFormerConfig
from tsue_tpu.models.fusion import MultiModalLLM
from tsue_tpu.models.torch_import import convert_reference_mllm, merge_into

# tiny-but-structurally-faithful dims: GQA (kv_heads < heads), tied
# embeddings, q_hidden != llama_hidden so q_proj exists (ref 768 vs 2048)
VOCAB, D_LLAMA, D_Q = 96, 32, 24
N_HEADS, N_KV, HEAD_DIM = 4, 2, 8
LORA_R, LORA_ALPHA = 8, 32


def _hf_llama():
    hcfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=D_LLAMA, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=N_HEADS,
        num_key_value_heads=N_KV, head_dim=HEAD_DIM,
        tie_word_embeddings=True, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager")
    return transformers.LlamaForCausalLM(hcfg)


class RefBlipQFormer(tnn.Module):
    """Key-layout mirror of ref scripts/train.py:388-414 (BlipQFormer)."""

    def __init__(self, vision_dim=16, hidden_size=D_Q, nhead=4,
                 num_encoder_layers=1, num_decoder_layers=1,
                 num_query_tokens=4):
        super().__init__()
        self.vision_proj = tnn.Linear(vision_dim, hidden_size)
        enc = tnn.TransformerEncoderLayer(hidden_size, nhead,
                                          batch_first=True)
        self.encoder = tnn.TransformerEncoder(enc, num_encoder_layers)
        self.query_tokens = tnn.Parameter(
            torch.randn(num_query_tokens, hidden_size))
        dec = tnn.TransformerDecoderLayer(hidden_size, nhead,
                                          batch_first=True)
        self.decoder = tnn.TransformerDecoder(dec, num_decoder_layers)

    def forward(self, vision_embs):
        x = self.vision_proj(vision_embs)
        enc_out = self.encoder(x)
        q = self.query_tokens.unsqueeze(0).expand(vision_embs.size(0), -1, -1)
        return self.decoder(q, enc_out)


class RefLlamaWithCrossAttnPEFT(tnn.Module):
    """Mirror of ref scripts/train.py:419-440: HF model + real PEFT LoRA."""

    def __init__(self, hf_model):
        super().__init__()
        cfg = peft.LoraConfig(r=LORA_R, lora_alpha=LORA_ALPHA,
                              lora_dropout=0.1, bias="none",
                              task_type=peft.TaskType.CAUSAL_LM)
        self.llama_model = peft.get_peft_model(hf_model, cfg)
        self.hidden_size = self.llama_model.config.hidden_size


class RefLlamaMultiModal(tnn.Module):
    """Mirror of ref scripts/train.py:459-554 (attribute names == keys)."""

    def __init__(self):
        super().__init__()
        self.qformer = RefBlipQFormer()
        self.llama_wrapper = RefLlamaWithCrossAttnPEFT(_hf_llama())
        self.q_proj = tnn.Linear(D_Q, D_LLAMA)
        self.vision_modality_embedding = tnn.Parameter(
            torch.randn(1, 1, D_LLAMA))
        self.text_modality_embedding = tnn.Parameter(
            torch.randn(1, 1, D_LLAMA))

    def forward(self, vision_embs, input_ids, attention_mask):
        img = self.qformer(vision_embs)
        img = self.q_proj(img) + self.vision_modality_embedding
        llm = self.llama_wrapper.llama_model
        text = llm.get_input_embeddings()(input_ids)
        text = text + self.text_modality_embedding
        fused = torch.cat([img, text], dim=1)
        mask = torch.cat(
            [torch.ones(fused.size(0), img.size(1), dtype=attention_mask.dtype),
             attention_mask], dim=1)
        out = llm(inputs_embeds=fused, attention_mask=mask,
                  output_hidden_states=True, return_dict=True)
        return out.hidden_states[-1]


@pytest.fixture(scope="module")
def ref_module():
    torch.manual_seed(7)
    mod = RefLlamaMultiModal()
    # make LoRA a real contribution (PEFT inits B=0 => no-op otherwise)
    with torch.no_grad():
        for name, p in mod.named_parameters():
            if "lora_B" in name:
                p.normal_(std=0.05)
    mod.eval()
    return mod


@pytest.fixture(scope="module")
def cfgs():
    llama_cfg = LlamaConfig(
        vocab_size=VOCAB, hidden_size=D_LLAMA, intermediate_size=64,
        num_layers=2, num_heads=N_HEADS, num_kv_heads=N_KV,
        head_dim=HEAD_DIM, rope_theta=10000.0, rope_scaling_factor=1.0,
        use_lora=True, lora_r=LORA_R, lora_alpha=LORA_ALPHA)
    q_cfg = QFormerConfig(vision_dim=16, hidden_size=D_Q, num_heads=4,
                          num_encoder_layers=1, num_decoder_layers=1,
                          num_query_tokens=4)
    return llama_cfg, q_cfg


def test_every_checkpoint_key_is_mapped(ref_module, cfgs):
    """Unmapped parameter keys == set() (VERDICT item 9 'done' criterion)."""
    llama_cfg, q_cfg = cfgs
    sd = ref_module.state_dict()
    consumed = set()
    convert_reference_mllm(sd, q_cfg, llama_cfg, consumed)
    unmapped = set(sd) - consumed
    param_names = {n for n, _ in ref_module.named_parameters()}
    # every parameter must be mapped; anything left may only be a
    # non-parameter buffer (e.g. rotary inv_freq on older transformers)
    assert unmapped & param_names == set(), (
        f"unmapped parameters: {sorted(unmapped & param_names)}")
    buffers = {n for n, _ in ref_module.named_buffers()}
    assert unmapped <= buffers, f"unmapped non-buffers: {sorted(unmapped)}"


def test_every_target_leaf_is_produced(ref_module, cfgs):
    """The converted tree covers the FULL MultiModalLLM param tree."""
    llama_cfg, q_cfg = cfgs
    converted = convert_reference_mllm(ref_module.state_dict(), q_cfg,
                                       llama_cfg)
    mllm = MultiModalLLM(llama_cfg, q_cfg)
    rng = np.random.default_rng(0)
    variables = mllm.init(
        {"params": jax.random.key(0)},
        jnp.asarray(rng.standard_normal((1, 3, 16)), jnp.float32),
        jnp.zeros((1, 5), jnp.int32), jnp.ones((1, 5), jnp.int32), True)
    target = set(traverse_util.flatten_dict(variables["params"]))
    got = set(traverse_util.flatten_dict(converted))
    assert target - got == set(), f"target leaves not produced: {target - got}"
    assert got - target == set(), f"extra converted leaves: {got - target}"
    # merge_into additionally validates every shape leaf-by-leaf
    merge_into(variables["params"], converted)


def test_forward_parity_after_import(ref_module, cfgs):
    """torch fused forward (real PEFT, LoRA active) == Flax after import."""
    llama_cfg, q_cfg = cfgs
    mllm = MultiModalLLM(llama_cfg, q_cfg)
    rng = np.random.default_rng(1)
    B, Tv, L = 2, 3, 7
    vision = rng.standard_normal((B, Tv, 16)).astype(np.float32)
    ids = rng.integers(0, VOCAB, (B, L))
    mask = np.ones((B, L), np.int64)

    with torch.no_grad():
        ref = ref_module(torch.tensor(vision), torch.tensor(ids),
                         torch.tensor(mask)).numpy()

    variables = mllm.init(
        {"params": jax.random.key(0)}, jnp.asarray(vision),
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), True)
    merged = merge_into(
        variables["params"],
        convert_reference_mllm(ref_module.state_dict(), q_cfg, llama_cfg))
    hidden, _ = mllm.apply({"params": merged}, jnp.asarray(vision),
                           jnp.asarray(ids, jnp.int32),
                           jnp.asarray(mask, jnp.int32), True)
    assert hidden.shape == ref.shape
    np.testing.assert_allclose(np.asarray(hidden), ref, atol=2e-4, rtol=2e-4)
