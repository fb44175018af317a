"""HF -> Flax weight ingestion: logit parity with transformers on a tiny
random Llama (SURVEY.md §7 'hard parts' #1)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import LlamaConfig
from tsue_tpu.models.llama import LlamaForCausalLM
from tsue_tpu.models.llama_loader import load_hf_llama

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

VOCAB, HID, INT, LAYERS, HEADS, KV, DH = 128, 32, 64, 2, 4, 2, 8


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=HID, intermediate_size=INT,
        num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=DH, tie_word_embeddings=True,
        rope_theta=10000.0, rms_norm_eps=1e-5,  # match LlamaConfig default
        attn_implementation="eager")
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_pair(hf_model):
    cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=HID,
                      intermediate_size=INT, num_layers=LAYERS,
                      num_heads=HEADS, num_kv_heads=KV, head_dim=DH,
                      rope_theta=10000.0, rope_scaling_factor=1.0,
                      use_lora=True)
    model = LlamaForCausalLM(cfg)
    vs = model.init({"params": jax.random.key(0)},
                    input_ids=jnp.zeros((1, 4), jnp.int32))
    params = load_hf_llama(vs["params"], hf_model.state_dict(), LAYERS)
    return model, {"params": params}


class TestHFIngestion:
    def test_logit_parity(self, hf_model, flax_pair):
        model, vs = flax_pair
        rng = np.random.default_rng(1)
        ids = rng.integers(0, VOCAB, (2, 12))
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(ids)).logits.numpy()
        out = model.apply(vs, input_ids=jnp.asarray(ids, jnp.int32),
                          attention_mask=jnp.ones((2, 12), jnp.int32),
                          compute_logits=True)
        np.testing.assert_allclose(np.asarray(out["logits"]), hf_logits,
                                   atol=2e-4, rtol=2e-4)

    def test_logit_parity_with_padding(self, hf_model, flax_pair):
        model, vs = flax_pair
        rng = np.random.default_rng(2)
        ids = rng.integers(0, VOCAB, (2, 10))
        mask = np.ones((2, 10), np.int64)
        mask[:, 7:] = 0
        with torch.no_grad():
            hf_logits = hf_model(torch.tensor(ids),
                                 attention_mask=torch.tensor(mask)
                                 ).logits.numpy()
        out = model.apply(vs, input_ids=jnp.asarray(ids, jnp.int32),
                          attention_mask=jnp.asarray(mask, jnp.int32),
                          compute_logits=True)
        # compare only valid positions (HF computes garbage on pads too)
        np.testing.assert_allclose(np.asarray(out["logits"])[:, :7],
                                   hf_logits[:, :7], atol=2e-4, rtol=2e-4)

    def test_shape_mismatch_raises(self, hf_model):
        cfg = LlamaConfig(vocab_size=VOCAB, hidden_size=HID,
                          intermediate_size=INT, num_layers=LAYERS,
                          num_heads=HEADS, num_kv_heads=KV, head_dim=4,
                          rope_scaling_factor=1.0)  # wrong head_dim
        model = LlamaForCausalLM(cfg)
        vs = model.init({"params": jax.random.key(0)},
                        input_ids=jnp.zeros((1, 4), jnp.int32))
        with pytest.raises(ValueError, match="shape mismatch"):
            load_hf_llama(vs["params"], hf_model.state_dict(), LAYERS)
