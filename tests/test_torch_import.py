"""Reference torch MLLM checkpoint import: numeric parity with torch."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tsue_tpu.config import LlamaConfig, QFormerConfig
from tsue_tpu.models.layers import DecoderBlock, EncoderBlock
from tsue_tpu.models.qformer import QFormer
from tsue_tpu.models.torch_import import (convert_reference_llama,
                                          convert_reference_qformer,
                                          convert_torch_encoder_layer,
                                          merge_into)

D, H = 32, 4


class TestLayerParity:
    def test_encoder_layer(self):
        torch.manual_seed(0)
        tl = tnn.TransformerEncoderLayer(d_model=D, nhead=H,
                                         batch_first=True)
        tl.eval()
        x = torch.randn(2, 6, D)
        with torch.no_grad():
            ref = tl(x).numpy()
        params = convert_torch_encoder_layer(
            {k: v for k, v in tl.state_dict().items()}, "", D, H)
        # keys came out as ".self_attn..." etc with empty prefix; rebuild
        blk = EncoderBlock(D, H, dropout=0.0)
        vs = blk.init({"params": jax.random.key(0)},
                      jnp.asarray(x.numpy()))
        merged = merge_into(vs["params"], params)
        out = blk.apply({"params": merged}, jnp.asarray(x.numpy()),
                        deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5,
                                   rtol=2e-5)

    def test_qformer_parity(self):
        """Full BLIP-style stack: torch encoder+queries+decoder vs QFormer."""
        torch.manual_seed(1)
        cfg = QFormerConfig(vision_dim=16, hidden_size=D, num_heads=H,
                            num_encoder_layers=2, num_decoder_layers=2,
                            num_query_tokens=4, dropout=0.0)

        class TorchQFormer(tnn.Module):
            def __init__(self):
                super().__init__()
                self.vision_proj = tnn.Linear(16, D)
                enc = tnn.TransformerEncoderLayer(D, H, batch_first=True)
                self.encoder = tnn.TransformerEncoder(enc, 2)
                self.query_tokens = tnn.Parameter(torch.randn(4, D))
                dec = tnn.TransformerDecoderLayer(D, H, batch_first=True)
                self.decoder = tnn.TransformerDecoder(dec, 2)

            def forward(self, v):
                x = self.encoder(self.vision_proj(v))
                q = self.query_tokens.unsqueeze(0).expand(v.size(0), -1, -1)
                return self.decoder(q, x)

        tm = TorchQFormer(); tm.eval()
        v = torch.randn(2, 5, 16)
        with torch.no_grad():
            ref = tm(v).numpy()
        qf = QFormer(cfg)
        vs = qf.init({"params": jax.random.key(0)}, jnp.asarray(v.numpy()))
        conv = convert_reference_qformer(tm.state_dict(), D, H, 2, 2,
                                         prefix="")
        merged = merge_into(vs["params"], conv)
        out = qf.apply({"params": merged}, jnp.asarray(v.numpy()),
                       deterministic=True)
        np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5,
                                   rtol=3e-5)


class TestPeftLlamaImport:
    def test_peft_names_and_lora_transpose(self):
        import transformers
        hcfg = transformers.LlamaConfig(
            vocab_size=96, hidden_size=D, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=H,
            num_key_value_heads=2, head_dim=8, tie_word_embeddings=True,
            rms_norm_eps=1e-5, rope_theta=10000.0,
            attn_implementation="eager")
        torch.manual_seed(2)
        hf = transformers.LlamaForCausalLM(hcfg); hf.eval()
        r = 4
        sd = {}
        pref = "llama_wrapper.llama_model.base_model.model."
        for k, v in hf.state_dict().items():
            k2 = k
            for proj in ("q_proj", "v_proj"):
                k2 = k2.replace(f"{proj}.weight", f"{proj}.base_layer.weight")
            sd[pref + k2] = v
        # fabricate PEFT adapters: A random, B zero (no-op)
        for i in range(2):
            for proj in ("q_proj", "v_proj"):
                outd = D if proj == "q_proj" else 16
                sd[pref + f"model.layers.{i}.self_attn.{proj}."
                   f"lora_A.default.weight"] = torch.randn(r, D)
                sd[pref + f"model.layers.{i}.self_attn.{proj}."
                   f"lora_B.default.weight"] = torch.zeros(outd, r)

        cfg = LlamaConfig(vocab_size=96, hidden_size=D,
                          intermediate_size=64, num_layers=2, num_heads=H,
                          num_kv_heads=2, head_dim=8, rope_theta=10000.0,
                          rope_scaling_factor=1.0, use_lora=True,
                          lora_r=r)
        from tsue_tpu.models.llama import LlamaForCausalLM
        model = LlamaForCausalLM(cfg)
        vs = model.init({"params": jax.random.key(0)},
                        input_ids=jnp.zeros((1, 4), jnp.int32))
        conv = convert_reference_llama(sd, 2)
        merged = merge_into(vs["params"], conv)
        # lora placement: lora_a == lora_A.T
        a_t = sd[pref + "model.layers.0.self_attn.q_proj."
                 "lora_A.default.weight"].numpy().T
        np.testing.assert_allclose(
            np.asarray(merged["model"]["layer_0"]["attn"]["q_proj"]["lora_a"]),
            a_t, atol=1e-6)
        # B=0 => logits equal plain HF
        ids = np.random.default_rng(3).integers(0, 96, (2, 9))
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        out = model.apply({"params": merged},
                          input_ids=jnp.asarray(ids, jnp.int32),
                          attention_mask=jnp.ones((2, 9), jnp.int32),
                          compute_logits=True)
        np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                                   atol=3e-4, rtol=3e-4)
