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


# ---------------------------------------------------------------------------
# Stage-2 FULL model (lane encoder + MLLM + LTSF), ref train.py:847-964,
# saved whole at ref scripts/train.py:1219-1224 — VERDICT r2 item 4.
# ---------------------------------------------------------------------------

LANE_D, LANE_HEADS, LANE_LAYERS, MAX_PTS = 16, 4, 1, 8
LTSF_D, LTSF_HEADS, CROSS_HEADS = 8, 2, 2
SEQ_LEN, OUT_LEN = 6, 4


class RefLanePolygonEncoder(tnn.Module):
    """Key-layout + numeric mirror of ref scripts/train.py:352-383."""

    def __init__(self):
        super().__init__()
        self.input_proj = tnn.Linear(2, LANE_D)
        enc = tnn.TransformerEncoderLayer(LANE_D, LANE_HEADS,
                                          batch_first=True)
        self.encoder = tnn.TransformerEncoder(enc, LANE_LAYERS)
        self.pos_embedding = tnn.Parameter(torch.zeros(1, MAX_PTS, LANE_D))

    def forward(self, polygon, poly_len):
        B, P, _ = polygon.shape
        x = self.input_proj(polygon) + self.pos_embedding[:, :P]
        pad = torch.arange(P)[None, :] >= poly_len[:, None]
        out = self.encoder(x, src_key_padding_mask=pad)
        w = (~pad).float().unsqueeze(-1)
        pooled = (out * w).sum(1) / w.sum(1).clamp(min=1.0)
        return torch.where((poly_len > 0)[:, None], pooled,
                           torch.zeros_like(pooled))


class RefSelfAttentionBlock(tnn.Module):
    """Mirror of ref scripts/train.py:659-686 incl. the res1 = x_norm +
    attn quirk."""

    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(LTSF_D)
        self.mha = tnn.MultiheadAttention(LTSF_D, LTSF_HEADS, dropout=0.0)
        self.ffn = tnn.Sequential(
            tnn.Linear(LTSF_D, LTSF_D * 4), tnn.ReLU(), tnn.Dropout(0.0),
            tnn.Linear(LTSF_D * 4, LTSF_D))
        self.norm2 = tnn.LayerNorm(LTSF_D)

    def forward(self, x):                      # (B, C, T)
        xp = x.permute(2, 0, 1)
        xn = self.norm1(xp)
        attn, _ = self.mha(xn, xn, xn)
        r1 = self.norm2(xn + attn)
        return (r1 + self.ffn(r1)).permute(1, 2, 0)


class RefTransformerLTSF(tnn.Module):
    """Mirror of ref scripts/train.py:688-842 (NLinear enc/dec ModuleLists,
    lane bias, post-MLP replace, cross-attn fusion)."""

    def __init__(self):
        super().__init__()
        self.token_proj = tnn.Conv1d(2, LTSF_D, kernel_size=1)

        class Enc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.encoder_linears = tnn.ModuleList(
                    [tnn.Linear(SEQ_LEN, SEQ_LEN) for _ in range(LTSF_D)])

            def forward(self, x):
                last = x[:, :, -1:]
                xs = x - last
                out = torch.stack(
                    [self.encoder_linears[c](xs[:, c]) for c in range(LTSF_D)],
                    dim=1)
                return out + last
        self.nlinear_encoder = Enc()
        self.pos_encoding = tnn.Parameter(torch.zeros(1, LTSF_D, SEQ_LEN))
        self.attn_block = RefSelfAttentionBlock()

        class Dec(tnn.Module):
            def __init__(self):
                super().__init__()
                self.decoder_linears = tnn.ModuleList(
                    [tnn.Linear(SEQ_LEN, OUT_LEN) for _ in range(LTSF_D)])
                self.lane_fc = tnn.Linear(LANE_D, LTSF_D * OUT_LEN)
                self.post_mlp = tnn.Sequential(
                    tnn.Linear(LTSF_D * OUT_LEN, 8), tnn.ReLU(),
                    tnn.Dropout(0.0), tnn.Linear(8, LTSF_D * OUT_LEN))
                self.cross_attn = tnn.MultiheadAttention(
                    D_LLAMA, CROSS_HEADS, dropout=0.0, batch_first=False)
                self.dec_proj = tnn.Linear(LTSF_D, D_LLAMA)
                self.dec_unproj = tnn.Linear(D_LLAMA, LTSF_D)
                self.fusion_layer = tnn.Sequential(
                    tnn.LayerNorm(LTSF_D), tnn.Linear(LTSF_D, LTSF_D),
                    tnn.ReLU(), tnn.Linear(LTSF_D, LTSF_D))
                self.out_proj = tnn.Linear(LTSF_D, 2)

            def forward(self, enc, lane_emb, final_hidden):
                B = enc.size(0)
                last = enc[:, :, -1:]
                xs = enc - last
                dec = torch.stack(
                    [self.decoder_linears[c](xs[:, c])
                     for c in range(LTSF_D)], dim=1)
                dec = dec + last.repeat(1, 1, OUT_LEN)
                dec = dec + self.lane_fc(lane_emb).view(B, LTSF_D, OUT_LEN)
                dec = self.post_mlp(dec.reshape(B, -1)).view(
                    B, LTSF_D, OUT_LEN)           # REPLACES (ref :787-791)
                dec_t = dec.permute(0, 2, 1)
                q = self.dec_proj(dec_t).transpose(0, 1)
                kv = final_hidden.transpose(0, 1)
                ca = self.cross_attn(q, kv, kv)[0].transpose(0, 1)
                fused = self.fusion_layer(dec_t + self.dec_unproj(ca))
                return self.out_proj(fused).permute(0, 2, 1)
        self.decoder = Dec()

    def forward(self, x, lane_emb, final_hidden):
        h = self.token_proj(x)
        h = self.nlinear_encoder(h) + self.pos_encoding
        h = self.attn_block(h)
        return self.decoder(h, lane_emb, final_hidden)


class RefMultiModalTrajectoryModel(tnn.Module):
    """Mirror of ref scripts/train.py:847-964 (the artifact saved at
    :1219-1224 is this module's state_dict)."""

    def __init__(self, mllm):
        super().__init__()
        self.lane_polygon_encoder = RefLanePolygonEncoder()
        self.mllm = mllm
        self.ltsf = RefTransformerLTSF()

    def forward(self, x, vision, polygon, poly_len, ids, mask):
        lane = self.lane_polygon_encoder(polygon, poly_len)
        hidden = self.mllm(vision, ids, mask)
        dec = self.ltsf(x, lane, hidden)
        return dec + x[:, :, -1:].repeat(1, 1, OUT_LEN)


@pytest.fixture(scope="module")
def ref_stage2(ref_module):
    torch.manual_seed(11)
    mod = RefMultiModalTrajectoryModel(ref_module)
    with torch.no_grad():
        for n, p in mod.named_parameters():
            if n.startswith(("lane_polygon_encoder", "ltsf")):
                p.normal_(std=0.1)
    mod.eval()
    return mod


@pytest.fixture(scope="module")
def stage2_cfg(cfgs):
    from tsue_tpu.config import (LaneEncoderConfig, LTSFConfig, ModelConfig)
    llama_cfg, q_cfg = cfgs
    return ModelConfig(
        llama=llama_cfg, qformer=q_cfg,
        lane=LaneEncoderConfig(d_model=LANE_D, nhead=LANE_HEADS,
                               num_layers=LANE_LAYERS, max_points=MAX_PTS,
                               dropout=0.0),
        ltsf=LTSFConfig(d_model=LTSF_D, nhead=LTSF_HEADS,
                        cross_nhead=CROSS_HEADS, post_mlp_hidden_dim=8,
                        dropout=0.0))


def _stage2_batch():
    rng = np.random.default_rng(3)
    B = 2
    return {
        "traj_in": rng.standard_normal((B, 2, SEQ_LEN)).astype(np.float32),
        "traj_out": rng.standard_normal((B, 2, OUT_LEN)).astype(np.float32),
        "vision": rng.standard_normal((B, 3, 16)).astype(np.float32),
        "polygon": rng.standard_normal((B, MAX_PTS, 2)).astype(np.float32),
        "polygon_len": np.array([MAX_PTS, 5], np.int32),
        "input_ids": rng.integers(0, VOCAB, (B, 7)).astype(np.int32),
        "attention_mask": np.ones((B, 7), np.int32),
        "norm_stat": np.array([[0.0, 100.0, 0.0, 50.0],
                               [10.0, 90.0, 5.0, 45.0]], np.float32),
    }


def _init_stage2(stage2_cfg):
    from tsue_tpu.models.tsue import TrajectoryModel
    model = TrajectoryModel(stage2_cfg, SEQ_LEN, OUT_LEN)
    b = {k: jnp.asarray(v) for k, v in _stage2_batch().items()}
    variables = model.init({"params": jax.random.key(0),
                            "dropout": jax.random.key(1)}, b, True)
    return model, variables


def test_stage2_every_checkpoint_key_is_mapped(ref_stage2, stage2_cfg):
    from tsue_tpu.models.torch_import import convert_reference_stage2
    sd = ref_stage2.state_dict()
    consumed = set()
    convert_reference_stage2(sd, stage2_cfg, SEQ_LEN, OUT_LEN, consumed)
    param_names = {n for n, _ in ref_stage2.named_parameters()}
    unmapped = set(sd) - consumed
    assert unmapped & param_names == set(), (
        f"unmapped parameters: {sorted(unmapped & param_names)}")
    buffers = {n for n, _ in ref_stage2.named_buffers()}
    assert unmapped <= buffers, f"unmapped non-buffers: {sorted(unmapped)}"


def test_stage2_every_target_leaf_is_produced(ref_stage2, stage2_cfg):
    from tsue_tpu.models.torch_import import (convert_reference_stage2,
                                              merge_into)
    _, variables = _init_stage2(stage2_cfg)
    converted = convert_reference_stage2(ref_stage2.state_dict(),
                                         stage2_cfg, SEQ_LEN, OUT_LEN)
    target = set(traverse_util.flatten_dict(variables["params"]))
    got = set(traverse_util.flatten_dict(converted))
    assert target - got == set(), f"not produced: {target - got}"
    assert got - target == set(), f"extra: {got - target}"
    merge_into(variables["params"], converted)


def test_stage2_forward_and_loss_parity(ref_stage2, stage2_cfg):
    """End-to-end stage-2 pred AND denorm-MSE loss pinned against torch —
    the forecaster-side numeric pin VERDICT r2 asked for."""
    from tsue_tpu.models.torch_import import (convert_reference_stage2,
                                              merge_into)
    from tsue_tpu.train.losses import denorm_mse_loss

    model, variables = _init_stage2(stage2_cfg)
    b_np = _stage2_batch()
    with torch.no_grad():
        ref_pred = ref_stage2(
            torch.tensor(b_np["traj_in"]), torch.tensor(b_np["vision"]),
            torch.tensor(b_np["polygon"]),
            torch.tensor(b_np["polygon_len"], dtype=torch.long),
            torch.tensor(b_np["input_ids"], dtype=torch.long),
            torch.tensor(b_np["attention_mask"],
                         dtype=torch.long)).numpy()
        # reference loss: MSE on denormalized coords (ref :945-961)
        ns = torch.tensor(b_np["norm_stat"])
        gt = torch.tensor(b_np["traj_out"])
        pd = torch.tensor(ref_pred)
        rx = (ns[:, 1] - ns[:, 0]).view(-1, 1)
        ry = (ns[:, 3] - ns[:, 2]).view(-1, 1)
        dx = pd[:, 0] * rx + ns[:, 0].view(-1, 1)
        dy = pd[:, 1] * ry + ns[:, 2].view(-1, 1)
        gx = gt[:, 0] * rx + ns[:, 0].view(-1, 1)
        gy = gt[:, 1] * ry + ns[:, 2].view(-1, 1)
        ref_loss = float(tnn.MSELoss()(dx, gx) + tnn.MSELoss()(dy, gy))

    merged = merge_into(
        variables["params"],
        convert_reference_stage2(ref_stage2.state_dict(), stage2_cfg,
                                 SEQ_LEN, OUT_LEN))
    b = {k: jnp.asarray(v) for k, v in _stage2_batch().items()}
    pred = model.apply({"params": merged}, b, True)
    assert pred.shape == ref_pred.shape
    np.testing.assert_allclose(np.asarray(pred), ref_pred,
                               atol=2e-4, rtol=2e-4)
    loss = float(denorm_mse_loss(pred, b["traj_out"], b["norm_stat"]))
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-4)


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
