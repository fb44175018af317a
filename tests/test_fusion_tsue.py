"""Q-Former, multimodal fusion, and the full TSUE model (tiny config)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import (ExperimentConfig, DataConfig, LlamaConfig,
                             LaneEncoderConfig, LTSFConfig, ModelConfig,
                             QFormerConfig, TrainConfig)
from tsue_tpu.models.fusion import MultiModalLLM
from tsue_tpu.models.qformer import QFormer
from tsue_tpu.models.tsue import TrajectoryModel

TINY_Q = QFormerConfig(vision_dim=32, hidden_size=48, num_heads=4,
                       num_encoder_layers=1, num_decoder_layers=1,
                       num_query_tokens=4)
TINY_L = LlamaConfig.tiny()
B, TV, L = 2, 6, 16


@pytest.fixture(scope="module")
def mllm():
    model = MultiModalLLM(llama=TINY_L, qformer=TINY_Q)
    vision = jnp.ones((B, TV, 32))
    ids = jnp.ones((B, L), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    vs = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                    vision, ids, mask)
    return model, vs


class TestQFormer:
    def test_output_shape(self):
        q = QFormer(TINY_Q)
        vision = jax.random.normal(jax.random.key(0), (B, TV, 32))
        vs = q.init({"params": jax.random.key(0)}, vision)
        out = q.apply(vs, vision)
        assert out.shape == (B, TINY_Q.num_query_tokens, TINY_Q.hidden_size)

    def test_varying_frames(self):
        """Different numbers of frames compress to the same #query tokens."""
        q = QFormer(TINY_Q)
        vs = q.init({"params": jax.random.key(0)},
                    jnp.ones((B, TV, 32)))
        out = q.apply(vs, jnp.ones((B, 12, 32)))
        assert out.shape == (B, TINY_Q.num_query_tokens, TINY_Q.hidden_size)


class TestFusion:
    def test_hidden_shape_includes_image_span(self, mllm):
        model, vs = mllm
        vision = jax.random.normal(jax.random.key(2), (B, TV, 32))
        ids = jax.random.randint(jax.random.key(3), (B, L), 3, 200)
        mask = jnp.ones((B, L), jnp.int32)
        hidden, fmask = model.apply(vs, vision, ids, mask)
        assert hidden.shape == (B, TINY_Q.num_query_tokens + L,
                                TINY_L.hidden_size)
        assert fmask.shape == (B, TINY_Q.num_query_tokens + L)
        assert bool(fmask[:, :TINY_Q.num_query_tokens].all())

    def test_vision_affects_text_hiddens(self, mllm):
        """Image tokens precede text: changing vision changes text hiddens."""
        model, vs = mllm
        ids = jax.random.randint(jax.random.key(4), (B, L), 3, 200)
        mask = jnp.ones((B, L), jnp.int32)
        h1, _ = model.apply(vs, jnp.zeros((B, TV, 32)), ids, mask)
        h2, _ = model.apply(vs, jnp.ones((B, TV, 32)), ids, mask)
        assert not np.allclose(np.asarray(h1[:, -1]), np.asarray(h2[:, -1]))

    def test_lm_loss_finite_and_ignores_image_span(self, mllm):
        model, vs = mllm
        vision = jax.random.normal(jax.random.key(5), (B, TV, 32))
        ids = jax.random.randint(jax.random.key(6), (B, L), 3, 200)
        mask = jnp.ones((B, L), jnp.int32)
        labels = ids.at[:, :4].set(-100)
        loss = model.apply(vs, vision, ids, mask, labels=labels,
                           method=model.lm_loss)
        assert jnp.isfinite(loss) and float(loss) > 0

    def test_no_vision_variant(self):
        model = MultiModalLLM(llama=TINY_L, qformer=TINY_Q, use_vision=False)
        ids = jnp.ones((B, L), jnp.int32)
        mask = jnp.ones((B, L), jnp.int32)
        vs = model.init({"params": jax.random.key(0)}, None, ids, mask)
        hidden, fmask = model.apply(vs, None, ids, mask)
        assert hidden.shape == (B, L, TINY_L.hidden_size)
        flat = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
        assert not any("qformer" in str(p) for p, _ in flat)


class TestFullTSUE:
    @pytest.fixture(scope="class")
    def full(self, small_windows):
        from tsue_tpu.data import BatchIterator
        cfg = ModelConfig(
            llama=TINY_L, qformer=dataclasses.replace(TINY_Q, vision_dim=512),
            lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
            ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16), use_llm=True)
        it = BatchIterator(small_windows, batch_size=4, shuffle=False)
        b = {k: jnp.asarray(v) for k, v in next(iter(it)).items()}
        b["input_ids"] = b["input_ids"][:, :32]   # trim text for test speed
        b["attention_mask"] = b["attention_mask"][:, :32]
        b["labels"] = b["labels"][:, :32]
        model = TrajectoryModel(cfg, 6, 6)
        vs = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)}, b, False)
        return model, vs, b

    def test_forward(self, full):
        model, vs, b = full
        pred = model.apply(vs, b, True)
        assert pred.shape == (4, 2, 6)
        assert jnp.isfinite(pred).all()

    def test_pad_tail_is_metric_neutral(self, full):
        """Foundation of DataConfig.length_buckets: appending all-pad
        text positions must not change the prediction (pad keys are
        attention-masked out of the LLM and of the forecaster's
        cross-attention), so the BatchIterator's bucket trimming is
        exact, not approximate."""
        import numpy as np
        model, vs, b = full
        wide = dict(b)
        pad = 16
        wide["input_ids"] = jnp.pad(b["input_ids"], ((0, 0), (0, pad)))
        wide["attention_mask"] = jnp.pad(b["attention_mask"],
                                         ((0, 0), (0, pad)))
        wide["labels"] = jnp.pad(b["labels"], ((0, 0), (0, pad)),
                                 constant_values=-100)
        p0 = model.apply(vs, b, True)
        p1 = model.apply(vs, wide, True)
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=1e-5)

    def test_param_tree_has_expected_groups(self, full):
        model, vs, b = full
        top = set(vs["params"].keys())
        assert {"lane_encoder", "mllm", "ltsf"} <= top
        mllm = set(vs["params"]["mllm"].keys())
        assert {"qformer", "llama", "text_modality_embedding"} <= mllm

    def test_frozen_mllm_step_moves_only_forecaster(self, full):
        from tsue_tpu.train.trainer import (TrainState, make_optimizer,
                                            make_train_step)
        import flax
        model, vs, b = full
        cfg = ExperimentConfig(
            name="t", data=DataConfig(seq_len=6, out_len=6),
            model=ModelConfig(use_llm=True),
            train=TrainConfig(batch_size=4, lr=1e-2,
                              freeze_regime="frozen_mllm"))
        tx = make_optimizer(cfg, vs["params"])
        apply_fn = lambda v, bb, det, rngs=None, **kw: model.apply(
            {"params": v["params"]}, bb, det, rngs=rngs, **kw)
        state = TrainState.create(apply_fn, vs["params"], tx)
        step = jax.jit(make_train_step(cfg))
        new_state, m = step(state, b, jax.random.key(0))
        assert jnp.isfinite(m["loss"])
        old = flax.traverse_util.flatten_dict(state.params)
        new = flax.traverse_util.flatten_dict(new_state.params)
        for k in old:
            same = np.allclose(np.asarray(old[k]), np.asarray(new[k]))
            if "mllm" in k:
                assert same, f"frozen param moved: {k}"
        moved = [k for k in old if "mllm" not in k and not np.allclose(
            np.asarray(old[k]), np.asarray(new[k]))]
        assert moved, "no forecaster params moved"
