"""stop_llm_grad: identical updates, gradient truly severed."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsue_tpu.config import (DataConfig, ExperimentConfig, LlamaConfig,
                             LaneEncoderConfig, LTSFConfig, ModelConfig,
                             QFormerConfig, TrainConfig)
from tsue_tpu.data import BatchIterator
from tsue_tpu.models.tsue import TrajectoryModel
from tsue_tpu.train.losses import denorm_mse_loss

TINY = ModelConfig(
    llama=LlamaConfig.tiny(),
    qformer=QFormerConfig(vision_dim=512, hidden_size=48, num_heads=4,
                          num_encoder_layers=1, num_decoder_layers=1,
                          num_query_tokens=4),
    lane=LaneEncoderConfig(d_model=16, nhead=2, num_layers=1),
    ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16))


@pytest.fixture(scope="module")
def setup(small_windows):
    b = next(iter(BatchIterator(small_windows, batch_size=4, shuffle=False)))
    b = {k: jnp.asarray(v) for k, v in b.items()}
    b["input_ids"] = b["input_ids"][:, :32]
    b["attention_mask"] = b["attention_mask"][:, :32]
    model = TrajectoryModel(TINY, 6, 6)
    vs = model.init({"params": jax.random.key(0),
                     "dropout": jax.random.key(1)}, b, False)
    return model, vs, b


def _grads(model, vs, b, stop):
    def loss(params):
        pred = model.apply({"params": params}, b, True,
                           stop_llm_grad=stop)
        return denorm_mse_loss(pred, b["traj_out"], b["norm_stat"],
                               b["valid"])
    return jax.grad(loss)(vs["params"])


def test_forward_identical(setup):
    model, vs, b = setup
    p1 = model.apply(vs, b, True, stop_llm_grad=False)
    p2 = model.apply(vs, b, True, stop_llm_grad=True)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_trainable_grads_identical_mllm_grads_zero(setup):
    """With the whole mllm frozen, stopping its gradient changes nothing
    for trainable params — and zeroes the (discarded) mllm grads."""
    model, vs, b = setup
    g_full = _grads(model, vs, b, stop=False)
    g_stop = _grads(model, vs, b, stop=True)
    import flax
    f_full = flax.traverse_util.flatten_dict(g_full)
    f_stop = flax.traverse_util.flatten_dict(g_stop)
    for k in f_full:
        if "mllm" in k:
            np.testing.assert_allclose(np.asarray(f_stop[k]), 0.0,
                                       err_msg=str(k))
        else:
            np.testing.assert_allclose(np.asarray(f_full[k]),
                                       np.asarray(f_stop[k]),
                                       atol=1e-6, err_msg=str(k))
    # sanity: unstopped mllm grads are NOT all zero
    some = [np.abs(np.asarray(v)).max() for k, v in f_full.items()
            if "mllm" in k]
    assert max(some) > 0


def test_fast_candidate_rollout(setup):
    from tsue_tpu.eval.metrics import fast_candidate_rollout
    model, vs, b = setup
    cands = fast_candidate_rollout(model, vs, b, 4, jax.random.key(2))
    assert cands.shape == (4, 4, 2, 6)
    # forecaster dropout diversifies candidates
    assert not np.allclose(np.asarray(cands[:, 0]), np.asarray(cands[:, 1]))


def test_kv_precompute_equivalent(setup):
    """forecast_kv(preprojected K/V) == forecast(full hidden)."""
    model, vs, b = setup
    hidden, mask, poly = model.apply(vs, b, True,
                                     method=model.encode_context)
    ref = model.apply(vs, b, hidden, mask, poly, False,
                      method=model.forecast,
                      rngs={"dropout": jax.random.key(3)})
    kv, mask2, poly2 = model.apply(vs, b, True,
                                   method=model.encode_context_kv)
    out = model.apply(vs, b, kv, mask2, poly2, False,
                      method=model.forecast_kv,
                      rngs={"dropout": jax.random.key(3)})
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)
