"""Two-process distributed worker — launched by tests/test_two_process.py.

NOT a pytest file (no test_ prefix).  Each of the two processes runs this
with 4 forced host devices, forming a 2-process x 4-device = 8-device
global CPU mesh via ``initialize_distributed`` (the env-var contract that
replaces the reference's torchrun MASTER_PORT/WORLD_SIZE/LOCAL_RANK, ref
scripts/train.py:24-25,1044-1049).  It then exercises every
``jax.process_count() > 1`` branch in the framework:

1. ``shard_batch``'s ``make_array_from_process_local_data`` path
   (parallel/mesh.py) — per-process local rows assemble into one global
   array whose reduction sees both processes' data;
2. the full ``run_stage2`` pipeline: sharded-batch training with
   cross-process gradient reduction, the collective best-val checkpoint
   save, the in-memory best-params copy/restore (runner.py
   ``best_params_mem``), and multi-process evaluation metrics;
3. ``distributed_generate_and_save``'s ``process_allgather`` result
   gather + process-0 file write (ref dist.all_gather_object,
   check_generation.py:359-369);
4. ``barrier`` (ref dist.barrier).

Prints one ``RESULT {json}`` line; the parent asserts cross-process
agreement and parity with a single-process run of the same config.
"""
import json
import os
import sys


def main():
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    out_dir = sys.argv[4]

    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(n_proc)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)
    import jax
    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tsue_tpu.utils.jax_cache import configure as _configure_cache
    _configure_cache(jax)

    from tsue_tpu.parallel.mesh import (barrier, initialize_distributed,
                                        is_primary, make_mesh, shard_batch)
    assert initialize_distributed(), "env-signalled init must succeed"
    assert jax.process_count() == n_proc
    assert len(jax.local_devices()) == 4 and jax.device_count() == 8
    assert is_primary() == (proc_id == 0)

    import numpy as np
    import jax.numpy as jnp

    # --- 1. shard_batch: local shard -> global array ----------------------
    mesh = make_mesh()
    local = {"x": np.full((4, 3), proc_id, np.float32)}
    g = shard_batch(local, mesh)["x"]
    assert g.shape == (8, 3), f"global shape {g.shape}"
    total = float(jnp.sum(g))  # sums BOTH processes' contributions
    assert total == 12.0, f"cross-process sum {total}"

    # --- 2. full stage-2 pipeline under 2 processes -----------------------
    import dataclasses
    from tsue_tpu.config import (DataConfig, LaneEncoderConfig, LTSFConfig,
                                 ModelConfig, TrainConfig, get_preset)
    from tsue_tpu.runner import run_stage2

    cfg = dataclasses.replace(
        get_preset("mllm_free_18_18"),
        data=DataConfig(seq_len=6, out_len=6, max_length=64,
                        use_text=False, use_vision=False),
        model=ModelConfig(use_llm=False,
                          lane=LaneEncoderConfig(d_model=16, nhead=2,
                                                 num_layers=1),
                          ltsf=LTSFConfig(d_model=16, polygon_embed_dim=16)),
        train=TrainConfig(batch_size=8, lr=1e-3, freeze_regime="joint"))
    # viz_every=1 exercises the multi-process gate (the qualitative
    # sample is a single-process feature and must be a clean no-op here)
    metrics = run_stage2(cfg, None, out_dir, epochs=2, eval_candidates=2,
                         save_viz=False, synthetic_tracks=8, viz_every=1)

    # --- 3. distributed generation gather ---------------------------------
    from tsue_tpu.config import LlamaConfig, QFormerConfig
    from tsue_tpu.data import (build_windows, get_tokenizer,
                               make_synthetic_tracks, split_tracks)
    from tsue_tpu.eval.generation import distributed_generate_and_save
    from tsue_tpu.models.fusion import MultiModalLLM

    tok = get_tokenizer()
    dcfg = DataConfig(seq_len=6, out_len=6, stride=6, max_length=640)
    tracks = make_synthetic_tracks(num_tracks=4, track_len=400, seed=0)
    ds = build_windows(tracks, dcfg, tok)
    assert len(ds) > 0
    mllm = MultiModalLLM(llama=LlamaConfig.tiny(tok.vocab_size),
                         qformer=QFormerConfig(num_encoder_layers=1,
                                               num_decoder_layers=1,
                                               num_query_tokens=4))
    b0 = {k: jnp.asarray(v)
          for k, v in ds.slice(np.array([0])).as_batch_dict().items()}
    variables = mllm.init({"params": jax.random.key(0)}, b0["vision"],
                          b0["input_ids"], b0["attention_mask"])
    gen_path = os.path.join(out_dir, "gen.txt")
    records = distributed_generate_and_save(
        mllm, variables, tok, ds, gen_path, jax.random.key(5),
        batch_size=4, max_new_tokens=4)
    if is_primary():
        assert len(records) > 0 and os.path.exists(gen_path)
        n_gen = len(records)
    else:
        assert records == []  # decode happens on process 0 only
        n_gen = -1

    # --- 4. barrier --------------------------------------------------------
    barrier("worker-end")

    print("RESULT " + json.dumps(
        {"proc": proc_id, "n_gen": n_gen,
         **{k: float(v) for k, v in metrics.items()}}), flush=True)


if __name__ == "__main__":
    main()
