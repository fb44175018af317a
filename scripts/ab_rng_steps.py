"""Interleaved A/B: threefry vs rbg dropout keys on the stage-1 LM step
and the joint stage-2 step (real 1.31B dims, one process, alternating
windows per CLAUDE.md measurement rules).

Context: `TrainConfig.rng_impl="rbg"` measured -11% on the frozen-MLLM
stage-2 step (threefry mask generation for the trainable-path dropout is
VPU-heavy).  This script answers whether the same knob pays on the other
two train regimes so PARITY.md can state it per-workload.  Measured
(v5e, 2026-08-17): joint 667.4 -> 632.9 ms (-5.2%), stage-1 362.6 ->
345.4 ms (-4.7%).
Ref workloads: scripts/check_generation.py (stage-1 train side),
scripts/im_kim_train_GRN.py:976-1008 (joint regime).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_windows(step_fns, n=4, windows=3):
    """Alternate (label, fn) windows; fn() runs one fully-synced step.
    Returns {label: best_mean_seconds}."""
    best = {lbl: float("inf") for lbl, _ in step_fns}
    for w in range(windows):
        for lbl, fn in step_fns:
            fn()  # re-warm after switching executables
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            dt = (time.perf_counter() - t0) / n
            best[lbl] = min(best[lbl], dt)
            print(f"  w{w} {lbl}: {dt*1000:.1f} ms", flush=True)
    return best


def main():
    import jax
    from tsue_tpu.utils.jax_cache import configure
    configure(jax, min_secs=5.0)
    from bench import REAL_VOCAB, build, stage1_step_setup

    print(f"device: {jax.devices()[0]}", flush=True)
    keys = {"threefry": jax.random.key(0),
            "rbg": jax.random.key(0, impl="rbg")}

    # ---- joint stage-2 step (bs16, 18->30, remat) ----------------------
    from tsue_tpu.models.tsue import TrajectoryModel
    from tsue_tpu.train.trainer import (TrainState, make_optimizer,
                                        make_train_step)
    tcfg, _, tparams, tbatch = build(REAL_VOCAB, batch_size=16, seq_len=18,
                                     out_len=30, text_len=512,
                                     dtype_str="bfloat16")
    jcfg = dataclasses.replace(
        tcfg,
        model=dataclasses.replace(
            tcfg.model, llama=dataclasses.replace(tcfg.model.llama,
                                                  remat=True)),
        train=dataclasses.replace(tcfg.train, freeze_regime="joint"))
    jmodel = TrajectoryModel(jcfg.model, 18, 30)

    def apply_fn(vs, b, det, rngs=None, **kw):
        return jmodel.apply(vs, b, det, rngs=rngs, **kw)

    tx = make_optimizer(jcfg, tparams)
    state = TrainState.create(apply_fn, tparams, tx)
    step = jax.jit(make_train_step(jcfg), donate_argnums=0)
    holder = {"state": state}

    def run(k):
        holder["state"], m = step(holder["state"], tbatch, k)
        float(m["loss"])

    for lbl, k in keys.items():
        t0 = time.perf_counter()
        run(k)
        print(f"joint {lbl} compile+1step: {time.perf_counter()-t0:.1f} s",
              flush=True)
    joint = timed_windows([(lbl, (lambda k=k: run(k)))
                           for lbl, k in keys.items()])
    print({f"joint_{l}_ms": round(v * 1000, 1) for l, v in joint.items()},
          flush=True)
    del holder, state, tparams, tbatch

    # ---- stage-1 LM step (bs8, text 512, chunked CE) -------------------
    # exactly the benched workload: bench.stage1_step_setup is shared
    s1, params, opt_state, batch = stage1_step_setup(REAL_VOCAB)
    h1 = {"p": params, "o": opt_state}

    def run1(k):
        h1["p"], h1["o"], m = s1(h1["p"], h1["o"], batch, k)
        float(m["lm_loss"])

    for lbl, k in keys.items():
        t0 = time.perf_counter()
        run1(k)
        print(f"stage1 {lbl} compile+1step: {time.perf_counter()-t0:.1f} s",
              flush=True)
    s1res = timed_windows([(lbl, (lambda k=k: run1(k)))
                           for lbl, k in keys.items()])
    print({f"stage1_{l}_ms": round(v * 1000, 1) for l, v in s1res.items()},
          flush=True)

    print("RESULT", {
        **{f"joint_{l}_ms": round(v * 1000, 1) for l, v in joint.items()},
        **{f"stage1_{l}_ms": round(v * 1000, 1) for l, v in s1res.items()},
    }, flush=True)


if __name__ == "__main__":
    main()
