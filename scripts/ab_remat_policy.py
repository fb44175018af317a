"""Interleaved A/B: full-recompute remat vs selective checkpoint_dots on
the joint stage-2 train step (1.31B dims, bs16, 18->30, rbg keys).

"dots" (LlamaConfig.remat_policy) saves every matmul output inside the
checkpointed layer so the backward skips the MXU recompute, at roughly
0.4 GB/layer of activation memory.  The question was whether that trade
fits one v5e chip's HBM next to the joint regime's AdamW state and, if
so, what it buys.  Measured (v5e, 2026-08-17): full 634.5 ms -> dots
566.9 ms (-10.7%); both fit.  One state (params + moments, donated
through both executables); the policy only changes the apply_fn closure,
never the math.  Ref workload: scripts/im_kim_train_GRN.py:976-1008.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POLICIES = ("full", "dots")


def main():
    import jax
    from tsue_tpu.utils.jax_cache import configure
    configure(jax, min_secs=5.0)
    from bench import REAL_VOCAB, build
    from ab_rng_steps import timed_windows
    from tsue_tpu.models.tsue import TrajectoryModel
    from tsue_tpu.train.trainer import (TrainState, make_optimizer,
                                        make_train_step)

    print(f"device: {jax.devices()[0]}", flush=True)
    tcfg, _, tparams, tbatch = build(REAL_VOCAB, batch_size=16, seq_len=18,
                                     out_len=30, text_len=512,
                                     dtype_str="bfloat16")

    def joint_cfg(policy):
        return dataclasses.replace(
            tcfg,
            model=dataclasses.replace(
                tcfg.model,
                llama=dataclasses.replace(tcfg.model.llama, remat=True,
                                          remat_policy=policy)),
            train=dataclasses.replace(tcfg.train, freeze_regime="joint",
                                      rng_impl="rbg"))

    # one apply_fn object per policy (apply_fn is static aux data on the
    # TrainState, so a stable identity keeps each jit cache warm)
    apply_fns, steps = {}, {}
    for policy in POLICIES:
        jcfg = joint_cfg(policy)
        jmodel = TrajectoryModel(jcfg.model, 18, 30)

        def apply_fn(vs, b, det, rngs=None, _m=jmodel, **kw):
            return _m.apply(vs, b, det, rngs=rngs, **kw)

        apply_fns[policy] = apply_fn
        steps[policy] = jax.jit(make_train_step(jcfg), donate_argnums=0)

    tx = make_optimizer(joint_cfg("full"), tparams)
    holder = {"state": TrainState.create(apply_fns["full"], tparams, tx)}
    k = jax.random.key(0, impl="rbg")

    def run_policy(policy):
        st = holder["state"].replace(apply_fn=apply_fns[policy])
        st, m = steps[policy](st, tbatch, k)
        holder["state"] = st
        float(m["loss"])

    ok = []
    for policy in POLICIES:
        t0 = time.perf_counter()
        try:
            run_policy(policy)
            ok.append(policy)
            print(f"{policy} compile+1step: {time.perf_counter()-t0:.1f} s",
                  flush=True)
        except Exception as e:
            # donate_argnums=0 means a failure AFTER donation leaves the
            # shared state deleted — nothing else can be measured then
            print(f"{policy}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            if any(x.is_deleted() for x in jax.tree.leaves(
                    holder["state"].params)):
                print("shared state was donated before the failure; "
                      "aborting (re-run with POLICIES reduced)", flush=True)
                return

    results = timed_windows([(p, (lambda p=p: run_policy(p))) for p in ok])
    print("RESULT", {f"joint_{p}_ms": round(v * 1000, 1)
                     for p, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
