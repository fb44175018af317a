"""Observability: structured metric logging, seeding, profiling hooks.

Replaces the reference's print-only logging (ref scripts/train.py:1220,
1326) with a JSONL metric stream next to the stdout echo, and the
seed-fixing block (ref scripts/seed_fix_train.py:2-32) with a single
helper (JAX needs no cuDNN/global-torch determinism switches — explicit
PRNG keys make runs reproducible by construction).
"""
from __future__ import annotations

import contextlib
import json
import os
import random
import time
from typing import Optional

import numpy as np


def seed_everything(seed: int = 42):
    """Seed host-side RNGs (splits, shuffles). Device randomness in this
    framework always flows through explicit jax.random keys."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


class MetricLogger:
    """JSONL metrics + stdout echo, process-0 only."""

    def __init__(self, out_dir: str, name: str = "metrics",
                 echo: bool = True):
        import jax
        self.is_primary = jax.process_index() == 0
        self.echo = echo
        self.path = None
        if self.is_primary:
            os.makedirs(out_dir, exist_ok=True)
            self.path = os.path.join(out_dir, f"{name}.jsonl")
            self._f = open(self.path, "a")
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        if not self.is_primary:
            return
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "item") or
                        isinstance(v, (int, float)) else v)
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.echo:
            kv = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else
                          f"{k}={v}" for k, v in rec.items() if k != "t")
            print(f"[{rec['t']:8.1f}s] {kv}", flush=True)

    def close(self):
        if self.is_primary:
            self._f.close()


@contextlib.contextmanager
def profile_trace(out_dir: Optional[str] = None):
    """jax.profiler trace context (perfetto dump) — SURVEY.md §5 tracing."""
    import jax
    if out_dir is None:
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
