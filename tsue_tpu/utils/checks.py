"""Runtime checking utilities (SURVEY.md §5: race detection / sanitizers).

JAX's functional purity removes data races by construction; the remaining
hazard class is numeric (NaN/Inf) and out-of-bounds indexing inside jit.
``checked`` wraps a jitted function with ``jax.experimental.checkify`` so
those errors surface as Python exceptions with locations instead of
silently propagating — the framework's answer to the reference's ad-hoc
debug prints (ref scripts/modify_im_kim_train.py DEBUG insertions).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.experimental import checkify


def checked(fn: Callable, errors=None) -> Callable:
    """Wrap ``fn`` so NaN/div/OOB errors raise on call.

    Usage: loss = checked(train_step)(state, batch, rng)
    """
    errors = errors or (checkify.float_checks | checkify.index_checks)
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
