"""Canonical chain-slope microbench helper (CLAUDE.md conventions).

Times an op by running it n times back-to-back inside ONE jitted
fori_loop and taking the slope between two chain lengths — the ~35 ms
dispatch+fetch constant of this box's axon tunnel cancels out.

Two rules, learned the hard way (see tools/conv_variants_study.py):
  * ELEMENTWISE feedback. `a * scalar(y)` lets XLA's algebraic simplifier
    hoist the scalar through linear ops (dot(a*s, w) == s*dot(a, w)), the
    op leaves the loop, and the 'measurement' reports impossible TF/s.
    (Pallas kernels are opaque custom calls the simplifier cannot rewrite,
    so scalar feedback is safe for them — but elementwise is always safe.)
  * LONG chains (n1=24, n2=104): a 4->24 slope sits inside the dispatch
    constant's noise floor and once produced 287 TF/s for a ~100 TF/s op.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def feedback(a, y):
    """Elementwise, shape-safe dependency of the next input on the output:
    adds a vanishing slice of y into a (never hoistable, never DCE'd)."""
    y = y.astype(a.dtype) * jnp.asarray(1e-20, a.dtype)
    fa, fy = a.reshape(-1), y.reshape(-1)
    m = min(fa.shape[0], fy.shape[0])
    return fa.at[:m].add(fy[:m]).reshape(a.shape)


def slope_time(fn, x, *consts, n1: int = 24, n2: int = 104,
               reps: int = 3) -> float:
    """Per-call seconds of `y = fn(x, *consts)`. `x` is chained through
    `feedback`; `consts` pass through untouched."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, consts, n):
        def body(i, a):
            return feedback(a, fn(a, *consts))

        return jax.lax.fori_loop(0, n, body, t)

    def run(n):
        chain(x, consts, n).reshape(-1)[0].block_until_ready()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chain(x, consts, n)
            _ = np.asarray(r.reshape(-1)[0])  # force full tunnel drain
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n2) - run(n1)) / (n2 - n1)
