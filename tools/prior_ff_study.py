"""Prior FF + temporal-attention formulation study (round 5).

The prior profile (tools/profile_bench.py --prior) attributes 805 ms of
device time per story as:

    temporal geglu FF   276 ms  (proj_in 169 TF/s, proj_out 108 TF/s)
    spatial  gelu  FF   201 ms  (proj_in 160 TF/s, proj_out 111 TF/s)
    temporal attn proj  156 ms  (~167-170 TF/s)
    frame-attn kernel    40 ms  (1.2 TF/s — 800 launch-bound tiny calls)
    spatial attn proj    93 ms  (~176 TF/s)

The FF down-projections run ~100 TF/s below the 204 TF/s chain-slope
ceiling — this study measures, at the prior's EXACT shapes (rows=970
= 2cfg x 5f x 97tok, c=2048, inner=8192):

  1. bare down-proj dot — is 108 TF/s intrinsic to (970, 8192, 2048)?
  2. the XLA gelu-FF pair as the model emits it (spatial FF)
  3. the XLA geglu pair (temporal FF)
  4. the fused geglu Pallas kernel on rows flattened 970 -> padded 1024
     (the model's (b, f, 97, c) layout fails fits_kernel's n>=128 gate;
     the FF is pointwise over tokens so rows can be flattened + padded)
  5. a block sweep at (c=2048, inner=8192) for the kernel picker
  6. frame-attention core: _bfnc Pallas kernel vs the XLA einsum path at
     (2, 5, 97, 2048), heads=8 (is 45 us/call launch overhead avoidable?)

Timing: in-jit chain slope with ELEMENTWISE feedback and long chains
(CLAUDE.md rule; scalar feedback gets algebraically hoisted).

Run on the real chip: python tools/prior_ff_study.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B, F, N, C = 2, 5, 97, 2048
ROWS = B * F * N              # 970
INNER = 4 * C                 # 8192


def sync(x):
    x.block_until_ready()
    return float(np.asarray(x[(0,) * x.ndim]))


def slope(fn, x, n1=8, n2=72):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, n):
        def body(i, a):
            y = fn(a).astype(a.dtype) * jnp.asarray(1e-20, a.dtype)
            return a + y

        return jax.lax.fori_loop(0, n, body, t)

    def timed(n):
        sync(chain(x, n))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(chain(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(n1), timed(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (ROWS, C), dt)
    xh = jax.random.normal(ks[1], (ROWS, INNER), dt)
    w1 = jax.random.normal(ks[2], (C, INNER), dt) / 45.0
    w1g = jax.random.normal(ks[3], (C, 2 * INNER), dt) / 45.0
    w2 = jax.random.normal(ks[4], (INNER, C), dt) / 90.0
    b1 = jnp.zeros((INNER,), dt)
    b1g = jnp.zeros((2 * INNER,), dt)
    b2 = jnp.zeros((C,), dt)

    rows = []

    def rec(label, t_s, flops):
        rows.append((label, t_s * 1e6, flops / t_s / 1e12))
        print(f"{label:44s} {t_s * 1e6:9.1f} us {flops / t_s / 1e12:7.1f} TF/s")

    # 1. bare down-proj; output (ROWS, C) padded back to the input shape so
    # the chain feedback stays elementwise
    f_down = 2 * ROWS * INNER * C
    t = slope(lambda a: jnp.pad(jnp.tanh(a @ w2), ((0, 0), (0, INNER - C))),
              xh)
    rec("bare down-proj dot (970x8192x2048)", t, f_down)

    # 1b. bare up-proj; output sliced back to the input width
    f_up = 2 * ROWS * C * INNER
    t = slope(lambda a: jnp.tanh(a @ w1)[:, :C], x)
    rec("bare up-proj dot (970x2048x8192)", t, f_up)

    # 2. XLA gelu FF pair (spatial FF, exact-erf fp32 gelu as in the model)
    def gelu_ff(a):
        h = a @ w1 + b1
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dt)
        return h @ w2 + b2

    f_pair = f_up + f_down
    t = slope(lambda a: jnp.tanh(gelu_ff(a)), x)
    rec("XLA gelu FF pair (as in model)", t, f_pair)

    # 3. XLA geglu pair (temporal FF)
    def geglu_xla(a):
        h = a @ w1g + b1g
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate.astype(jnp.float32),
                            approximate=False).astype(dt)
        return h @ w2 + b2

    f_geglu = 2 * f_up + f_down
    t = slope(lambda a: jnp.tanh(geglu_xla(a)), x)
    rec("XLA geglu pair (as in model)", t, f_geglu)

    # 4. fused geglu kernel, rows 970 padded to 1024
    from rcdms_tpu.ops import geglu as geglu_mod

    pad = 1024 - ROWS

    def kernel_padded(a):
        ap = jnp.pad(a, ((0, pad), (0, 0)))
        o = geglu_mod.geglu_ff(ap, w1g.astype(jnp.float32),
                               b1g.astype(jnp.float32),
                               w2.astype(jnp.float32), b2.astype(jnp.float32))
        return o[:ROWS]

    blocks = geglu_mod._pick_block(1024, C, INNER, 2)
    print(f"# picker blocks for (1024, {C}, {INNER}): {blocks}")
    if blocks is not None:
        t = slope(lambda a: jnp.tanh(kernel_padded(a)), x)
        rec("fused geglu kernel (rows 970->1024)", t, f_geglu)

    # 4b. fused GELU kernel (spatial FF), rows 970 padded to 1024
    def gelu_kernel_padded(a):
        ap = jnp.pad(a, ((0, pad), (0, 0)))
        o = geglu_mod.gelu_ff(ap, w1.astype(jnp.float32),
                              b1.astype(jnp.float32),
                              w2.astype(jnp.float32), b2.astype(jnp.float32))
        return o[:ROWS]

    t = slope(lambda a: jnp.tanh(gelu_kernel_padded(a)), x)
    rec("fused gelu kernel (rows 970->1024)", t, f_pair)

    # 5. block sweep at (c=2048, inner=8192), rows=1024 (override hook)
    for blk in [(512, 128), (256, 256), (256, 128), (128, 512), (128, 256),
                (128, 128), (64, 512), (64, 256), (1024, 128)]:
        if 1024 % blk[0] or INNER % blk[1]:
            continue
        geglu_mod.set_block_override(blk)
        try:
            t = slope(lambda a: jnp.tanh(kernel_padded(a)), x)
            rec(f"  geglu kernel blocks {blk}", t, f_geglu)
            t = slope(lambda a: jnp.tanh(gelu_kernel_padded(a)), x)
            rec(f"  gelu  kernel blocks {blk}", t, f_pair)
        except Exception as e:  # VMEM overflow etc. — record and move on
            print(f"  blocks {blk}: {type(e).__name__} {str(e)[:80]}")
        finally:
            geglu_mod.set_block_override(None)

    # 6. frame-attention core at the prior's temporal shape
    from rcdms_tpu.ops.frame_attention import (
        _bfnc_xla_reference,
        frame_attention_bfnc,
    )

    heads = 8
    q = jax.random.normal(ks[6], (B, F, N, C), dt)
    scale = (C // heads) ** -0.5
    f_attn = 2 * B * N * heads * F * F * (C // heads) * 2

    t = slope(lambda a: frame_attention_bfnc(a, a, a, heads, C, scale), q)
    rec("frame-attn Pallas kernel (2,5,97,2048)", t, f_attn)

    t = slope(lambda a: _bfnc_xla_reference(a, a, a, heads, scale, C), q)
    rec("frame-attn XLA einsum path", t, f_attn)

    print("\n# summary")
    for label, us, tf in rows:
        print(f"{label:44s} {us:9.1f} us {tf:7.1f} TF/s")


if __name__ == "__main__":
    main()
