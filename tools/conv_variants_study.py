"""Conv formulation study — can the stage-2 UNet's dominant 3x3 convs beat
XLA's native conv lowering? (BASELINE.md round 3: bare level-0 convs run at
117 TF/s = 67% of the 175 TF/s practical ceiling, and ~83% of the loss is
the 320 -> 384 channel-lane pad; conv fusions are ~45% of the story step.)

Hypothesis from the MXU contraction-granularity study
(tools/mxu_pad_study.py): contraction over SUBLANE dims runs at the REAL
size (8-row granularity) while lane dims run padded to 128. A 3x3 conv can
be reformulated as matmuls whose pads are smaller than the conv's:

  xla_conv     lax.conv NHWC/HWIO — the baseline the UNet uses today.
  taps9_nhwc   sum of 9 shifted (BHW, Cin) @ (Cin, Cout) matmuls
               (K = Cin = 320 pads to 384 on lanes; N = Cout pads too).
  rows3_nhwc   concat 3 row-shifted copies -> (BHW, 3Cin) @ (3Cin, Cout):
               K = 960 pads to 1024 (6.7%), one materialized 3x copy.
  im2col_nhwc  full (BHW, 9Cin) @ (9Cin, Cout): K = 2880 pads to 2944
               (2.2%) but materializes 9x the activation bytes.
  taps9_cm     channel-major: sum of 9 W_tap(Cout, Cin) @ x(Cin, tokens)
               with token-shifted views — Cout on SUBLANES (real 320),
               contraction K = Cin = 320 pads on lanes.
  matmul_*     the bare equivalent matmuls without shift/materialize cost
               (speed-of-light anchors for the formulations).

Timing: in-jit fori_loop chain slope (difference of long and short chains
inside ONE compiled program — per-dispatch tunnel overhead on this box is
~1.5 ms and swamps per-call timing; see tools/conv_study.py). Run on the
real chip:
    python tools/conv_variants_study.py [--level 0|1|2]
"""

from __future__ import annotations

import argparse
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

# level -> (batch = b*f*cfg-seq, H, W, C)
LEVELS = {0: (10, 64, 64, 320), 1: (10, 32, 32, 640), 2: (10, 16, 16, 1280)}


def timed(fn, x, w, n1=24, n2=104):
    """Per-call seconds via in-jit chain slope: run the op n times
    back-to-back inside one program, time n1 and n2, and take the slope.

    The feedback must be ELEMENTWISE, not a scalar: with `a * scalar(y)`
    XLA's algebraic simplifier hoists the scalar through the linear op
    (dot(a*s, w) == s*dot(a, w)), the dot becomes loop-invariant, and the
    'measurement' reports thousands of TF/s. Adding y (flattened, sliced
    to a's size) into a defeats hoisting; the add costs one extra
    read+write of a per step — identical across variants.

    Chains must be LONG (n1=24, n2=104): the constant term (dispatch +
    fetch through the axon tunnel) is ~35 ms, and a 4->24 slope's noise
    floor produced a 'measurement' of 287 TF/s for an op that runs at
    ~100 (verified by 4/24/54/104 linearity sweep, 2026-08-17)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(t, w, n):
        def body(i, a):
            y = fn(a, w).astype(a.dtype) * jnp.asarray(1e-20, a.dtype)
            flat_a, flat_y = a.reshape(-1), y.reshape(-1)
            m = min(flat_a.shape[0], flat_y.shape[0])
            return flat_a.at[:m].add(flat_y[:m]).reshape(a.shape)

        return jax.lax.fori_loop(0, n, body, t)

    def run(n):
        chain(x, w, n)[(0,) * x.ndim].block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(x, w, n)
            _ = np.asarray(r[(0,) * r.ndim])
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(n2) - run(n1)) / (n2 - n1)


def conv_flops(b, h, w, cin, cout):
    return 2 * b * h * w * 9 * cin * cout


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def taps9_nhwc(x, w):
    b, h, ww, c = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, ww, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, ww, c))
            acc += jnp.einsum("bhwc,cd->bhwd", xs, w[dy, dx],
                              preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def rows3_nhwc(x, w):
    b, h, ww, c = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    rows = jnp.concatenate(
        [jax.lax.dynamic_slice(xp, (0, dy, 0, 0), (b, h, ww, c))
         for dy in range(3)], axis=-1)                    # (b, h, w, 3c)
    rows = jnp.pad(rows, ((0, 0), (0, 0), (1, 1), (0, 0)))
    # rows channel blocks are dy-major, so the per-dx weight must concat
    # over dy: w3[dx] = [w[0,dx]; w[1,dx]; w[2,dx]]
    w3 = jnp.transpose(w, (1, 0, 2, 3)).reshape(3, 3 * c, cout)
    acc = jnp.zeros((b, h, ww, cout), jnp.float32)
    for dx in range(3):
        xs = jax.lax.dynamic_slice(rows, (0, 0, dx, 0), (b, h, ww, 3 * c))
        acc += jnp.einsum("bhwc,cd->bhwd", xs, w3[dx],
                          preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def im2col_nhwc(x, w):
    b, h, ww, c = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, ww, c))
         for dy in range(3) for dx in range(3)], axis=-1)  # (b, h, w, 9c)
    out = jnp.einsum("bhwc,cd->bhwd", cols, w.reshape(9 * c, cout),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def taps9_cm(xt, w):
    """Channel-major: xt (b, c, h, w); returns (b, cout, h, w)."""
    b, c, h, ww = xt.shape
    cout = w.shape[-1]
    xp = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1)))
    acc = jnp.zeros((b, cout, h, ww), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, 0, dy, dx), (b, c, h, ww))
            # (cout, cin) @ (cin, hw): contraction on A's lanes,
            # cout lands on sublanes (real size, 8-granularity)
            acc += jnp.einsum("dc,bchw->bdhw", w[dy, dx].T, xs,
                              preferred_element_type=jnp.float32)
    return acc.astype(xt.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=0, choices=[0, 1, 2])
    args = ap.parse_args()

    b, h, w_, c = LEVELS[args.level]
    cout = c
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w_, c)), jnp.bfloat16)
    xt = jnp.transpose(x, (0, 3, 1, 2))
    w = jnp.asarray(rng.standard_normal((3, 3, c, cout)) * 0.02,
                    jnp.bfloat16)
    fl = conv_flops(b, h, w_, c, cout)
    print(f"level {args.level}: x {x.shape} bf16, {fl/1e9:.2f} GFLOP/conv")

    ref = np.asarray(xla_conv(x, w), np.float32)
    rows = []
    for name, fn, inp in [
        ("xla_conv", xla_conv, x),
        ("taps9_nhwc", taps9_nhwc, x),
        ("rows3_nhwc", rows3_nhwc, x),
        ("im2col_nhwc", im2col_nhwc, x),
        ("taps9_cm", taps9_cm, xt),
    ]:
        out = np.asarray(fn(inp, w), np.float32)
        if name == "taps9_cm":
            out = np.transpose(out, (0, 2, 3, 1))
        err = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9)
        t = timed(fn, inp, w)
        rows.append((name, t, fl / t / 1e12, err))
        print(f"  {name:<14} {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s  "
              f"rel-err {err:.2e}", flush=True)

    # speed-of-light anchors: the bare matmuls without shift/materialize
    tok = b * h * w_
    a = jnp.asarray(rng.standard_normal((tok, 9 * c)), jnp.bfloat16)
    wb = jnp.asarray(rng.standard_normal((9 * c, cout)), jnp.bfloat16)
    t = timed(lambda p, q: p @ q, a, wb)
    print(f"  {'matmul_im2col':<14} {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s"
          f"  (no gather cost)")
    at = jnp.asarray(rng.standard_normal((cout, c)), jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((b, c, h * w_)), jnp.bfloat16)

    def nine_cm(wm, xm):
        acc = jnp.zeros((b, cout, h * w_), jnp.float32)
        for i in range(9):
            # roll makes each tap's dot distinct (9 identical einsums CSE
            # into one and the anchor reads 9x too fast)
            acc += jnp.einsum("dc,bcn->bdn", jnp.roll(wm, i, axis=0), xm,
                              preferred_element_type=jnp.float32)
        return acc

    t = timed(nine_cm, at, xb)
    print(f"  {'matmul_taps_cm':<14} {t*1e3:7.3f} ms  {fl/t/1e12:6.1f} TF/s"
          f"  (no shift cost)")


if __name__ == "__main__":
    main()
