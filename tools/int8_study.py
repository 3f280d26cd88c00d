"""Is an opt-in w8a8 int8 inference mode worth building on this chip?

Measures (chain-slope timing, tools/chainbench.py conventions):
  1. the raw int8 vs bf16 MXU ratio at a big square matmul
  2. taps9-shaped dots (the stage-2 story's 576 ms of conv dots) in bf16
     vs int8 INCLUDING the dynamic activation quantize + fp32 dequant
  3. small-k (dh=40) score-shaped dots — does the real-k scaling that
     motivates the nt flash kernel hold for int8?
  4. PV-shaped lane-lane contractions (the nt kernel's padded-rate matmul)
  5. XLA's native conv lowering with int8 operands (level-0 shape)

Run on the one real chip: `python tools/int8_study.py`.
"""

from __future__ import annotations

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tools.chainbench import slope_time


def _rand_bf16(key, shape):
    return jax.random.normal(key, shape, jnp.bfloat16)


def _quant_int8(x):
    """Per-tensor symmetric dynamic quantization (fp -> int8, scale)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = amax / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def tf(flops, t):
    return flops / t / 1e12


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}")

    # --- 1. raw ratio ------------------------------------------------------
    N = 4096
    a = _rand_bf16(key, (N, N))
    w = _rand_bf16(jax.random.PRNGKey(1), (N, N))
    flops = 2 * N**3

    def dot_bf(a, w):
        return jax.lax.dot(a, w,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

    t = slope_time(dot_bf, a, w)
    print(f"[1] bf16 {N}^3: {t*1e3:.3f} ms  {tf(flops, t):.1f} TF/s")

    # int8 chain: keep the carried value bf16, quantize inside the timed fn
    # (that IS the production cost), dequantize the int32 out
    w_q, w_s = _quant_int8(w)

    def dot_i8(a, w_q, w_s):
        q, s = _quant_int8(a)
        o = jax.lax.dot_general(q, w_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (s * w_s)).astype(jnp.bfloat16)

    t = slope_time(dot_i8, a, w_q, w_s)
    print(f"[1] int8+q/dq {N}^3: {t*1e3:.3f} ms  {tf(flops, t):.1f} TOP/s")

    # --- 2. taps9-shaped dots ---------------------------------------------
    # one UNet call is b=5 frames (sequential CFG); taps9 applies the SAME
    # quantized activation to 9 shifted dots, so quantize cost amortizes 9x
    for (tok, cin, cout, tag) in [
        (5 * 32 * 32, 640, 640, "L1"),
        (5 * 16 * 16, 1280, 1280, "L2"),
        (5 * 32 * 32, 960, 640, "up-concat"),
        (5 * 64 * 64, 320, 320, "L0"),
    ]:
        a = _rand_bf16(key, (tok, cin))
        w = _rand_bf16(jax.random.PRNGKey(2), (cin, cout))
        w_q, w_s = _quant_int8(w)
        fl = 2 * tok * cin * cout * 9

        def taps_bf(a, w):
            acc = None
            for i in range(9):
                o = jax.lax.dot(a, w, preferred_element_type=jnp.float32)
                acc = o if acc is None else acc + o
            return acc.astype(jnp.bfloat16)

        def taps_i8(a, w_q, w_s):
            q, s = _quant_int8(a)
            acc = None
            for i in range(9):
                o = jax.lax.dot_general(q, w_q, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                acc = o if acc is None else acc + o
            return (acc.astype(jnp.float32) * (s * w_s)
                    ).astype(jnp.bfloat16)

        t_bf = slope_time(taps_bf, a, w)
        t_i8 = slope_time(taps_i8, a, w_q, w_s)
        print(f"[2] taps9 {tag} ({tok},{cin})@({cin},{cout}): "
              f"bf16 {t_bf*1e3:.3f} ms {tf(fl, t_bf):.1f} TF/s | "
              f"int8 {t_i8*1e3:.3f} ms {tf(fl, t_i8):.1f} TOP/s | "
              f"ratio {t_bf/t_i8:.2f}x")

    # --- 3. small-k score dots (flash score shape, per level-0 call) -------
    B, sq, skv, dh = 40, 4096, 4096, 40
    qm = _rand_bf16(key, (B, sq, dh))
    km = _rand_bf16(jax.random.PRNGKey(3), (B, skv, dh))
    fl = 2 * B * sq * skv * dh

    def score_bf(qm, km):
        return jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t_bf = slope_time(score_bf, qm, km)

    kq8, ks = _quant_int8(km)

    def score_i8(qm, kq8, ks):
        q8, s = _quant_int8(qm)
        o = jax.lax.dot_general(q8, kq8, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (s * ks)).astype(jnp.bfloat16)

    t_i8 = slope_time(score_i8, qm, kq8, ks)
    print(f"[3] score k={dh}: bf16 {t_bf*1e3:.3f} ms {tf(fl, t_bf):.1f} "
          f"TF/s | int8 {t_i8*1e3:.3f} ms {tf(fl, t_i8):.1f} TOP/s | "
          f"ratio {t_bf/t_i8:.2f}x")

    # --- 4. PV-shaped lane-lane contraction ---------------------------------
    # ot = vt (dh, skv) @ p^T (blk, skv): contract the LANE dims of both
    blk = 512
    vt = _rand_bf16(key, (B, dh, skv))
    p = _rand_bf16(jax.random.PRNGKey(4), (B, blk, skv))
    fl = 2 * B * dh * skv * blk

    def pv_bf(p, vt):
        return jax.lax.dot_general(
            vt, p, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t_bf = slope_time(pv_bf, p, vt)

    vq8, vs = _quant_int8(vt)

    def pv_i8(p, vq8, vs):
        # p is softmax output in [0, 1]: fixed scale 127, no amax pass
        p8 = jnp.round(p.astype(jnp.float32) * 127.0).astype(jnp.int8)
        o = jax.lax.dot_general(vq8, p8, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (vs / 127.0)).astype(jnp.bfloat16)

    t_i8 = slope_time(pv_i8, p, vq8, vs)
    print(f"[4] PV (dh={dh},skv)@(blk={blk},skv): bf16 {t_bf*1e3:.3f} ms "
          f"{tf(fl, t_bf):.1f} TF/s | int8 {t_i8*1e3:.3f} ms "
          f"{tf(fl, t_i8):.1f} TOP/s | ratio {t_bf/t_i8:.2f}x")

    # --- 5. native conv with int8 operands (level-0 shape) ------------------
    x = _rand_bf16(key, (5, 64, 64, 320))
    kx = _rand_bf16(jax.random.PRNGKey(5), (3, 3, 320, 320))
    fl = 2 * 5 * 64 * 64 * 9 * 320 * 320

    def conv_bf(x, kx):
        return jax.lax.conv_general_dilated(
            x, kx, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t_bf = slope_time(conv_bf, x, kx)

    kq8, ks = _quant_int8(kx)

    def conv_i8(x, kq8, ks):
        q, s = _quant_int8(x)
        o = jax.lax.conv_general_dilated(
            q, kq8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * (s * ks)).astype(jnp.bfloat16)

    try:
        t_i8 = slope_time(conv_i8, x, kq8, ks)
        print(f"[5] native conv L0: bf16 {t_bf*1e3:.3f} ms "
              f"{tf(fl, t_bf):.1f} TF/s | int8 {t_i8*1e3:.3f} ms "
              f"{tf(fl, t_i8):.1f} TOP/s | ratio {t_bf/t_i8:.2f}x")
    except Exception as e:  # pragma: no cover - informational
        print(f"[5] native conv L0: bf16 {t_bf*1e3:.3f} ms "
              f"{tf(fl, t_bf):.1f} TF/s | int8 FAILED: {e}")


if __name__ == "__main__":
    main()
