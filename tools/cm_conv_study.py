"""Channel-major conv study: can the level-0 3x3 convs beat XLA's native
emitter by eliminating the 320->384 lane pad? (VERDICT r3 #2)

Level 0 (Cin=Cout=320, 64x64) is the one SD1.5 conv level where BOTH
prior formulations lose:
  * native conv: ~110 TF/s (65% of ceiling; BASELINE.md round 3)
  * taps9 token-major dots: 80 TF/s — N=320 pads to 384 lanes AND the
    K=320 contraction pads (tools/conv_variants_study.py)

The mxu_pad_study insight (BASELINE.md round 3): matmul time follows the
REAL contraction size when the contraction sits on fine-granularity
dims, and pads only burn MXU when they occupy tiles. A channel-major
formulation removes every pad at level 0:

    out (Cout, T) = sum_s  W_s (C, Cout)^T . x^T (C, T + s)

  - M = Cout = 320 on sublanes: no pad (granularity 8)
  - N = T = 4356 tokens on lanes: 66x66 zero-padded frame, +2.8% tile pad
  - K = C = 320 contraction: real-rate (no 384 pad)

The frame is embedded in a (C, 66*66) buffer with zero boundary rows and
columns, so every tap is a plain lane-offset slice — no masks, no
per-tap edge fixup; boundary output tokens hold garbage sums and are
re-zeroed by one fused mask multiply (they are the next conv's zero
padding).

Variants measured (chain-slope timing, elementwise feedback —
tools/chainbench.py conventions):
  native       lax.conv NHWC (the production path at level 0)
  taps9_tok    token-major 9-tap dots (the rejected level-0 formulation)
  cm_wx        channel-major, einsum 'cd,bct->bdt' (weights lhs)
  cm_xw        channel-major, einsum 'bct,cd->bdt' (activations lhs)

Rates are reported against REAL conv FLOPs (interior 64x64 outputs
only), so the +6.3% padded-token compute counts against the cm variants.

Run on the real chip: python tools/cm_conv_study.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from tools.chainbench import slope_time

B, H, W = 5, 64, 64
HP, WP = H + 2, W + 2          # zero-padded frame
T, TP = H * W, HP * WP
GUARD = WP + 2                  # max |tap shift| + 1: keeps slices in-buffer

TAPS = [dy * WP + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def real_flops(c: int, cout: int) -> float:
    return 2.0 * B * T * 9 * c * cout


# ---------------------------------------------------------------------------
# layout helpers (NHWC <-> padded channel-major), used by tests too
# ---------------------------------------------------------------------------


def to_cm(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, TP) with the frame at rows/cols [1, 65)."""
    b, h, w, c = x_nhwc.shape
    xt = jnp.transpose(x_nhwc, (0, 3, 1, 2))          # (B, C, H, W)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (1, 1), (1, 1)))
    return xt.reshape(b, c, TP)


def from_cm(x_cm: jnp.ndarray) -> jnp.ndarray:
    """(B, C, TP) -> (B, H, W, C), interior only."""
    b, c, _ = x_cm.shape
    xt = x_cm.reshape(b, c, HP, WP)[:, :, 1:-1, 1:-1]
    return jnp.transpose(xt, (0, 2, 3, 1))


def interior_mask() -> jnp.ndarray:
    """(1, 1, TP) float mask: 1 on interior tokens, 0 on the pad ring."""
    m = np.zeros((HP, WP), np.float32)
    m[1:-1, 1:-1] = 1.0
    return jnp.asarray(m.reshape(1, 1, TP))


def cm_conv(x_cm: jnp.ndarray, w9: jnp.ndarray, bias: jnp.ndarray,
            mask: jnp.ndarray, order: str = "wx") -> jnp.ndarray:
    """Channel-major 3x3 SAME conv. x_cm: (B, C, TP) padded frame (zero
    ring); w9: (9, C, Cout); returns (B, Cout, TP) padded frame (zero
    ring restored by `mask`). The slice buffer adds GUARD zeros on both
    ends so every tap is a static lane-offset slice."""
    b, c, _ = x_cm.shape
    dtype = x_cm.dtype
    xbuf = jnp.pad(x_cm, ((0, 0), (0, 0), (GUARD, GUARD)))
    acc = None
    for i, s in enumerate(TAPS):
        xs = jax.lax.dynamic_slice(xbuf, (0, 0, GUARD + s), (b, c, TP))
        if order == "wx":
            t = jnp.einsum("cd,bct->bdt", w9[i].astype(dtype), xs,
                           preferred_element_type=jnp.float32)
        else:
            t = jnp.einsum("bct,cd->bdt", xs, w9[i].astype(dtype),
                           preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    out = acc + bias.astype(jnp.float32)[None, :, None]
    return (out * mask).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas variant: force the K=C contraction onto SUBLANES (real-rate, no
# 320->384 pad — the nt-flash trick at conv shapes). Whole padded frame
# per grid cell in a lane-tile-aligned (C, TPAD) buffer; taps are
# in-kernel lane rolls (wraps land in the zero tail / discarded ring).
# ---------------------------------------------------------------------------

TPAD = 4608  # 36 lane tiles >= TP + max|shift|


def to_cm_pad(x_nhwc: jnp.ndarray) -> jnp.ndarray:
    x = to_cm(x_nhwc)
    return jnp.pad(x, ((0, 0), (0, 0), (0, TPAD - TP)))


def interior_mask_pad() -> jnp.ndarray:
    m = np.zeros((1, 1, TPAD), np.float32)
    m[:, :, :TP] = np.asarray(interior_mask())
    return jnp.asarray(m)


def _cm_kernel(x_ref, w_ref, b_ref, o_ref, *, shifts: bool):
    """out[:, t] = sum_s W_s^T x[:, t+s].

    Mosaic has no bf16 lane rotate ("Rotate with non-32-bit data"), so
    instead of shifting the bf16 operand we shift the fp32 PARTIAL SUMS:
    u_s = W_s^T x (no operand shift, real-K sublane contraction), then
    out = sum_s roll(u_s, -s) — fp32 rotates are supported. `shifts=False`
    drops the rotates (wrong results) to isolate the pure dot rate."""
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[0]                                  # (C, TPAD) bf16
    acc = None
    for i, s in enumerate(TAPS):
        u = jax.lax.dot_general(w_ref[i], x, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if shifts and s:
            u = pltpu.roll(u, (-s) % TPAD, axis=1)
        acc = u if acc is None else acc + u
    o_ref[0] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def cm_conv_pallas(x_cmp: jnp.ndarray, w9: jnp.ndarray, bias: jnp.ndarray,
                   mask: jnp.ndarray, shifts: bool = True) -> jnp.ndarray:
    """x_cmp: (B, C, TPAD); returns (B, Cout, TPAD), ring re-zeroed."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rcdms_tpu.ops.flash import kernel_interpret

    b, c, _ = x_cmp.shape
    cout = w9.shape[-1]
    dtype = x_cmp.dtype
    out = pl.pallas_call(
        functools.partial(_cm_kernel, shifts=shifts),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, TPAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, TPAD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, TPAD), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=kernel_interpret(),
    )(x_cmp, w9.astype(dtype), bias.reshape(cout, 1))
    return out * mask.astype(dtype)


def native_conv(x_nhwc, w_hwio, bias):
    y = jax.lax.conv_general_dilated(
        x_nhwc, w_hwio.astype(x_nhwc.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x_nhwc.dtype)


def taps9_tok(x_nhwc, w_hwio, bias):
    from rcdms_tpu.core.layers import _taps9_conv

    return _taps9_conv(x_nhwc[:, None], w_hwio, bias,
                       x_nhwc.dtype)[:, 0]


def main():
    print(f"backend: {jax.default_backend()}  B={B} {H}x{W}")
    key = jax.random.PRNGKey(0)
    for c, cout in [(320, 320)]:
        k1, k2, k3, key = jax.random.split(key, 4)
        x = jax.random.normal(k1, (B, H, W, c), jnp.bfloat16)
        w_hwio = jax.random.normal(k2, (3, 3, c, cout), jnp.bfloat16) \
            / np.sqrt(9 * c)
        bias = jax.random.normal(k3, (cout,), jnp.bfloat16)
        w9 = w_hwio.reshape(9, c, cout)
        mask = interior_mask()
        x_cm = jax.jit(to_cm)(x)
        fl = real_flops(c, cout)

        # correctness first: cm == native on the interior
        ref = np.asarray(jax.jit(native_conv)(x, w_hwio, bias), np.float32)
        got = np.asarray(jax.jit(from_cm)(
            jax.jit(lambda a: cm_conv(a, w9, bias, mask))(x_cm)),
            np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"  C={c}->{cout}: cm-vs-native rel err {err:.2e}")
        assert err < 2e-2, err

        x_cmp = jax.jit(to_cm_pad)(x)
        mask_p = interior_mask_pad()
        ref_pl = np.asarray(jax.jit(
            lambda a: cm_conv_pallas(a, w9, bias, mask_p))(x_cmp)
            [:, :, :TP], np.float32)
        got_pl = np.asarray(jax.jit(from_cm)(jnp.asarray(ref_pl)),
                            np.float32)
        err_pl = np.abs(got_pl - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"  C={c}->{cout}: pallas-vs-native rel err {err_pl:.2e}")
        assert err_pl < 2e-2, err_pl

        rows = [
            ("native", native_conv, x, (w_hwio, bias)),
            ("taps9_tok", taps9_tok, x, (w_hwio, bias)),
            ("cm_wx", lambda a, w, b2, m: cm_conv(a, w, b2, m, "wx"),
             x_cm, (w9, bias, mask)),
            ("cm_xw", lambda a, w, b2, m: cm_conv(a, w, b2, m, "xw"),
             x_cm, (w9, bias, mask)),
            ("cm_pallas", cm_conv_pallas, x_cmp, (w9, bias, mask_p)),
            ("cm_pl_dots", lambda a, w, b2, m: cm_conv_pallas(
                a, w, b2, m, shifts=False), x_cmp, (w9, bias, mask_p)),
        ]
        for name, fn, xin, consts in rows:
            t = slope_time(fn, xin, *consts)
            print(f"    {name:10s} {t * 1e3:7.3f} ms  "
                  f"{fl / t / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
