"""Opt-in w8a8 int8 inference quantization (mode state + helpers).

The v5e MXU runs int8 at ~2x its bf16 rate, and that ratio survives the
dynamic-quantization overhead at this model's real shapes
(tools/int8_study.py, 2026-08-18: 4096^3 dot 278 TOP/s including the
activation quantize/dequant vs 195 TF/s bf16; taps9-shaped conv dots
1.5-2.4x at SD1.5 levels 0-2).

Strictly OPT-IN and inference-only (`--quantize int8` on the inference
CLIs / `RCDMS_QUANT=int8` / `set_quant_mode("int8")`): the default path
and every training path are untouched, and the checkpoint tree never
changes — weights stay fp32 params and are quantized in-program with
per-output-channel symmetric scales (the quantize depends only on params,
so XLA's loop-invariant code motion hoists it out of the samplers'
`lax.scan`, i.e. weights are quantized once per program, not per step).
Activations are quantized dynamically per call with a per-tensor
symmetric scale (one extra amax pass, fused by XLA into the producing
elementwise op).

This replaces nothing in the reference (it has no quantized path) — it is
a TPU-serving capability on top of parity; quality deltas vs the exact
bf16 path are measured, not assumed (tests/test_quant.py, bench --int8).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jax.Array

_QUANT_MODE: str | None = (os.environ.get("RCDMS_QUANT") or None)

_VALID = (None, "int8")


def set_quant_mode(mode: str | None) -> None:
    """`None` (exact, default) or `"int8"` (w8a8 dynamic quantization on
    the inference compute paths that opted in)."""
    if mode not in _VALID:
        raise ValueError(f"quant mode {mode!r} not in {_VALID}")
    global _QUANT_MODE
    _QUANT_MODE = mode


def get_quant_mode() -> str | None:
    return _QUANT_MODE


def int8_enabled() -> bool:
    return _QUANT_MODE == "int8"


def quantize_act(x: Array) -> tuple[Array, Array]:
    """Per-tensor symmetric dynamic quantization: returns (int8 values,
    fp32 scalar scale) with x ~= values * scale. Zero-safe (an all-zero
    tensor gets scale 1/127, not a div-by-zero)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight(w: Array, out_axis: int = -1) -> tuple[Array, Array]:
    """Per-output-channel symmetric quantization: amax over every axis
    except `out_axis`. Returns (int8 weights, fp32 scales shaped like the
    out axis). Zero-initialized channels (the temporal modules' zero-init
    proj_out — reference motion_module.py:84-85) get scale 1/127 and stay
    exactly zero."""
    wf = w.astype(jnp.float32)
    axes = tuple(i for i in range(w.ndim) if i != out_axis % w.ndim)
    amax = jnp.max(jnp.abs(wf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(w.shape[out_axis % w.ndim])
