"""Dot-product attention op with selectable backend.

The XLA einsum path is the correctness oracle and CPU path; the Pallas
flash-attention kernel (rcdms_tpu.ops.flash) is used on TPU for long spatial
sequences (SURVEY.md §7 step 8). Replaces the reference's hand-rolled
baddbmm+softmax and sliced/xformers fallbacks
(`/root/reference/src/models/attention.py:170-251`) — on TPU, memory-slicing
is unnecessary: we either fuse via Pallas or let XLA tile.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# module-level default backend; tests force "xla", TPU runs flip to "pallas"
_DEFAULT_IMPL = "auto"


def set_default_attention_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "pallas")
    _DEFAULT_IMPL = impl


def get_default_attention_impl() -> str:
    return _DEFAULT_IMPL


# True when the program is being built for a >1-device mesh: the nt flash
# and frame-attention kernels stay on (they carry custom-partitioning
# rules — q rows stay sharded, K/V are gathered, the kernel runs per
# shard), but the token-major fallback kernel has no rule and would be
# all-gathered + replicated by the partitioner, so it is routed to XLA.
_SPMD_MESH = False


def configure_for_mesh(mesh) -> None:
    """Configure attention dispatch for a device mesh.

    A bare pallas_call is an opaque custom call: the partitioner
    ALL-GATHERS q/k/v and runs the kernel fully replicated on every device
    (verified: 3 all-gathers per attention on an 8-device mesh). The nt
    flash kernel (ops/flash.py) and the frame-attention kernel
    (ops/frame_attention.py) therefore carry jax custom-partitioning rules
    — per-shard lowering, KV gathers only, exactly the einsum path's
    communication — and stay enabled under a mesh. Only the token-major
    fallback kernel (rule-less, off the TPU hot path) is diverted to the
    XLA einsum, which GSPMD partitions exactly."""
    global _SPMD_MESH
    _SPMD_MESH = mesh is not None and getattr(mesh, "size", 1) > 1


def spmd_mesh_mode() -> bool:
    return _SPMD_MESH


def _use_pallas(q: Array, mask: Optional[Array]) -> bool:
    if jax.default_backend() != "tpu" or _SPMD_MESH:
        return False
    # pallas kernel: self/cross attention, no additive mask, long-ish q
    seq_q, head_dim = q.shape[-2], q.shape[-1]
    return mask is None and seq_q >= 256 and head_dim <= 256


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> Array:
    """Multi-head attention.

    Args:
      q: (..., heads, seq_q, head_dim)
      k: (..., heads, seq_k, head_dim)
      v: (..., heads, seq_k, head_dim)
      mask: optional additive mask broadcastable to (..., heads, seq_q, seq_k)
        (float, -inf style) — matches the reference's additive-bias masking.
      scale: defaults to head_dim**-0.5.

    Returns: (..., heads, seq_q, head_dim), dtype of q.
    """
    impl = impl or _DEFAULT_IMPL
    if scale is None:
        scale = q.shape[-1] ** -0.5

    # masked attention can never go to the flash kernel (it has no mask
    # support) — even when impl is forced to "pallas"; under a >1-device
    # mesh the rule-less token-major kernel always defers to XLA
    if mask is None and not _SPMD_MESH and (
            impl == "pallas" or (impl == "auto" and _use_pallas(q, mask))):
        from rcdms_tpu.ops.flash import flash_attention, kernel_interpret
        return flash_attention(q, k, v, scale=scale,
                               interpret=kernel_interpret())

    dtype = q.dtype
    # softmax numerics in fp32 (reference upcast_softmax equivalent, always on)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("...qk,...kd->...qd", probs, v)
