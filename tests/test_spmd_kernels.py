"""SPMD partitioning rules for the Pallas kernels.

A bare pallas_call is an opaque custom call: the partitioner all-gathers
every operand and replicates the kernel on all devices. The nt flash kernel
and the frame-attention kernel carry `jax.experimental.custom_partitioning`
rules instead (ops/flash.py, ops/frame_attention.py): q rows stay sharded,
K/V context is gathered (flash) or nothing is communicated at all (frame
attention), and the kernel runs per shard. These tests run the kernels in
interpret mode on the 8-device CPU mesh and check both the numerics (vs the
unsharded run) and the compiled collectives (vs the wasteful default).

The reference has no equivalent — its multi-GPU story is NCCL data
parallelism only (`zero_stage2_config.json:12-21`); sharded single-story
inference is this rebuild's own latency path (BASELINE.md round-3 audit).
"""

import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.ops import flash
from rcdms_tpu.ops.attention import configure_for_mesh, spmd_mesh_mode
from rcdms_tpu.ops.flash import flash_attention_nt, _nt_xla_reference
from rcdms_tpu.ops.frame_attention import (
    frame_attention_bfnc,
    _bfnc_xla_reference,
)
from rcdms_tpu.train.sharding import inference_mesh

from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(autouse=True)
def _interpret_kernels():
    flash.set_kernel_interpret(True)
    try:
        yield
    finally:
        flash.set_kernel_interpret(False)
        configure_for_mesh(None)


def _collectives(compiled_text: str) -> Counter:
    return Counter(re.findall(
        r"(all-gather|all-reduce|collective-permute|all-to-all)",
        compiled_text))


def test_nt_flash_sharded_matches_and_gathers_kv_only():
    rng = np.random.default_rng(0)
    b, f, c, s, heads = 2, 1, 64, 512, 4
    qt, kt, vt = (jnp.asarray(rng.standard_normal((b, f, c, s)), jnp.float32)
                  for _ in range(3))
    scale = (c // heads) ** -0.5

    ref = _nt_xla_reference(qt, kt, vt, heads, scale)
    out = flash_attention_nt(qt, kt, vt, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    mesh = inference_mesh(jax.devices())
    sh = NamedSharding(mesh, P("cfg", None, None, "space"))
    qs, ks, vs = (jax.device_put(t, sh) for t in (qt, kt, vt))
    fn = jax.jit(lambda a, k, v: flash_attention_nt(a, k, v, heads, scale))
    out_sh = fn(qs, ks, vs)

    # numerics: per-shard kernel == unsharded kernel
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out), atol=2e-5)
    # output q rows stay sharded — the kernel was NOT replicated
    assert "space" in tuple(out_sh.sharding.spec)
    # communication: K/V context gathers only — no all-reduce, no
    # all-to-all, and no q gather (q has 'space' only on its token axis,
    # which the rule keeps local)
    colls = _collectives(fn.lower(qs, ks, vs).compile().as_text())
    assert colls.get("all-reduce", 0) == 0 and colls.get("all-to-all", 0) == 0
    assert 0 < colls.get("all-gather", 0) <= 8, colls


def test_nt_flash_small_local_shard_falls_back_exactly():
    """Global tokens pass nt_ok but a per-shard slice may not (e.g. 256
    tokens over 'space' 4 = 64 rows/shard): the per-device lowering must
    fall back to the XLA oracle and still match."""
    rng = np.random.default_rng(1)
    b, c, s, heads = 2, 64, 256, 4
    qt, kt, vt = (jnp.asarray(rng.standard_normal((b, c, s)), jnp.float32)
                  for _ in range(3))
    scale = (c // heads) ** -0.5
    ref = flash_attention_nt(qt, kt, vt, heads, scale)

    mesh = inference_mesh(jax.devices())
    sh = NamedSharding(mesh, P("cfg", None, "space"))
    qs, ks, vs = (jax.device_put(t, sh) for t in (qt, kt, vt))
    out = jax.jit(
        lambda a, k, v: flash_attention_nt(a, k, v, heads, scale))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_frame_attention_sharded_no_collectives():
    rng = np.random.default_rng(2)
    b, f, n, c_real, heads = 2, 5, 256, 48, 4
    c_pad = 128

    def mk():
        t = np.zeros((b, f, n, c_pad), np.float32)
        t[..., :c_real] = rng.standard_normal((b, f, n, c_real))
        return jnp.asarray(t)

    q, k, v = mk(), mk(), mk()
    ref = _bfnc_xla_reference(q, k, v, heads, (c_real // heads) ** -0.5,
                              c_real)
    out = frame_attention_bfnc(q, k, v, heads, c_real)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    mesh = inference_mesh(jax.devices())
    sh = NamedSharding(mesh, P("cfg", None, "space", None))
    qs, ks, vs = (jax.device_put(t, sh) for t in (q, k, v))
    fn = jax.jit(lambda a, kk, vv: frame_attention_bfnc(a, kk, vv, heads,
                                                        c_real))
    out_sh = fn(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out),
                               atol=2e-5)
    # temporal attention at a token needs only that token's f frames:
    # b/n-sharded inputs require ZERO communication
    assert sum(_collectives(
        fn.lower(qs, ks, vs).compile().as_text()).values()) == 0


def test_configure_for_mesh_keeps_kernels():
    """Under a >1-device mesh the partitioned kernels stay enabled (the
    round-2 behavior forced everything to XLA); only the rule-less
    token-major fallback is diverted."""
    from rcdms_tpu.ops.attention import get_default_attention_impl

    assert not spmd_mesh_mode()
    configure_for_mesh(inference_mesh(jax.devices()))
    assert spmd_mesh_mode()
    assert get_default_attention_impl() != "xla"
    configure_for_mesh(None)
    assert not spmd_mesh_mode()


@pytest.mark.slow
def test_spatial_transformer_sharded_with_kernels():
    """A full SpatialTransformer (DenseNT projections -> partitioned nt
    kernel -> DenseTN) sharded over ('cfg','space') must match its own
    unsharded output with the Pallas path forced on."""
    from rcdms_tpu.core.attention import SpatialTransformer
    from rcdms_tpu.ops.attention import set_default_attention_impl

    set_default_attention_impl("pallas")
    try:
        mesh = inference_mesh(jax.devices())
        configure_for_mesh(mesh)
        model = SpatialTransformer(heads=4, head_dim=16, norm_groups=8)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 1, 32, 32, 64)), jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((2, 1, 77, 64)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, ctx)

        ref = jax.jit(model.apply)(params, x, ctx)
        sh = NamedSharding(mesh, P("cfg", None, "space", None, None))
        xs = jax.device_put(x, sh)
        ctxs = jax.device_put(ctx, NamedSharding(mesh, P("cfg")))
        got = jax.jit(model.apply)(params, xs, ctxs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-5)
    finally:
        set_default_attention_impl("auto")


@pytest.mark.slow
def test_sharded_generate_with_kernels_matches():
    """The flagship path: the full two-stage pipeline over the inference
    mesh with the Pallas kernels FORCED on (interpret mode) must equal the
    unsharded kernel run — i.e. the partitioned kernels are safe inside
    the jitted sampling scans, not just in isolation."""
    import dataclasses

    from rcdms_tpu.ops.attention import set_default_attention_impl
    from rcdms_tpu.sample.pipeline import build_tiny_pipeline

    set_default_attention_impl("pallas")
    try:
        pipeline, params, inputs = build_tiny_pipeline(jax.random.PRNGKey(4))
        key = jax.random.PRNGKey(5)
        frames_ref, embeds_ref = jax.jit(pipeline.generate)(params, inputs,
                                                            key)
        mesh = inference_mesh(jax.devices())
        configure_for_mesh(mesh)
        sharded = dataclasses.replace(
            pipeline, mesh=mesh,
            prior_sampler=dataclasses.replace(pipeline.prior_sampler,
                                              mesh=mesh),
            story_sampler=dataclasses.replace(pipeline.story_sampler,
                                              mesh=mesh))
        frames_sh, embeds_sh = jax.jit(sharded.generate)(params, inputs, key)
        np.testing.assert_allclose(np.asarray(frames_sh),
                                   np.asarray(frames_ref),
                                   atol=5e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(embeds_sh),
                                   np.asarray(embeds_ref),
                                   atol=5e-5, rtol=1e-5)
    finally:
        set_default_attention_impl("auto")
