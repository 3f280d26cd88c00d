"""Dispatch-matrix governance test (VERDICT r4 #5): enumerate every
reachable combination of {attention impl} x {conv opt-in: default / cm /
int8} x {mesh / no mesh} and assert

  1. WHICH compute path actually engages (observed by counting calls into
     the formulation entry points — not by re-testing the gate predicates),
  2. that every engaged combination stays numerically correct against the
     impl="xla" oracle.

The opt-in precedence rules under test (core/layers.py):
  * taps9 needs Cin % 64 == 0 and Cin >= 640; single-chip only.
  * int8 (w8a8) extends taps9 down to any lane-aligned Cin and OUTRANKS
    the cm level-0 path; single-chip only.
  * cm (RCDMS_L0_CONV=cm) carries level-0 resnet blocks channel-major;
    single-chip only, yields to int8.
  * the nt flash and frame-attention kernels carry custom-partitioning
    rules and STAY ON under a mesh; the token-major fallback kernel and
    the conv formulations divert to XLA/native under a mesh.
  * masked attention can never reach a Pallas kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rcdms_tpu.core.attention as core_attention
import rcdms_tpu.core.layers as layers
import rcdms_tpu.ops.flash as flash
import rcdms_tpu.ops.frame_attention as frame_attention
import rcdms_tpu.ops.geglu as geglu
from rcdms_tpu.core.layers import FeedForward, FrameConv
from rcdms_tpu.core.resnet import ResnetBlock
from rcdms_tpu.ops.attention import (
    configure_for_mesh,
    set_default_attention_impl,
)
from rcdms_tpu.ops.quant import set_quant_mode
from rcdms_tpu.train.sharding import inference_mesh


@pytest.fixture(autouse=True)
def _clean_dispatch_state():
    flash.set_kernel_interpret(True)
    try:
        yield
    finally:
        flash.set_kernel_interpret(False)
        set_default_attention_impl("auto")
        set_quant_mode(None)
        configure_for_mesh(None)


@pytest.fixture
def counters(monkeypatch):
    """Count calls into each formulation's entry point. Entries are patched
    where the dispatch site looks them up (module globals of the defining
    module for locally-imported names; the importing module for names bound
    at import time)."""
    counts = {}

    def spy(module, name, key):
        orig = getattr(module, name)

        def wrapper(*a, **k):
            counts[key] = counts.get(key, 0) + 1
            return orig(*a, **k)

        monkeypatch.setattr(module, name, wrapper)

    spy(layers, "_taps9_conv", "taps9")
    spy(layers, "_taps9_conv_int8", "taps9_int8")
    spy(layers, "cm_conv3", "cm")
    spy(flash, "flash_attention_nt", "nt_flash")
    spy(flash, "flash_attention", "tm_flash")  # token-major fallback kernel
    spy(frame_attention, "frame_attention_bfnc", "frame_kernel")
    spy(geglu, "geglu_ff", "geglu")
    spy(geglu, "gelu_ff", "gelu")
    spy(geglu, "ff_flat", "ff_flat")
    spy(core_attention, "dot_product_attention", "xla_attn")
    return counts


def _configure(impl, env, mesh_on, monkeypatch):
    set_default_attention_impl(impl)
    set_quant_mode("int8" if env == "int8" else None)
    if env == "cm":
        monkeypatch.setenv("RCDMS_L0_CONV", "cm")
    else:
        monkeypatch.delenv("RCDMS_L0_CONV", raising=False)
    configure_for_mesh(inference_mesh(jax.devices()) if mesh_on else None)


IMPLS = ["xla", "pallas", "auto"]
ENVS = ["default", "cm", "int8"]
MESH = [False, True]
MATRIX = [(i, e, m) for i in IMPLS for e in ENVS for m in MESH]
_ids = [f"{i}-{e}-{'mesh' if m else 'single'}" for i, e, m in MATRIX]


class TestConvDispatch:
    """FrameConv 640->640 (taps9-eligible) and ResnetBlock 64->64
    (cm/int8-eligible level-0 stand-in)."""

    def _run_conv640(self):
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 2, 8, 8, 640)),
            jnp.float32)
        conv = FrameConv(640)
        params = conv.init(jax.random.PRNGKey(0), x)
        return np.asarray(conv.apply(params, x))

    def _run_resnet64(self):
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal((2, 3, 8, 8, 64)),
            jnp.float32)
        t = jnp.asarray(
            np.random.default_rng(2).standard_normal((2, 32)), jnp.float32)
        block = ResnetBlock(64, groups=8)
        params = block.init(jax.random.PRNGKey(0), x, t)
        return np.asarray(block.apply(params, x, t))

    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    def test_conv640_path(self, impl, env, mesh_on, counters, monkeypatch):
        _configure("xla", "default", False, monkeypatch)
        ref = self._run_conv640()
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = self._run_conv640()

        # 'auto' means TPU-only; on the CPU test backend it behaves as xla
        engaged = (impl == "pallas") and not mesh_on
        if engaged and env == "int8":
            expect = {"taps9_int8"}
            tol = dict(atol=0.15, rtol=0.05)  # w8a8 quantization error
        elif engaged:
            expect = {"taps9"}
            tol = dict(atol=2e-5, rtol=2e-5)
        else:
            expect = set()  # native conv
            tol = dict(atol=0, rtol=0)
        assert set(counters) == expect, (counters, impl, env, mesh_on)
        np.testing.assert_allclose(out, ref, **tol)

    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    def test_resnet64_path(self, impl, env, mesh_on, counters, monkeypatch):
        _configure("xla", "default", False, monkeypatch)
        ref = self._run_resnet64()
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = self._run_resnet64()

        engaged = (impl == "pallas") and not mesh_on
        if engaged and env == "int8":
            # int8 admits every lane-aligned 3x3 AND outranks cm
            expect, tol = {"taps9_int8"}, dict(atol=0.3, rtol=0.05)
        elif engaged and env == "cm":
            expect, tol = {"cm"}, dict(atol=2e-5, rtol=1e-5)
        else:
            # Cin=64 < 640: taps9 gate rejects; native conv everywhere else
            expect, tol = set(), dict(atol=0, rtol=0)
        assert set(counters) == expect, (counters, impl, env, mesh_on)
        np.testing.assert_allclose(out, ref, **tol)


class TestAttentionDispatch:
    """Spatial (long-seq, unmasked), masked (prior-style), and frame-axis
    attention across the same matrix. The conv opt-ins must never change
    attention routing, and vice versa."""

    def _spatial(self):
        from rcdms_tpu.core.attention import Attention

        x = jnp.asarray(
            np.random.default_rng(3).standard_normal((2, 256, 128)),
            jnp.float32)
        attn = Attention(heads=2, head_dim=64)
        params = attn.init(jax.random.PRNGKey(0), x)
        return np.asarray(attn.apply(params, x))

    def _masked(self):
        from rcdms_tpu.core.attention import Attention

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 97, 64)), jnp.float32)
        mask = jnp.triu(jnp.full((97, 97), -1e4, jnp.float32), k=1)
        attn = Attention(heads=2, head_dim=32)
        params = attn.init(jax.random.PRNGKey(0), x, mask=mask)
        return np.asarray(attn.apply(params, x, mask=mask))

    def _frame(self):
        from rcdms_tpu.core.attention import Attention

        x = jnp.asarray(
            np.random.default_rng(5).standard_normal((1, 5, 128, 64)),
            jnp.float32)
        attn = Attention(heads=2, head_dim=32, frame_axis=True)
        params = attn.init(jax.random.PRNGKey(0), x)
        return np.asarray(attn.apply(params, x))

    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    def test_spatial_path(self, impl, env, mesh_on, counters, monkeypatch):
        _configure("xla", "default", False, monkeypatch)
        ref = self._spatial()
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = self._spatial()

        if impl == "pallas":
            # nt kernel has a custom-partitioning rule: ON under a mesh too
            assert counters.get("nt_flash", 0) >= 1, counters
            assert "xla_attn" not in counters and "tm_flash" not in counters
            np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
        else:
            assert counters.get("xla_attn", 0) >= 1, counters
            assert "nt_flash" not in counters and "tm_flash" not in counters
            np.testing.assert_allclose(out, ref, atol=0, rtol=0)

    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    def test_masked_never_pallas(self, impl, env, mesh_on, counters,
                                 monkeypatch):
        _configure("xla", "default", False, monkeypatch)
        ref = self._masked()
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = self._masked()

        assert counters.get("xla_attn", 0) >= 1, counters
        assert "nt_flash" not in counters and "tm_flash" not in counters
        np.testing.assert_allclose(out, ref, atol=0, rtol=0)

    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    def test_frame_path(self, impl, env, mesh_on, counters, monkeypatch):
        _configure("xla", "default", False, monkeypatch)
        ref = self._frame()
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = self._frame()

        if impl == "pallas":
            # f and c are whole per shard: the kernel is mesh-safe
            assert counters.get("frame_kernel", 0) >= 1, counters
            np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
        else:
            assert "frame_kernel" not in counters, counters
            np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


class TestFeedForwardDispatch:
    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    def test_geglu_path(self, impl, env, mesh_on, counters, monkeypatch):
        x = jnp.asarray(
            np.random.default_rng(6).standard_normal((256, 64)), jnp.float32)
        ff = FeedForward("geglu")

        _configure("xla", "default", False, monkeypatch)
        params = ff.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(ff.apply(params, x))
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = np.asarray(ff.apply(params, x))

        if impl == "pallas":
            # the geglu kernel's SPMD rule is communication-free: stays on
            assert counters.get("geglu", 0) >= 1, counters
            assert "ff_flat" not in counters, counters  # n=256 tiles as-is
            np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
        else:
            assert "geglu" not in counters, counters
            np.testing.assert_allclose(out, ref, atol=0, rtol=0)

    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    def test_gelu_path(self, impl, env, mesh_on, counters, monkeypatch):
        """The plain-gelu fused kernel (prior spatial FF) routes exactly
        like geglu: direct when the token dim tiles."""
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((256, 64)), jnp.float32)
        ff = FeedForward("gelu")

        _configure("xla", "default", False, monkeypatch)
        params = ff.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(ff.apply(params, x))
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = np.asarray(ff.apply(params, x))

        if impl == "pallas":
            assert counters.get("gelu", 0) >= 1, counters
            assert "ff_flat" not in counters, counters
            np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
        else:
            assert "gelu" not in counters, counters
            np.testing.assert_allclose(out, ref, atol=0, rtol=0)

    @pytest.mark.parametrize("impl,env,mesh_on", MATRIX, ids=_ids)
    @pytest.mark.parametrize("activation", ["geglu", "gelu"])
    def test_flat_path(self, activation, impl, env, mesh_on, counters,
                       monkeypatch):
        """Short token dims (the prior's 97) flatten all leading dims into
        one row axis for the fused kernel — single-chip only: under a mesh
        the flatten would mix sharded axes, so it must divert to XLA."""
        x = jnp.asarray(
            np.random.default_rng(8).standard_normal((2, 5, 97, 64)),
            jnp.float32)
        ff = FeedForward(activation)

        _configure("xla", "default", False, monkeypatch)
        params = ff.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(ff.apply(params, x))
        counters.clear()

        _configure(impl, env, mesh_on, monkeypatch)
        out = np.asarray(ff.apply(params, x))

        kernel_key = "geglu" if activation == "geglu" else "gelu"
        if impl == "pallas" and not mesh_on:
            assert counters.get("ff_flat", 0) >= 1, counters
            assert counters.get(kernel_key, 0) >= 1, counters
            np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
        else:
            assert "ff_flat" not in counters, counters
            np.testing.assert_allclose(out, ref, atol=0, rtol=0)
