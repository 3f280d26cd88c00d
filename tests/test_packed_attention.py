"""Packed (pre-padded-lane) Pallas attention paths: the projections emit
zero-padded lanes (core/layers.py::PaddedDense) and the kernels consume
them with no runtime HBM pad/transpose. Interpret mode on CPU vs the XLA
oracle, plus module-level equality (pallas-interpret vs xla dispatch) and
gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.core.attention import Attention
from rcdms_tpu.core.layers import PaddedDense
from rcdms_tpu.ops import flash
from rcdms_tpu.ops import frame_attention as fa
from rcdms_tpu.ops.attention import set_default_attention_impl

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


@pytest.fixture
def interpret_kernels():
    flash.set_kernel_interpret(True)
    yield
    flash.set_kernel_interpret(False)


def test_flash_nt_matches_oracle(interpret_kernels):
    """Channel-major kernel vs the nt oracle at several (heads, dh),
    including kv-padded cross attention."""
    key = jax.random.PRNGKey(40)
    for heads, dh, sq, skv in [(3, 40, 256, 256), (2, 80, 256, 128),
                               (2, 16, 512, 256)]:
        c = heads * dh
        kq, kk, kv = jax.random.split(jax.random.fold_in(key, dh), 3)
        qt = jax.random.normal(kq, (2, c, sq))
        kt = jax.random.normal(kk, (2, c, skv))
        vt = jax.random.normal(kv, (2, c, skv))
        got = flash.flash_attention_nt(qt, kt, vt, heads, dh ** -0.5,
                                       128)
        want = flash._nt_xla_reference(qt, kt, vt, heads, dh ** -0.5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_flash_nt_kv_len_mask(interpret_kernels):
    """Lane-padded context rows are masked out via kv_len."""
    heads, dh, sq, skv_real = 2, 40, 256, 91
    c = heads * dh
    key = jax.random.PRNGKey(41)
    kq, kk, kv = jax.random.split(key, 3)
    qt = jax.random.normal(kq, (1, c, sq))
    kt_r = jax.random.normal(kk, (1, c, skv_real))
    vt_r = jax.random.normal(kv, (1, c, skv_real))
    pad = 128 - skv_real
    kt = jnp.pad(kt_r, ((0, 0), (0, 0), (0, pad)))
    vt = jnp.pad(vt_r, ((0, 0), (0, 0), (0, pad)))
    got = flash.flash_attention_nt(qt, kt, vt, heads, dh ** -0.5, 128,
                                   skv_real)
    want = flash._nt_xla_reference(qt, kt_r, vt_r, heads, dh ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_nt_grad_flows(interpret_kernels):
    heads, dh = 2, 16
    c = heads * dh
    qt = jax.random.normal(jax.random.PRNGKey(42), (1, c, 256))

    def loss(t):
        return jnp.sum(flash.flash_attention_nt(t, t, t, heads,
                                                dh ** -0.5, 128) ** 2)

    g = jax.grad(loss)(qt)
    g_ref = jax.grad(lambda t: jnp.sum(flash._nt_xla_reference(
        t, t, t, heads, dh ** -0.5) ** 2))(qt)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)


def test_dense_nt_tn_match_dense():
    """DenseNT emits the transposed Dense output; DenseTN consumes it —
    identical param trees to nn.Dense and exact round-trip math."""
    from flax import linen as nn

    from rcdms_tpu.core.layers import DenseNT, DenseTN

    x = jax.random.normal(jax.random.PRNGKey(43), (2, 5, 7, 20))
    dense = nn.Dense(24)
    params = dense.init(jax.random.PRNGKey(44), x)
    want = dense.apply(params, x)

    got_t = DenseNT(24).apply(params, x)      # (2, 5, 24, 7)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got_t, -1, -2)),
                               np.asarray(want), atol=1e-5)

    back = nn.Dense(16)
    bparams = back.init(jax.random.PRNGKey(45), want)
    want2 = back.apply(bparams, want)
    got2 = DenseTN(16).apply(bparams, jnp.swapaxes(want, -1, -2))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=1e-5)


def test_attention_module_nt_matches_xla(interpret_kernels):
    """Attention through the nt kernel path equals the XLA path with the
    SAME params (identical trees), self and cross."""
    x = jax.random.normal(jax.random.PRNGKey(46), (2, 256, 80))
    ctx = jax.random.normal(jax.random.PRNGKey(47), (2, 91, 24))
    for context in (None, ctx):
        set_default_attention_impl("xla")
        try:
            attn = Attention(2, 40)
            params = attn.init(jax.random.PRNGKey(48), x, context=context)
            want = attn.apply(params, x, context=context)
        finally:
            set_default_attention_impl("auto")
        set_default_attention_impl("pallas")
        try:
            got = attn.apply(params, x, context=context)
        finally:
            set_default_attention_impl("auto")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_frame_bfnc_matches_oracle(interpret_kernels):
    """(b, f, n, c)-native kernel vs the transpose-based XLA oracle,
    including the padded-token-rows path (n=97, the prior's token count)."""
    key = jax.random.PRNGKey(20)
    heads, c, f = 4, 48, 5
    c_pad = 128
    for n in (64, 97):
        q, k, v = (jax.random.normal(ks, (2, f, n, c_pad))
                   for ks in jax.random.split(jax.random.fold_in(key, n), 3))
        q, k, v = (t.at[..., c:].set(0) for t in (q, k, v))
        got = fa.frame_attention_bfnc(q, k, v, heads, c, None, 32)
        want = fa._bfnc_xla_reference(q, k, v, heads, (c // heads) ** -0.5,
                                      c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        assert np.all(np.asarray(got)[..., c:] == 0)


def test_frame_bfnc_grad_flows(interpret_kernels):
    heads, c, f, c_pad = 2, 16, 5, 128
    q = jax.random.normal(jax.random.PRNGKey(21), (1, f, 32, c_pad))
    q = q.at[..., c:].set(0)

    def loss(t):
        return jnp.sum(fa.frame_attention_bfnc(t, t, t, heads, c, None,
                                               32) ** 2)

    g = jax.grad(loss)(q)
    g_ref = jax.grad(lambda t: jnp.sum(fa._bfnc_xla_reference(
        t, t, t, heads, (c // heads) ** -0.5, c) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)


def test_temporal_module_pallas_matches_xla(interpret_kernels):
    """The whole TemporalModule through the frame_axis Pallas path equals
    the XLA path (same params — trees are identical)."""
    from rcdms_tpu.configs import TemporalConfig
    from rcdms_tpu.core.temporal import TemporalModule

    tm = TemporalModule(16, TemporalConfig(num_heads=2))
    x = jax.random.normal(jax.random.PRNGKey(22), (2, 5, 6, 16))
    set_default_attention_impl("xla")
    try:
        params = tm.init(jax.random.PRNGKey(23), x)
        want = tm.apply(params, x)
    finally:
        set_default_attention_impl("auto")
    set_default_attention_impl("pallas")
    try:
        got = tm.apply(params, x)
    finally:
        set_default_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_padded_dense_matches_dense():
    from flax import linen as nn

    x = jax.random.normal(jax.random.PRNGKey(4), (3, 7, 20))
    dense = nn.Dense(24)
    params = dense.init(jax.random.PRNGKey(5), x)
    want = dense.apply(params, x)

    tail = PaddedDense(24, out_pad=("tail", 24, 128))
    got = tail.apply(params, x)
    np.testing.assert_allclose(np.asarray(got[..., :24]), np.asarray(want),
                               atol=1e-6)
    assert np.all(np.asarray(got)[..., 24:] == 0)

    # in_pad consumes what out_pad produced, annihilating pad lanes
    back = PaddedDense(20, in_pad=("tail", 24, 128))
    bparams = back.init(jax.random.PRNGKey(6), jnp.zeros((1, 1, 128)))
    got_b = back.apply(bparams, got)
    ref_b = np.asarray(want) @ np.asarray(
        bparams["params"]["kernel"]) + np.asarray(bparams["params"]["bias"])
    np.testing.assert_allclose(np.asarray(got_b), ref_b, atol=1e-5)


def _attention_apply(impl, x, ctx=None, heads=2, head_dim=40):
    set_default_attention_impl(impl)
    try:
        attn = Attention(heads, head_dim)
        params = attn.init(jax.random.PRNGKey(7), x, context=ctx)
        return attn, params, attn.apply(params, x, context=ctx)
    finally:
        set_default_attention_impl("auto")


def test_attention_module_kernel_flash_matches_xla(interpret_kernels):
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 256, 80))
    _, params, want = _attention_apply("xla", x)
    attn, params2, got = _attention_apply("pallas", x)
    # identical param trees (DenseNT/DenseTN mirror nn.Dense's
    # {kernel, bias})
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)
    got_same = attn.apply(params, x)  # xla-init params through kernel path
    np.testing.assert_allclose(np.asarray(got_same), np.asarray(want),
                               atol=2e-5)


def test_attention_module_kernel_cross_short_kv_matches_xla(
        interpret_kernels):
    """Cross attention with a 91-token context (not a lane multiple): the
    kernel path row-pads the context and masks via kv_len — must equal the
    XLA path."""
    x = jax.random.normal(jax.random.PRNGKey(30), (2, 256, 80))
    ctx = jax.random.normal(jax.random.PRNGKey(31), (2, 91, 24))
    set_default_attention_impl("xla")
    try:
        attn = Attention(2, 40)
        params = attn.init(jax.random.PRNGKey(32), x, context=ctx)
        want = attn.apply(params, x, context=ctx)
    finally:
        set_default_attention_impl("auto")
    set_default_attention_impl("pallas")
    try:
        got = attn.apply(params, x, context=ctx)
    finally:
        set_default_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # grads flow through the kv_len backward (padded rows get zero grads)
    set_default_attention_impl("pallas")
    try:
        g = jax.grad(lambda p: jnp.sum(attn.apply(p, x, context=ctx) ** 2))(
            params)
    finally:
        set_default_attention_impl("auto")
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_attention_module_frame_kernel_matches_xla(interpret_kernels):
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 64, 5, 48))
    _, params, want = _attention_apply("xla", x, heads=4, head_dim=12)
    set_default_attention_impl("pallas")
    try:
        attn = Attention(4, 12)
        got = attn.apply(params, x)
    finally:
        set_default_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_attention_module_kernel_grads(interpret_kernels):
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 256, 80))
    set_default_attention_impl("xla")
    try:
        attn = Attention(2, 40)
        params = attn.init(jax.random.PRNGKey(11), x)
        g_ref = jax.grad(lambda p: jnp.sum(attn.apply(p, x) ** 2))(params)
    finally:
        set_default_attention_impl("auto")
    set_default_attention_impl("pallas")
    try:
        g_got = jax.grad(lambda p: jnp.sum(attn.apply(p, x) ** 2))(params)
    finally:
        set_default_attention_impl("auto")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=2e-4),
        g_ref, g_got)
