"""Stage-1 frame-prior model tests: shapes, masking semantics, temporal
coupling, normalization round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.configs import PriorConfig
from rcdms_tpu.models.prior import FramePrior
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def _make_inputs(key, cfg: PriorConfig, b=2):
    f, d, t = cfg.num_frames, cfg.embedding_dim, cfg.num_text_tokens
    ks = jax.random.split(key, 6)
    return dict(
        x_t=jax.random.normal(ks[0], (b, f, d)),
        timesteps=jnp.full((b, f), 10, jnp.int32),
        text_embed=jax.random.normal(ks[1], (b, f, d)),
        text_hidden=jax.random.normal(ks[2], (b, f, t, d)),
        image_embed=jax.random.normal(ks[3], (b, f, d)),
        mask_embed=jax.random.normal(ks[4], (b, f, d)),
        text_mask=jnp.ones((b, f, t), bool),
    )


def test_prior_forward_shape_and_determinism():
    cfg = PriorConfig.tiny()
    key = jax.random.PRNGKey(0)
    inputs = _make_inputs(key, cfg)
    model = FramePrior(cfg)
    params = model.init(key, **inputs)
    apply = jax.jit(lambda p, i: model.apply(p, **i))
    out1 = apply(params, inputs)
    out2 = apply(params, inputs)
    assert out1.shape == (2, cfg.num_frames, cfg.embedding_dim)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_prior_text_padding_mask_blocks_padded_tokens():
    cfg = PriorConfig.tiny()
    key = jax.random.PRNGKey(1)
    inputs = _make_inputs(key, cfg, b=1)
    model = FramePrior(cfg)
    params = model.init(key, **inputs)

    mask = jnp.ones((1, cfg.num_frames, cfg.num_text_tokens), bool)
    mask = mask.at[:, :, 4:].set(False)  # tokens 4+ are padding
    i1 = dict(inputs, text_mask=mask)
    out1 = model.apply(params, **i1)
    # changing padded text token content must not change the output
    th = inputs["text_hidden"].at[:, :, 5].add(7.0)
    i2 = dict(inputs, text_hidden=th, text_mask=mask)
    out2 = model.apply(params, **i2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_prior_temporal_coupling_across_frames():
    """With temporal modules, frame 0's input affects frame 4's prediction
    (the whole point of stage 1: joint denoising across the story).
    zero_init_output must be off: at init the temporal modules are exact
    identities, so cross-frame flow is zero by design."""
    from rcdms_tpu.configs import TemporalConfig

    cfg = PriorConfig.tiny(temporal=TemporalConfig(
        num_heads=2, num_blocks=1, zero_init_output=False))
    key = jax.random.PRNGKey(2)
    inputs = _make_inputs(key, cfg, b=1)
    model = FramePrior(cfg)
    params = model.init(key, **inputs)
    out = model.apply(params, **inputs)
    i2 = dict(inputs, x_t=inputs["x_t"].at[:, 0].add(1.0))
    out2 = model.apply(params, **i2)
    assert np.abs(np.asarray(out2[:, 4] - out[:, 4])).max() > 1e-8


def test_prior_no_temporal_frames_independent():
    cfg = PriorConfig.tiny(use_temporal=False)
    key = jax.random.PRNGKey(3)
    inputs = _make_inputs(key, cfg, b=1)
    model = FramePrior(cfg)
    params = model.init(key, **inputs)
    out = model.apply(params, **inputs)
    i2 = dict(inputs, x_t=inputs["x_t"].at[:, 0].add(1.0))
    out2 = model.apply(params, **i2)
    np.testing.assert_allclose(np.asarray(out2[:, 1:]),
                               np.asarray(out[:, 1:]), atol=1e-5)


def test_normalize_denormalize_roundtrip():
    cfg = PriorConfig.tiny()
    model = FramePrior(cfg)
    x = jnp.linspace(-2, 2, 16).reshape(1, 1, 16)
    y = model.denormalize(model.normalize(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5)
