"""VAE and CLIP structural tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from rcdms_tpu.configs import CLIPTextConfig, CLIPVisionConfig, VAEConfig
from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.vae import VAE
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def test_vae_encode_decode_shapes():
    cfg = VAEConfig.tiny()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 32, 32, 3))
    noise = jax.random.normal(key, (2, 16, 16, cfg.latent_channels))
    model = VAE(cfg)
    params = model.init(key, x, noise)

    mean, logvar = model.apply(params, x, method=VAE.encode)
    # one downsample (2 levels) -> 32/2 = 16 spatial, 4 latent channels
    assert mean.shape == (2, 16, 16, cfg.latent_channels)
    assert logvar.shape == mean.shape
    assert np.all(np.asarray(logvar) <= 20.0)

    z = VAE.sample_latent(mean, logvar, noise)
    rec = model.apply(params, z, method=VAE.decode)
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()


def test_vae_sample_latent_reparam():
    mean = jnp.full((1, 2, 2, 4), 3.0)
    logvar = jnp.zeros((1, 2, 2, 4))
    noise = jnp.full((1, 2, 2, 4), 0.5)
    z = VAE.sample_latent(mean, logvar, noise)
    np.testing.assert_allclose(np.asarray(z), 3.5)


def test_clip_text_eos_pooling_and_causality():
    cfg = CLIPTextConfig.tiny()
    key = jax.random.PRNGKey(1)
    ids = jnp.array([[1, 2, 3, cfg.eos_token_id, 0, 0, 0]], jnp.int32)
    model = CLIPTextEncoder(cfg)
    params = model.init(key, ids)
    hidden, emb = model.apply(params, ids)
    assert hidden.shape == (1, 7, cfg.width)
    assert emb.shape == (1, cfg.projection_dim)
    # causality: changing a token AFTER the EOS must not change text_embeds
    ids2 = ids.at[0, 5].set(7)
    _, emb2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2), atol=1e-6)
    # changing a token BEFORE the EOS must change it
    ids3 = ids.at[0, 1].set(9)
    _, emb3 = model.apply(params, ids3)
    assert np.abs(np.asarray(emb) - np.asarray(emb3)).max() > 1e-8


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig.tiny()
    key = jax.random.PRNGKey(2)
    px = jax.random.normal(key, (2, cfg.image_size, cfg.image_size, 3))
    model = CLIPVisionEncoder(cfg)
    params = model.init(key, px)
    hidden, emb = model.apply(params, px)
    n_tokens = 1 + (cfg.image_size // cfg.patch_size) ** 2
    assert hidden.shape == (2, n_tokens, cfg.width)
    assert emb.shape == (2, cfg.projection_dim)
