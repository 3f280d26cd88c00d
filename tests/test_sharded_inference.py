"""Sharded single-story inference: the full two-stage pipeline jitted over
an 8-device ('cfg','space') inference mesh must produce the same story as
the unsharded program (GSPMD inserts the conv halo exchanges / attention
gathers; the math may not change). This is the latency path for the
<=2 s p50 v5e-8 target — the reference has no equivalent (its eval fan-out
is throughput-only, `stage2_batchtest_rcdms_model.py:457-468`)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcdms_tpu.train.sharding import inference_mesh

from tests.test_pipeline import _build

pytestmark = pytest.mark.slow  # compile-heavy; excluded from -m 'not slow'


def _with_mesh(pipeline, mesh):
    return dataclasses.replace(
        pipeline, mesh=mesh,
        prior_sampler=dataclasses.replace(pipeline.prior_sampler, mesh=mesh),
        story_sampler=dataclasses.replace(pipeline.story_sampler, mesh=mesh))


def test_inference_mesh_shape():
    mesh = inference_mesh(jax.devices())
    assert mesh.shape["cfg"] == 2
    assert mesh.shape["space"] == 4
    single = inference_mesh(jax.devices()[:1])
    assert single.shape["cfg"] == 1 and single.shape["space"] == 1


def test_sharded_generate_matches_unsharded():
    key = jax.random.PRNGKey(0)
    pipeline, params, inputs = _build(key)
    gen_key = jax.random.PRNGKey(1)

    frames_ref, embeds_ref = jax.jit(pipeline.generate)(params, inputs,
                                                        gen_key)

    mesh = inference_mesh(jax.devices())
    sharded = _with_mesh(pipeline, mesh)
    frames_sh, embeds_sh = jax.jit(sharded.generate)(params, inputs, gen_key)

    # the sharded program must actually have run on all 8 devices
    assert len(frames_sh.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(embeds_sh), np.asarray(embeds_ref),
                               atol=5e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(frames_sh), np.asarray(frames_ref),
                               atol=5e-5, rtol=1e-5)


def test_sharded_generate_batch2_matches_unsharded():
    """--shard-story combined with --eval-batch N: a batch of stories
    through the sharded mesh must equal the unsharded batch output."""
    import jax.numpy as jnp

    from rcdms_tpu.sample.pipeline import build_tiny_pipeline
    from rcdms_tpu.sample.pipeline import StoryInputs

    pipeline, params, inputs1 = build_tiny_pipeline(jax.random.PRNGKey(7))
    # stack the example story twice with different tokens
    inputs = StoryInputs(*[
        jnp.concatenate([v, v + (1 if v.dtype == jnp.int32 else 0.1)
                         if v.dtype != jnp.bool_ else v])
        for v in inputs1])
    key = jax.random.PRNGKey(8)
    frames_ref, embeds_ref = jax.jit(pipeline.generate)(params, inputs, key)
    sharded = _with_mesh(pipeline, inference_mesh(jax.devices()))
    frames_sh, embeds_sh = jax.jit(sharded.generate)(params, inputs, key)
    np.testing.assert_allclose(np.asarray(frames_sh),
                               np.asarray(frames_ref), atol=5e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(embeds_sh),
                               np.asarray(embeds_ref), atol=5e-5, rtol=1e-5)


def test_sharded_autoreg_matches_unsharded():
    key = jax.random.PRNGKey(2)
    pipeline, params, inputs = _build(key)
    cimg = inputs.source_clip.shape[2]
    white = jnp.ones((cimg, cimg, 3), jnp.float32)
    gen_key = jax.random.PRNGKey(3)

    ref = jax.jit(pipeline.generate_stage1_autoreg)(params, inputs, gen_key,
                                                    white)
    sharded = _with_mesh(pipeline, inference_mesh(jax.devices()))
    got = jax.jit(sharded.generate_stage1_autoreg)(params, inputs, gen_key,
                                                   white)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-5)
