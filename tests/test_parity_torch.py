"""Numerical parity tests against torch/HF-transformers (both baked into the
image) with tiny random-initialized models — this pins the weight-converter
conventions and encoder fidelity (SURVEY.md §7 step 3: 'parity-test encoder
outputs against torch within tolerance — this pins most downstream
fidelity')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from rcdms_tpu.configs import CLIPTextConfig, CLIPVisionConfig, FusionConfig
from rcdms_tpu.core.layers import GroupNorm
from rcdms_tpu.io.convert import (
    convert_clip_text,
    convert_clip_vision,
    convert_fusion_stack,
    to_numpy_state_dict,
)
from rcdms_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from rcdms_tpu.models.fusion import CrossFeatureStack


def test_groupnorm_matches_torch():
    torch.manual_seed(0)
    x = torch.randn(3, 8, 5, 6)  # NCHW
    gn = torch.nn.GroupNorm(num_groups=2, num_channels=8, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(8))
        gn.bias.copy_(torch.randn(8))
        ref = gn(x).numpy()

    ours = GroupNorm(num_groups=2, eps=1e-6)
    params = {"params": {"scale": jnp.asarray(gn.weight.detach().numpy()),
                         "bias": jnp.asarray(gn.bias.detach().numpy())}}
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = np.asarray(ours.apply(params, x_nhwc)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_clip_text_parity_with_hf():
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=11, projection_dim=16,
        eos_token_id=98, bos_token_id=97, hidden_act="quick_gelu")
    torch.manual_seed(1)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    ids = torch.randint(0, 90, (2, 11))
    ids[0, 6] = 98  # EOS mid-sequence
    ids[1, 10] = 98
    with torch.no_grad():
        ref = hf(ids)

    cfg = CLIPTextConfig(vocab_size=99, width=32, num_layers=2, num_heads=4,
                         max_positions=11, projection_dim=16,
                         eos_token_id=98, hidden_act="quick_gelu")
    params = convert_clip_text(to_numpy_state_dict(hf.state_dict()), cfg,
                               resize=False)
    model = CLIPTextEncoder(cfg)
    hidden, embeds = model.apply({"params": params},
                                 jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(hidden),
                               ref.last_hidden_state.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(embeds),
                               ref.text_embeds.numpy(), atol=2e-4)


def test_clip_text_vocab_and_position_resize():
    """Vocab 99->104 + positions 11->13 (the reference's character-token +
    91-position surgery). Old rows must be preserved exactly; outputs for
    old tokens at old positions must match the unresized model."""
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=11, projection_dim=16,
        eos_token_id=98, bos_token_id=97, hidden_act="quick_gelu")
    torch.manual_seed(2)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()
    sd = to_numpy_state_dict(hf.state_dict())

    cfg = CLIPTextConfig(vocab_size=104, width=32, num_layers=2, num_heads=4,
                         max_positions=13, projection_dim=16,
                         eos_token_id=98, hidden_act="quick_gelu")
    params = convert_clip_text(sd, cfg, resize=True)
    assert params["token_embedding"]["embedding"].shape == (104, 32)
    assert params["position_embedding"].shape == (13, 32)
    np.testing.assert_array_equal(
        params["token_embedding"]["embedding"][:99],
        sd["text_model.embeddings.token_embedding.weight"])
    np.testing.assert_array_equal(
        params["position_embedding"][:11],
        sd["text_model.embeddings.position_embedding.weight"])
    # new token ids run without error
    model = CLIPTextEncoder(cfg)
    ids = jnp.array([[97, 100, 103, 98] + [0] * 9], jnp.int32)
    hidden, emb = model.apply({"params": params}, ids)
    assert hidden.shape == (1, 13, 32)
    assert np.isfinite(np.asarray(emb)).all()


def test_clip_vision_parity_with_hf():
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection

    hf_cfg = HFVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=16, hidden_act="gelu")
    torch.manual_seed(3)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()

    px = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        ref = hf(px, output_hidden_states=True)

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32,
                           num_layers=2, num_heads=4, projection_dim=16,
                           hidden_act="gelu")
    params = convert_clip_vision(to_numpy_state_dict(hf.state_dict()), cfg)
    model = CLIPVisionEncoder(cfg)
    hidden, embeds = model.apply(
        {"params": params}, jnp.asarray(px.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(hidden),
                               ref.last_hidden_state.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(embeds),
                               ref.image_embeds.numpy(), atol=2e-4)


def test_fusion_stack_parity_with_torch_mha():
    """fine_stack/semantic_stack vs the exact torch module the reference
    defines (`train_stage2.py:157-172`)."""
    class TorchFineStack(torch.nn.Module):
        def __init__(self, text_dim, vis_dim, hidden_dim=24, num_heads=2):
            super().__init__()
            self.text_fc = torch.nn.Linear(text_dim, hidden_dim)
            self.vis_fc = torch.nn.Linear(vis_dim, hidden_dim)
            self.multihead_attn = torch.nn.MultiheadAttention(
                embed_dim=hidden_dim, num_heads=num_heads)

        def forward(self, vis_f, text_f):
            q = self.text_fc(text_f).transpose(0, 1)
            kv = self.vis_fc(vis_f).transpose(0, 1)
            out, _ = self.multihead_attn(q, kv, kv)
            return out.transpose(0, 1)

    torch.manual_seed(4)
    ref_mod = TorchFineStack(text_dim=20, vis_dim=16).eval()
    vis = torch.randn(3, 9, 16)
    text = torch.randn(3, 7, 20)
    with torch.no_grad():
        ref = ref_mod(vis, text).numpy()

    cfg = FusionConfig(text_dim=20, seen_vis_dim=16, unseen_vis_dim=16,
                       hidden_dim=24, num_heads=2)
    params = convert_fusion_stack(to_numpy_state_dict(ref_mod.state_dict()))
    ours = CrossFeatureStack(cfg)
    out = ours.apply({"params": params}, jnp.asarray(vis.numpy()),
                     jnp.asarray(text.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
