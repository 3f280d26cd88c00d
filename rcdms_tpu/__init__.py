"""RCDMs-TPU: a TPU-native (JAX/XLA/Pallas) framework for rich-contextual
conditional diffusion story visualization.

Re-designed from scratch for TPU with the capabilities of the PyTorch
reference `muzishen/RCDMs` (two-stage story visualization: a frame-prior
transformer diffusion over CLIP image embeddings, and a rich-contextual
3D UNet latent diffusion over 5-frame stories).

Canonical layouts (TPU-native, unlike the reference's `b c f h w`):
  * images / latents: ``(batch, frames, height, width, channels)`` (NHWC)
  * token streams:    ``(batch, frames, tokens, dim)``
  * CLIP embeddings:  ``(batch, frames, dim)``
"""

__version__ = "0.1.0"

from rcdms_tpu.configs import (  # noqa: F401
    PriorConfig,
    StoryUNetConfig,
    VAEConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
    FusionConfig,
    DatasetConfig,
    Stage1TrainConfig,
    Stage2TrainConfig,
)
