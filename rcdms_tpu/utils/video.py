"""Story/video export helpers + DDIM inversion — the live equivalents of the
reference's `src/utils/util.py` (`save_videos_grid` :21-33, `ddim_inversion`
:36-92; dead code there, first-class here)."""

from __future__ import annotations

import os
from typing import Callable, List

import numpy as np


def save_videos_grid(videos: np.ndarray, path: str, n_rows: int = 4,
                     fps: int = 2) -> None:
    """videos: (b, f, h, w, 3) floats in [0,1]. Saves an animated GIF whose
    frames are b-image grids (reference util.py:21-33 semantics, NHWC)."""
    from PIL import Image

    b, f, h, w, _ = videos.shape
    cols = min(n_rows, b)
    rows = (b + cols - 1) // cols
    frames: List[Image.Image] = []
    for t in range(f):
        grid = np.zeros((rows * h, cols * w, 3), np.float32)
        for i in range(b):
            r, c = divmod(i, cols)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = videos[i, t]
        frames.append(Image.fromarray(
            (np.clip(grid, 0, 1) * 255).astype(np.uint8)))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def ddim_inversion(denoise_fn: Callable, schedule, latents,
                   num_steps: int = 50):
    """Deterministic DDIM inversion x_0 -> x_T (reference util.py:36-92):
    runs the DDIM update with the timestep chain reversed.

    denoise_fn(latents, t) -> epsilon prediction.
    Returns the inverted latents (same shape)."""
    import jax
    import jax.numpy as jnp

    ts = schedule.timesteps(num_steps)            # descending
    fwd_ts = jnp.asarray(ts[::-1].copy())         # ascending: 0 -> T
    # "previous" step in inversion is the NEXT (larger) timestep
    prev = jnp.asarray(
        np.concatenate([ts[::-1][1:], [schedule.num_train_timesteps - 1]])
        .astype(np.int32))

    def body(lat, tp):
        t, nxt = tp
        eps = denoise_fn(lat, t)
        # invert: x_{t+1} = sqrt(acp_next) x0(t) + sqrt(1-acp_next) eps
        acp = jnp.asarray(schedule.alphas_cumprod, jnp.float32)
        a_t = acp[t]
        a_n = acp[nxt]
        x0 = (lat - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_n) * x0 + jnp.sqrt(1 - a_n) * eps, None

    out, _ = jax.lax.scan(body, latents, (fwd_ts, prev))
    return out
