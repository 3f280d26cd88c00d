"""Evaluation harness — the reference's `stage1_batchtest_rcdms_model.py` /
`stage2_batchtest_rcdms_model.py` equivalents.

Quantitative signals kept from the reference:
  * stage 1: per-frame cosine similarity of predicted vs ground-truth CLIP
    embeddings (`stage1_batchtest:239-261`),
  * stage 2: per-frame PNGs + 2xF comparison grids vs ground truth
    (`stage2_batchtest:358-401`) — plus the SSIM the reference imports but
    never calls.

The reference's one-process-per-GPU fan-out over disjoint index shards
becomes batched jitted eval (and shards trivially by (shard_id, num_shards)
for multi-host)."""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import numpy as np


def cosine_similarity(pred: np.ndarray, target: np.ndarray,
                      axis: int = -1) -> np.ndarray:
    p = pred / (np.linalg.norm(pred, axis=axis, keepdims=True) + 1e-8)
    t = target / (np.linalg.norm(target, axis=axis, keepdims=True) + 1e-8)
    return (p * t).sum(axis=axis)


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Global-window SSIM per image pair (a, b: (h, w, c) floats). Matches
    the standard constants; adequate for the >=0.99 parity gate."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a, mu_b = a.mean(), b.mean()
    va, vb = a.var(), b.var()
    cov = ((a - mu_a) * (b - mu_b)).mean()
    return float(((2 * mu_a * mu_b + c1) * (2 * cov + c2))
                 / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))


@dataclass
class Stage1EvalAccumulator:
    """Running per-frame cosine-sim accumulator (the reference's `sum_simm`
    print loop)."""

    total: float = 0.0
    count: int = 0

    def update(self, pred_embeds: np.ndarray, gt_embeds: np.ndarray) -> float:
        sims = cosine_similarity(pred_embeds, gt_embeds)
        self.total += float(sims.sum())
        self.count += sims.size
        return float(sims.mean())

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def save_story_grid(path: str, generated: np.ndarray,
                    ground_truth: Optional[np.ndarray] = None) -> None:
    """generated/gt: (f, h, w, 3) in [0,1]. Writes per-frame PNGs and a
    2xF grid (or 1xF if no GT)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    f, h, w, _ = generated.shape

    def to8(x):
        return (np.clip(x, 0, 1) * 255).astype(np.uint8)

    rows = [np.concatenate([to8(generated[i]) for i in range(f)], axis=1)]
    if ground_truth is not None:
        rows.append(np.concatenate([to8(ground_truth[i]) for i in range(f)],
                                   axis=1))
    Image.fromarray(np.concatenate(rows, axis=0)).save(path)

    stem, ext = os.path.splitext(path)
    for i in range(f):
        Image.fromarray(to8(generated[i])).save(f"{stem}_frame{i}{ext}")


def story_metrics(generated: np.ndarray, ground_truth: np.ndarray
                  ) -> Dict[str, float]:
    """Per-story metrics: mean per-frame SSIM and PSNR vs ground truth."""
    f = generated.shape[0]
    ssims, psnrs = [], []
    for i in range(f):
        ssims.append(ssim(generated[i], ground_truth[i]))
        mse = float(np.mean((generated[i] - ground_truth[i]) ** 2))
        psnrs.append(10 * np.log10(1.0 / max(mse, 1e-10)))
    return {"ssim": float(np.mean(ssims)), "psnr": float(np.mean(psnrs))}


def split_indices(n: int, shard_id: int, num_shards: int) -> Sequence[int]:
    """Static index split (the reference's `split_list`,
    `stage1_batchtest:56-68`)."""
    return list(range(n))[shard_id::num_shards]
