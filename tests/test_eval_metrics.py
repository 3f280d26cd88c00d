"""Golden tests for the windowed SSIM (skimage-compatible) in
sample/eval.py — the >=0.99 parity-gate metric. The oracle is an
independent brute-force implementation (explicit per-pixel window loops,
symmetric padding), plus skimage itself when available."""

import numpy as np
import pytest

from rcdms_tpu.sample.eval import ssim, story_metrics


def _brute_force_ssim(a, b, data_range=1.0, win=7):
    """Naive reference: slide an explicit win x win window over a
    symmetric-padded image, sample-covariance statistics, crop to the
    valid region — skimage.metrics.structural_similarity semantics."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    pad = win // 2
    ap = np.pad(a, pad, mode="symmetric")
    bp = np.pad(b, pad, mode="symmetric")
    h, w = a.shape
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    n = win * win
    cov_norm = n / (n - 1)
    s = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            wa = ap[i:i + win, j:j + win]
            wb = bp[i:i + win, j:j + win]
            ux, uy = wa.mean(), wb.mean()
            vx = cov_norm * (np.mean(wa * wa) - ux * ux)
            vy = cov_norm * (np.mean(wb * wb) - uy * uy)
            vxy = cov_norm * (np.mean(wa * wb) - ux * uy)
            s[i, j] = (((2 * ux * uy + c1) * (2 * vxy + c2))
                       / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    return float(s[pad:h - pad, pad:w - pad].mean())


def test_windowed_ssim_matches_brute_force():
    rng = np.random.RandomState(0)
    a = rng.rand(24, 20)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)
    got = ssim(a, b)
    want = _brute_force_ssim(a, b)
    assert abs(got - want) < 1e-10
    # and at a non-trivial data_range
    got = ssim(a * 4 - 2, b * 4 - 2, data_range=4.0)
    want = _brute_force_ssim(a * 4 - 2, b * 4 - 2, data_range=4.0)
    assert abs(got - want) < 1e-10


def test_windowed_ssim_matches_skimage_if_available():
    sk = pytest.importorskip("skimage.metrics")
    rng = np.random.RandomState(1)
    a = rng.rand(32, 32)
    b = np.clip(a + rng.normal(scale=0.2, size=a.shape), 0, 1)
    want = sk.structural_similarity(a, b, data_range=1.0)
    assert abs(ssim(a, b) - want) < 1e-10


def test_ssim_identity_and_bounds():
    rng = np.random.RandomState(2)
    a = rng.rand(16, 16, 3)
    assert ssim(a, a) == pytest.approx(1.0)
    b = rng.rand(16, 16, 3)
    assert ssim(a, b) < 0.5


def test_ssim_catches_structural_mismatch_with_matched_global_stats():
    """The round-1 global-window SSIM scored ~1.0 for structurally different
    images with matched global mean/var (VERDICT 'what's weak' #1); the
    windowed metric must not."""
    rng = np.random.RandomState(3)
    a = rng.rand(32, 32)
    b = np.sort(a.ravel())[np.argsort(np.argsort(rng.rand(a.size)))]
    b = b.reshape(a.shape)  # exact same histogram (mean/var), shuffled
    assert abs(a.mean() - b.mean()) < 1e-12
    assert abs(a.var() - b.var()) < 1e-12
    assert ssim(a, b) < 0.5


def test_ssim_multichannel_is_channel_mean():
    rng = np.random.RandomState(4)
    a = rng.rand(20, 20, 3)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)
    per_channel = [ssim(a[..., i], b[..., i]) for i in range(3)]
    assert ssim(a, b) == pytest.approx(np.mean(per_channel))


def test_ssim_small_image_clamps_window():
    rng = np.random.RandomState(5)
    a = rng.rand(5, 5)
    got = ssim(a, a)  # win clamps 7 -> 5
    assert got == pytest.approx(1.0)
    b = rng.rand(5, 5)
    assert abs(ssim(a, b) - _brute_force_ssim(a, b, win=5)) < 1e-10


def test_story_metrics_uses_windowed_ssim():
    rng = np.random.RandomState(6)
    gen = rng.rand(2, 16, 16, 3).astype(np.float32)
    m = story_metrics(gen, gen.copy())
    assert m["ssim"] == pytest.approx(1.0)
    assert m["psnr"] > 60
