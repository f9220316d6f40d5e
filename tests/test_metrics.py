"""Metric tests: masked PSNR/RMSE/SSIM vs closed forms and torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from endosurf_tpu.evaluation.metrics import cal_psnr, cal_rmse, cal_ssim


def test_psnr_known_value():
    a = np.zeros((1, 8, 8, 3), np.float32)
    b = np.full_like(a, 0.1)
    mask = np.ones((1, 8, 8, 1), np.float32)
    # mse = 0.01 -> psnr = 20*log10(1/0.1) = 20.
    np.testing.assert_allclose(cal_psnr(a, b, mask), 20.0, atol=1e-4)


def test_psnr_mask_excludes_bad_region():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    b = a.copy()
    b[0, :4] = 0.0  # corrupt the top half
    mask = np.ones((1, 8, 8, 1), np.float32)
    mask[0, :4] = 0.0  # ...but mask it out
    assert cal_psnr(a, b, mask) > 60.0


def test_rmse_known_value():
    a = np.zeros((1, 4, 4, 1), np.float32)
    b = np.full_like(a, 2.0)
    mask = np.ones_like(a)
    np.testing.assert_allclose(cal_rmse(a, b, mask), 2.0, atol=1e-6)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    mask = np.ones((2, 32, 32, 1), np.float32)
    assert cal_ssim(a, a, mask) > 0.999


def test_ssim_matches_torch_reference_impl():
    """Compare against a torch implementation of the reference's windowed
    SSIM (trainer/utils.py:373-457 semantics: 11x11 gaussian sigma 1.5,
    valid padding, L=1, mask-multiplied inputs)."""
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    mask = (rng.uniform(0, 1, (1, 24, 24, 1)) > 0.3).astype(np.float32)

    ours = cal_ssim(a, b, mask)

    # torch oracle
    def gaussian(w, sigma):
        g = torch.exp(-(torch.arange(w, dtype=torch.float32) - w // 2) ** 2
                      / (2 * sigma ** 2))
        return g / g.sum()

    g1 = gaussian(11, 1.5).unsqueeze(1)
    win = (g1 @ g1.t()).expand(3, 1, 11, 11).contiguous()
    at = torch.from_numpy((a * mask).transpose(0, 3, 1, 2).copy())
    bt = torch.from_numpy((b * mask).transpose(0, 3, 1, 2).copy())
    mu1 = F.conv2d(at, win, groups=3)
    mu2 = F.conv2d(bt, win, groups=3)
    s1 = F.conv2d(at * at, win, groups=3) - mu1 ** 2
    s2 = F.conv2d(bt * bt, win, groups=3) - mu2 ** 2
    s12 = F.conv2d(at * bt, win, groups=3) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    v1 = 2 * s12 + C2
    v2 = s1 + s2 + C2
    ssim_map = ((2 * mu1 * mu2 + C1) * v1) / ((mu1 ** 2 + mu2 ** 2 + C1) * v2)
    theirs = float(ssim_map.mean())

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = np.ones((1, 32, 32, 1), np.float32)
    small = cal_ssim(a, np.clip(a + rng.normal(0, 0.02, a.shape), 0, 1)
                     .astype(np.float32), mask)
    big = cal_ssim(a, np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
                   .astype(np.float32), mask)
    assert small > big


def test_lpips_gated_without_weights():
    from endosurf_tpu.evaluation.metrics import cal_lpips
    a = np.zeros((1, 16, 16, 3), np.float32)
    assert cal_lpips(a, a, np.ones((1, 16, 16, 1), np.float32)) is None


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
