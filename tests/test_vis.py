"""Tests for visualization utilities."""

import numpy as np
import pytest

from endosurf_tpu.evaluation.vis import (
    depth_to_show,
    filter_depth,
    hstack_labeled,
    normal_from_depth,
    normal_to_show,
    rgb_to_show,
    to8b,
)


def test_to8b():
    x = np.array([-0.5, 0.0, 0.5, 1.0, 2.0])
    np.testing.assert_array_equal(to8b(x), [0, 0, 127, 255, 255])


def test_depth_to_show_range():
    d = np.linspace(0, 2, 12).reshape(1, 3, 4, 1)
    show = depth_to_show(d, depth_max=2.0)
    assert show.shape == (1, 3, 4, 3)
    assert show.dtype == np.uint8
    # Near pixels bright, far pixels dark (inverted map).
    assert show[0, 0, 0, 0] == 255 and show[0, -1, -1, 0] == 0


def test_normal_from_depth_flat_wall():
    """Rays from the origin hitting the plane z=1: normals must be +-z."""
    h, w = 8, 10
    ys, xs = np.meshgrid(np.linspace(-0.2, 0.2, h),
                         np.linspace(-0.2, 0.2, w), indexing="ij")
    d = np.stack([xs, ys, np.ones_like(xs)], -1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros_like(d)
    rays = np.concatenate([o, d, np.zeros((h, w, 3))], -1)[None]
    depth = (1.0 / d[..., 2:3])[None]  # unit-dir scaling to reach z=1
    n = normal_from_depth(rays, depth)
    inner = np.abs(n[0, 1:-1, 1:-1, 2])
    np.testing.assert_allclose(inner, 1.0, atol=1e-5)
    # Border padded with zeros.
    assert np.all(n[0, 0] == 0) and np.all(n[0, -1] == 0)


def test_filter_depth_smooths():
    rng = np.random.default_rng(0)
    d = (np.ones((2, 32, 32, 1)) + rng.normal(0, 0.2, (2, 32, 32, 1))
         ).astype(np.float32)
    out = filter_depth(d, [9, 75.0, 75.0])
    assert out.shape == d.shape
    assert out[0].std() < d[0].std()


def test_normal_to_show_camera_rotation():
    # World normal +z viewed by identity camera -> cam normal +z -> blue 255.
    n = np.zeros((1, 4, 4, 3), np.float32)
    n[..., 2] = 1.0
    poses = np.eye(4)[None]
    show = normal_to_show(n, poses)
    assert show.dtype == np.uint8
    np.testing.assert_array_equal(show[0, 0, 0], [128, 128, 255])


def test_hstack_labeled_resizes():
    imgs = [np.zeros((64, 4000, 3), np.uint8), np.zeros((64, 4000, 3),
                                                        np.uint8)]
    row = hstack_labeled(imgs, ["a", "b"], max_width=1000)
    assert row.shape[1] == 1000


def test_rgb_to_show_clips():
    x = np.array([[[[-0.1, 0.5, 1.2]]]])
    out = rgb_to_show(x)
    assert out.min() >= 0 and out.max() <= 255


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
