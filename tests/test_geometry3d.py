"""Tests for the 3D extraction pipeline on analytic fields (no training)."""

import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.evaluation.geometry3d import (
    colored_meshes,
    eval_field_grid,
    extract_mesh,
    geometric_error,
    rgbd_to_pointcloud,
)


def sphere_field(pts, t):
    """Analytic pulsating sphere SDF: radius 0.4 + 0.1 t."""
    r = 0.4 + 0.1 * t[..., 0]
    return (jnp.linalg.norm(pts, axis=-1) - r)[..., None]


class TestGridEval:
    def test_matches_direct_eval(self):
        bmin, bmax = np.full(3, -1.0), np.full(3, 1.0)
        grid = eval_field_grid(sphere_field, 0.0, bmin, bmax, 48, block=32)
        assert grid.shape == (48, 48, 48)
        lin = np.linspace(-1, 1, 48)
        xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
        expected = np.sqrt(xx**2 + yy**2 + zz**2) - 0.4
        np.testing.assert_allclose(grid, expected, atol=1e-5)

    def test_non_divisible_block(self):
        bmin, bmax = np.full(3, -1.0), np.full(3, 1.0)
        g1 = eval_field_grid(sphere_field, 0.0, bmin, bmax, 40, block=32)
        g2 = eval_field_grid(sphere_field, 0.0, bmin, bmax, 40, block=40)
        np.testing.assert_allclose(g1, g2, atol=1e-6)


class TestExtractMesh:
    def test_sphere_radius_and_time(self):
        bmin, bmax = np.full(3, -0.9), np.full(3, 0.9)
        for t, r_expect in ((0.0, 0.4), (1.0, 0.5)):
            verts, tris = extract_mesh(sphere_field, t, bmin, bmax, 48)
            assert len(verts) > 200
            radii = np.linalg.norm(verts, axis=-1)
            np.testing.assert_allclose(radii.mean(), r_expect, atol=0.02)

    def test_geometric_error_zero_on_surface(self):
        bmin, bmax = np.full(3, -0.9), np.full(3, 0.9)
        verts, tris = extract_mesh(sphere_field, 0.0, bmin, bmax, 48)
        # GT points exactly on the analytic sphere.
        rng = np.random.default_rng(0)
        p = rng.normal(size=(500, 3))
        p = 0.4 * p / np.linalg.norm(p, axis=-1, keepdims=True)
        err_mm = geometric_error(p.astype(np.float32), verts,
                                 depth_scale=100.0)
        assert err_mm < 2.0  # < 0.02 scene units at this resolution

    def test_empty_when_no_surface(self):
        far_field = lambda pts, t: (jnp.linalg.norm(pts, axis=-1) + 1.0)[..., None]
        verts, tris = extract_mesh(far_field, 0.0, np.full(3, -0.5),
                                   np.full(3, 0.5), 16)
        assert len(verts) == 0


class TestColoredMeshes:
    def test_chunk_boundaries(self):
        bmin, bmax = np.full(3, -0.9), np.full(3, 0.9)
        verts, tris = extract_mesh(sphere_field, 0.0, bmin, bmax, 40)

        def render_pts(pts, dirs, t):
            # Color = normalized position (deterministic, checkable).
            return np.clip(np.asarray(pts) * 0.5 + 0.5, 0, 1)

        out = colored_meshes(render_pts, verts, tris,
                             np.array([0.0, 0.0, -2.0]), 0.0, chunk=256)
        assert out["color"].shape == (len(verts), 3)
        np.testing.assert_allclose(out["color"],
                                   np.clip(verts * 0.5 + 0.5, 0, 1),
                                   atol=1e-6)
        # Sphere normals radially aligned.
        radial = verts / np.linalg.norm(verts, axis=-1, keepdims=True)
        cos = np.abs((out["normals"] * radial).sum(-1))
        assert np.median(cos) > 0.95


class TestRGBDPointcloud:
    def test_unproject_roundtrip(self):
        h, w = 12, 16
        K = np.array([[20.0, 0, 8], [0, 20.0, 6], [0, 0, 1]])
        c2w = np.eye(4)
        c2w[:3, 3] = [0.5, -0.5, 1.0]
        depth = np.full((h, w, 1), 2.0, np.float32)
        rgb = np.zeros((h, w, 3), np.float32)
        pts, cols = rgbd_to_pointcloud(rgb, depth, K, c2w, depth_trunc=5.0)
        assert len(pts) == h * w
        # All points at camera-z 2 -> world z = 1 + 2 = 3.
        np.testing.assert_allclose(pts[:, 2], 3.0, atol=1e-5)
        # Center pixel (8, 6) maps to the camera axis.
        idx = 6 * w + 8
        np.testing.assert_allclose(pts[idx, :2], [0.5, -0.5], atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
