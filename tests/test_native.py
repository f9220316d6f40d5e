"""Tests for the first-party C++ geometry kernels against analytic shapes."""

import numpy as np
import pytest

from endosurf_tpu.native import (
    clean_mesh,
    laplacian_smooth,
    marching_tetrahedra,
    point_cloud_distance,
    radius_outlier_mask,
    vertex_normals,
)


def sphere_grid(res=48, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - radius, lin


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        grid, lin = sphere_grid()
        verts, tris = marching_tetrahedra(grid, 0.0)
        assert len(verts) > 500 and len(tris) > 500
        assert tris.min() >= 0 and tris.max() < len(verts)
        # Rescale grid coords -> world and check radius everywhere ~0.6.
        world = verts / (len(lin) - 1) * 2.0 - 1.0
        r = np.linalg.norm(world, axis=-1)
        np.testing.assert_allclose(r, 0.6, atol=0.03)

    def test_empty_grid(self):
        grid = np.ones((8, 8, 8), np.float32)  # all outside
        verts, tris = marching_tetrahedra(grid, 0.0)
        assert len(verts) == 0 and len(tris) == 0

    def test_plane_area(self):
        # Half-space x < 0: isosurface is the x=mid plane; area ~ full slice.
        res = 17
        lin = np.linspace(-1, 1, res, dtype=np.float32)
        grid = np.broadcast_to(lin[:, None, None], (res, res, res)).copy()
        verts, tris = marching_tetrahedra(grid, 0.0)
        world = verts / (res - 1) * 2.0 - 1.0
        np.testing.assert_allclose(world[:, 0], 0.0, atol=1e-5)
        # Total area of the extracted plane ~ 2x2.
        a = world[tris[:, 0]]
        b = world[tris[:, 1]]
        c = world[tris[:, 2]]
        area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
        np.testing.assert_allclose(area, 4.0, rtol=1e-3)

    def test_watertight_sphere(self):
        """Every edge of the sphere mesh is shared by exactly 2 triangles."""
        grid, _ = sphere_grid(res=24)
        verts, tris = marching_tetrahedra(grid, 0.0)
        from collections import Counter
        edges = Counter()
        for t in tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2])):
                edges[tuple(sorted(e))] += 1
        counts = np.array(list(edges.values()))
        assert (counts == 2).all()


class TestCleanMesh:
    def test_removes_degenerate_and_duplicates(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                         np.float32)
        tris = np.array([
            [0, 1, 2], [0, 1, 2], [2, 1, 0],  # dup + permuted dup
            [0, 0, 1],                          # degenerate
            [1, 3, 2],
        ], np.int32)
        v, t = clean_mesh(verts, tris, keep_ratio=0.0)
        assert len(t) == 2

    def test_small_cluster_removed(self):
        # Big quad (2 tris) + far-away single triangle.
        verts = np.array([
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
            [10, 10, 10], [11, 10, 10], [10, 11, 10]], np.float32)
        tris = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]], np.int32)
        v, t = clean_mesh(verts, tris, keep_ratio=0.9)
        assert len(t) == 2
        assert len(v) == 4  # unused vertices compacted away
        assert t.max() < len(v)


class TestSmoothing:
    def test_laplacian_shrinks_noise(self):
        grid, lin = sphere_grid(res=24)
        verts, tris = marching_tetrahedra(grid, 0.0)
        rng = np.random.default_rng(0)
        noisy = verts + rng.normal(0, 0.1, verts.shape).astype(np.float32)
        smoothed = laplacian_smooth(noisy, tris, iterations=5)
        world = lambda v: v / (len(lin) - 1) * 2.0 - 1.0
        r_noisy = np.linalg.norm(world(noisy), axis=-1)
        r_smooth = np.linalg.norm(world(smoothed), axis=-1)
        assert r_smooth.std() < 0.5 * r_noisy.std()


class TestNormals:
    def test_sphere_normals_radial(self):
        grid, lin = sphere_grid()
        verts, tris = marching_tetrahedra(grid, 0.0)
        normals = vertex_normals(verts, tris)
        world = verts / (len(lin) - 1) * 2.0 - 1.0
        radial = world / np.linalg.norm(world, axis=-1, keepdims=True)
        cos = np.abs((normals * radial).sum(-1))
        assert np.median(cos) > 0.98


class TestKDTree:
    def test_point_cloud_distance_exact(self):
        rng = np.random.default_rng(0)
        dst = rng.normal(size=(500, 3)).astype(np.float32)
        src = rng.normal(size=(100, 3)).astype(np.float32)
        d = point_cloud_distance(src, dst)
        # Brute force oracle.
        brute = np.sqrt(
            ((src[:, None] - dst[None]) ** 2).sum(-1)).min(-1)
        np.testing.assert_allclose(d, brute, rtol=1e-5, atol=1e-6)

    def test_distance_zero_for_same_cloud(self):
        pts = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
        np.testing.assert_allclose(point_cloud_distance(pts, pts), 0.0,
                                   atol=1e-6)

    def test_radius_outlier(self):
        # Dense cluster + one isolated point.
        rng = np.random.default_rng(2)
        cluster = rng.normal(0, 0.05, size=(100, 3)).astype(np.float32)
        outlier = np.array([[5.0, 5.0, 5.0]], np.float32)
        pts = np.concatenate([cluster, outlier])
        keep = radius_outlier_mask(pts, min_neighbors=5, radius=0.5)
        assert keep[:100].all()
        assert not keep[100]


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
