"""Unit tests for the numerics core: encoding, geometry, pdf, neus math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.ops.encoding import freq_encode, freq_encode_dim
from endosurf_tpu.ops.geometry import ray_sphere_intersection, rays_from_pixels
from endosurf_tpu.ops.neus import (
    annealed_iter_cos,
    exclusive_cumprod_weights,
    merge_sorted_z,
    neus_alpha,
    upsample_weights_from_sdf,
)
from endosurf_tpu.ops.pdf import inverse_cdf_sample, sample_pdf


class TestFreqEncode:
    def test_dim(self):
        assert freq_encode_dim(3, 6) == 3 + 3 * 6 * 2 == 39
        assert freq_encode_dim(1, 6) == 13
        assert freq_encode_dim(3, 10) == 63
        assert freq_encode_dim(3, 4) == 27

    def test_values_and_order(self):
        # Reference interleave: [x, sin(x*1), cos(x*1), sin(x*2), cos(x*2), ...]
        x = jnp.array([[0.3, -0.7, 0.1]])
        out = np.asarray(freq_encode(x, 2))
        expected = np.concatenate([
            np.asarray(x),
            np.sin(np.asarray(x) * 1.0), np.cos(np.asarray(x) * 1.0),
            np.sin(np.asarray(x) * 2.0), np.cos(np.asarray(x) * 2.0),
        ], axis=-1)
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_zero_freqs_identity(self):
        x = jnp.ones((4, 3))
        np.testing.assert_array_equal(np.asarray(freq_encode(x, 0)), np.ones((4, 3)))


class TestSphereIntersection:
    def test_through_center(self):
        o = jnp.array([[0.0, 0.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, far, hit = ray_sphere_intersection(o, d)
        np.testing.assert_allclose(np.asarray(near), [[1.0]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(far), [[3.0]], atol=1e-6)
        assert bool(hit[0, 0])

    def test_miss(self):
        o = jnp.array([[0.0, 2.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        near, far, hit = ray_sphere_intersection(o, d)
        assert not bool(hit[0, 0])
        # near clamps at 0 and near == far when tangent/missing chord is 0.
        np.testing.assert_allclose(np.asarray(near), np.asarray(far), atol=1e-6)

    def test_origin_inside(self):
        o = jnp.zeros((1, 3))
        d = jnp.array([[1.0, 0.0, 0.0]])
        near, far, hit = ray_sphere_intersection(o, d)
        np.testing.assert_allclose(np.asarray(near), [[0.0]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(far), [[1.0]], atol=1e-6)

    def test_unnormalized_direction(self):
        o = jnp.array([[0.0, 0.0, -2.0]])
        d = jnp.array([[0.0, 0.0, 4.0]])  # length 4 => distances scale by 1/4
        near, far, _ = ray_sphere_intersection(o, d)
        np.testing.assert_allclose(np.asarray(near), [[0.25]], atol=1e-6)
        np.testing.assert_allclose(np.asarray(far), [[0.75]], atol=1e-6)


class TestRaysFromPixels:
    def test_pinhole_center_pixel(self):
        # Identity pose, K with focal 100, principal point (50, 60).
        K = np.array([[100.0, 0, 50], [0, 100.0, 60], [0, 0, 1]])
        K_inv = jnp.asarray(np.linalg.inv(K))
        pose = jnp.eye(4)
        o, d = rays_from_pixels(jnp.array(50.0), jnp.array(60.0), K_inv, pose)
        np.testing.assert_allclose(np.asarray(o), [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), [0, 0, 1], atol=1e-6)

    def test_translation_and_unit_norm(self):
        K_inv = jnp.asarray(np.linalg.inv(
            np.array([[80.0, 0, 32], [0, 80.0, 24], [0, 0, 1]])))
        pose = jnp.asarray(np.block([
            [np.eye(3), np.array([[1.0], [2.0], [3.0]])],
            [np.zeros((1, 3)), np.ones((1, 1))]]))
        px = jnp.arange(4, dtype=jnp.float32)
        py = jnp.arange(4, dtype=jnp.float32) + 3
        o, d = rays_from_pixels(px, py, K_inv, pose)
        assert o.shape == (4, 3) and d.shape == (4, 3)
        np.testing.assert_allclose(np.asarray(o), np.tile([1, 2, 3], (4, 1)))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d), axis=-1), np.ones(4), rtol=1e-6)


class TestSamplePdf:
    def test_uniform_weights_deterministic(self):
        bins = jnp.linspace(0.0, 1.0, 5)[None, :].repeat(2, 0)
        weights = jnp.ones((2, 4))
        samples = np.asarray(sample_pdf(bins, weights, 8))
        # Uniform pdf => midpoint rule gives evenly spaced samples.
        expected = np.linspace(0.5 / 8, 1 - 0.5 / 8, 8)
        np.testing.assert_allclose(samples[0], expected, atol=1e-5)
        assert np.all(np.diff(samples, axis=-1) > 0)

    def test_concentrates_on_heavy_bin(self):
        bins = jnp.linspace(0.0, 1.0, 5)[None, :]
        weights = jnp.array([[0.0, 100.0, 0.0, 0.0]])
        samples = np.asarray(sample_pdf(bins, weights, 16))
        # Nearly all mass in bin [0.25, 0.5).
        assert np.mean((samples >= 0.25) & (samples <= 0.5)) > 0.9

    def test_random_samples_within_range(self):
        key = jax.random.PRNGKey(0)
        bins = jnp.linspace(2.0, 3.0, 9)[None, :].repeat(7, 0)
        weights = jax.random.uniform(key, (7, 8)) + 0.1
        samples = np.asarray(sample_pdf(bins, weights, 12, key=key))
        assert samples.min() >= 2.0 and samples.max() <= 3.0

    def test_statistical_match_to_pdf(self):
        # Large-sample histogram should approximate the target pdf.
        key = jax.random.PRNGKey(1)
        bins = jnp.linspace(0.0, 1.0, 5)[None, :]
        weights = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        samples = np.asarray(sample_pdf(
            jnp.repeat(bins, 400, 0), jnp.repeat(weights, 400, 0), 64,
            key=key)).ravel()
        hist, _ = np.histogram(samples, bins=np.linspace(0, 1, 5))
        frac = hist / hist.sum()
        np.testing.assert_allclose(frac, [0.1, 0.2, 0.3, 0.4], atol=0.02)


class TestInverseCdfSample:
    def test_zero_weight_excluded(self):
        key = jax.random.PRNGKey(0)
        w = jnp.array([0.0, 1.0, 0.0, 1.0, 0.0])
        idx = np.asarray(inverse_cdf_sample(w, 4096, key))
        assert set(np.unique(idx)) <= {1, 3}
        frac = np.mean(idx == 1)
        assert 0.45 < frac < 0.55

    def test_proportional(self):
        key = jax.random.PRNGKey(7)
        w = jnp.array([1.0, 3.0])
        idx = np.asarray(inverse_cdf_sample(w, 8192, key))
        assert abs(np.mean(idx == 1) - 0.75) < 0.02


class TestNeusMath:
    def test_iter_cos_limits(self):
        c = jnp.array([-1.0, -0.5, 0.0, 0.5, 1.0])
        # ratio 0: -relu(-c/2 + 0.5)
        np.testing.assert_allclose(
            np.asarray(annealed_iter_cos(c, 0.0)),
            -np.maximum(-np.asarray(c) * 0.5 + 0.5, 0.0), atol=1e-6)
        # ratio 1: -relu(-c)
        np.testing.assert_allclose(
            np.asarray(annealed_iter_cos(c, 1.0)),
            -np.maximum(-np.asarray(c), 0.0), atol=1e-6)
        assert np.all(np.asarray(annealed_iter_cos(c, 0.37)) <= 0.0)

    def test_alpha_surface_crossing(self):
        # A ray crossing sdf + -> - should produce opacity near the crossing.
        sdf = jnp.array([[0.3, 0.1, -0.1, -0.3]])
        iter_cos = jnp.full((1, 4), -1.0)
        dists = jnp.full((1, 4), 0.2)
        alpha, prev_cdf = neus_alpha(sdf, iter_cos, dists, 64.0)
        a = np.asarray(alpha)[0]
        assert np.all((a >= 0) & (a <= 1))
        assert a[2] > 0.9  # bin past the crossing is opaque at sharp inv_s
        assert a[0] < a[1] < a[2]

    def test_alpha_no_surface(self):
        sdf = jnp.full((1, 4), 0.5)
        alpha, _ = neus_alpha(sdf, jnp.zeros((1, 4)), jnp.full((1, 4), 0.1), 64.0)
        np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-4)

    def test_weights_exclusive_cumprod(self):
        alpha = jnp.array([[0.5, 0.5, 1.0, 0.5]])
        w = np.asarray(exclusive_cumprod_weights(alpha, eps=0.0))
        np.testing.assert_allclose(
            w, [[0.5, 0.25, 0.25, 0.0]], atol=1e-6)
        assert w.sum() <= 1.0 + 1e-6

    def test_upsample_weights_peak_at_crossing(self):
        z = jnp.linspace(0.0, 2.0, 17)[None, :]
        # Surface at z=1: sdf = 1 - z.
        sdf = 1.0 - z
        radius = jnp.abs(1.0 - z)  # stays inside unit sphere near crossing
        w = np.asarray(upsample_weights_from_sdf(z, sdf, radius, 64.0))[0]
        assert w.argmax() in (7, 8)  # bins straddling z=1

    def test_merge_sorted(self):
        z = jnp.array([[0.0, 1.0, 2.0]])
        nz = jnp.array([[0.5, 1.5]])
        s = jnp.array([[10.0, 11.0, 12.0]])
        ns = jnp.array([[20.0, 21.0]])
        zm, sm = merge_sorted_z(z, nz, s, ns)
        np.testing.assert_allclose(np.asarray(zm), [[0, 0.5, 1, 1.5, 2]])
        np.testing.assert_allclose(np.asarray(sm), [[10, 20, 11, 21, 12]])


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
