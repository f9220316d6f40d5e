"""Renderer tests against the analytic sphere implied by geometric init.

With ``use_deform=False`` and SAL geometric init, the SDF network approximates
sdf(x) = |x| - 0.8 at initialization, giving closed-form expectations for
compositing depth and sphere tracing without any training.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.models.endosurf import (
    RenderSpec,
    error_on_depth,
    ray_march,
    render_rays,
    surface_from_samples,
    surface_neighbour_error,
)
from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params


@pytest.fixture(scope="module")
def static_sphere():
    spec = EndoSurfSpec(use_deform=False)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    return spec, params


def make_rays(n, origin_z=-2.0, spread=0.05):
    """Rays from (0,0,origin_z) roughly toward +z with small spread."""
    rng = np.random.default_rng(0)
    d = np.concatenate([
        rng.uniform(-spread, spread, size=(n, 2)), np.ones((n, 1))], axis=-1)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile([0.0, 0.0, origin_z], (n, 1))
    near = np.full((n, 1), 0.0)
    far = np.full((n, 1), 4.0)
    t = np.full((n, 1), 0.5)
    return jnp.asarray(
        np.concatenate([o, d, near, far, t], axis=-1).astype(np.float32))


class TestRenderRays:
    def test_shapes_and_depth(self, static_sphere):
        spec, params = static_sphere
        rspec = RenderSpec()
        rays = make_rays(8)
        out = render_rays(spec, rspec, params, rays, jnp.asarray(100000.0))
        n_total = rspec.n_samples + rspec.n_importance
        assert out["color_map"].shape == (8, 3)
        assert out["depth_map"].shape == (8, 1)
        assert out["weights"].shape == (8, n_total)
        assert out["gradients_o"].shape == (8, n_total, 3)
        # Camera at z=-2 looking at the ~0.8-radius init sphere: z-depth of
        # the front surface is ~1.2 for near-axis rays.
        depth = np.asarray(out["depth_map"])[:, 0]
        # At the untrained inv_s (~20) the alpha falloff is soft, so the
        # weighted depth lands slightly past the true surface at 1.2.
        np.testing.assert_allclose(depth, 1.3, atol=0.2)
        w = np.asarray(out["weights"])
        assert w.min() >= 0 and w.sum(-1).max() <= 1.0 + 1e-5
        # Geometric init gives near-unit gradients -> small eikonal error.
        assert float(out["gradient_o_error"]) < 0.1

    def test_jit_and_perturb(self, static_sphere):
        spec, params = static_sphere
        rspec = RenderSpec()
        fn = jax.jit(functools.partial(render_rays, spec, rspec),
                     static_argnames=("use_importance",))
        rays = make_rays(4)
        out1 = fn(params, rays, jnp.asarray(0.0), key=jax.random.PRNGKey(1))
        out2 = fn(params, rays, jnp.asarray(0.0), key=jax.random.PRNGKey(2))
        # Perturbed stratification differs per key but depths stay close.
        d1 = np.asarray(out1["depth_map"])
        d2 = np.asarray(out2["depth_map"])
        assert not np.allclose(d1, d2)
        np.testing.assert_allclose(d1, d2, atol=0.1)

    def test_no_importance_variant(self, static_sphere):
        spec, params = static_sphere
        rspec = RenderSpec()
        rays = make_rays(4)
        out = render_rays(spec, rspec, params, rays, jnp.asarray(0.0),
                          use_importance=False)
        assert out["weights"].shape == (4, rspec.n_samples)


class TestRayMarch:
    def test_hits_init_sphere(self, static_sphere):
        spec, params = static_sphere
        rays = make_rays(8, spread=0.02)
        depth, valid = ray_march(spec, params, rays)
        assert bool(np.all(np.asarray(valid)))
        # The marched depth must sit on the zero level set: |sdf| ~ 0 there
        # (secant refinement invariant), and all near-axis rays agree.
        from endosurf_tpu.models.fields import sdf_observed
        o = rays[:, :3]
        d_z = rays[:, 3:6] / rays[:, 5:6]
        pts = o + depth * d_z
        sdf = np.asarray(sdf_observed(spec, params, pts, rays[:, 8:9]))
        np.testing.assert_allclose(sdf, 0.0, atol=5e-3)
        assert np.asarray(depth).std() < 0.05

    def test_surface_from_samples_matches_march(self, static_sphere):
        """March-reuse localization on the render's importance samples must
        land on the same zero level set as the fresh 128-eval sphere trace
        (the consumer only needs localization far below the 0.05 neighbour
        radius)."""
        spec, params = static_sphere
        rspec = RenderSpec()
        rays = make_rays(8, spread=0.02)
        out = render_rays(spec, rspec, params, rays, jnp.asarray(0.0),
                          return_upsample=True)
        assert out["up_z"].shape == out["up_sdf"].shape == (
            8, rspec.n_samples + rspec.n_importance)
        assert bool(jnp.all(jnp.diff(out["up_z"], axis=-1) >= 0))

        d_march, v_march = ray_march(spec, params, rays)
        d_reuse, v_reuse = surface_from_samples(
            spec, params, rays, out["up_z"], out["up_sdf"])
        assert bool(np.all(np.asarray(v_reuse)))
        np.testing.assert_array_equal(np.asarray(v_reuse),
                                      np.asarray(v_march))
        np.testing.assert_allclose(np.asarray(d_reuse), np.asarray(d_march),
                                   atol=5e-3)

        from endosurf_tpu.models.fields import sdf_observed
        o = rays[:, :3]
        d_z = rays[:, 3:6] / rays[:, 5:6]
        pts = o + d_reuse * d_z
        sdf = np.asarray(sdf_observed(spec, params, pts, rays[:, 8:9]))
        np.testing.assert_allclose(sdf, 0.0, atol=5e-3)

        # Secant refinement on top of reuse tightens (or matches) |sdf|.
        d_sec, _ = surface_from_samples(
            spec, params, rays, out["up_z"], out["up_sdf"], n_secant=4)
        sdf_sec = np.asarray(sdf_observed(
            spec, params, o + d_sec * d_z, rays[:, 8:9]))
        assert np.abs(sdf_sec).max() <= np.abs(sdf).max() + 1e-5

    def test_return_upsample_leaves_render_unchanged(self, static_sphere):
        spec, params = static_sphere
        rspec = RenderSpec()
        rays = make_rays(4)
        key = jax.random.PRNGKey(3)
        plain = render_rays(spec, rspec, params, rays, jnp.asarray(0.0),
                            key=key)
        with_up = render_rays(spec, rspec, params, rays, jnp.asarray(0.0),
                              key=key, return_upsample=True)
        np.testing.assert_array_equal(np.asarray(plain["depth_map"]),
                                      np.asarray(with_up["depth_map"]))
        np.testing.assert_array_equal(np.asarray(plain["color_map"]),
                                      np.asarray(with_up["color_map"]))

    def test_miss_is_invalid_from_samples(self, static_sphere):
        spec, params = static_sphere
        # Rays pointing away from the sphere never cross the surface.
        o = np.tile([0.0, 0.0, -2.0], (4, 1))
        d = np.tile([0.0, 0.0, -1.0], (4, 1))
        rays = jnp.asarray(np.concatenate(
            [o, d, np.zeros((4, 1)), np.full((4, 1), 4.0),
             np.full((4, 1), 0.5)], -1).astype(np.float32))
        rspec = RenderSpec()
        out = render_rays(spec, rspec, params, rays, jnp.asarray(0.0),
                          return_upsample=True)
        depth, valid = surface_from_samples(
            spec, params, rays, out["up_z"], out["up_sdf"])
        assert not bool(np.any(np.asarray(valid)))
        assert np.all(np.isfinite(np.asarray(depth)))

    def test_miss_is_invalid(self, static_sphere):
        spec, params = static_sphere
        # Rays pointing away from the sphere never cross the surface.
        o = np.tile([0.0, 0.0, -2.0], (4, 1))
        d = np.tile([0.0, 0.0, -1.0], (4, 1))
        rays = jnp.asarray(np.concatenate(
            [o, d, np.zeros((4, 1)), np.full((4, 1), 4.0),
             np.full((4, 1), 0.5)], -1).astype(np.float32))
        depth, valid = ray_march(spec, params, rays)
        assert not bool(np.any(np.asarray(valid)))
        assert np.all(np.isfinite(np.asarray(depth)))  # NaN-safe placeholder


class TestDepthLosses:
    def test_error_on_depth_zero_at_surface(self, static_sphere):
        spec, params = static_sphere
        rays = make_rays(8, spread=0.02)
        mask = jnp.ones((8, 1))
        # Points exactly on the init surface (located by sphere tracing)
        # -> tiny SDF error; displaced points -> larger error.
        d_surface, _ = ray_march(spec, params, rays)
        sdf_err_surf, angle_err, region = error_on_depth(
            spec, params, rays, d_surface, mask)
        sdf_err_wrong, _, _ = error_on_depth(spec, params, rays,
                                             d_surface + 0.3, mask)
        assert float(sdf_err_surf) < 0.1
        assert float(sdf_err_wrong) > 2 * float(sdf_err_surf)
        assert region.shape == (8, 1)
        # Rays enter the sphere front-facing: gradient opposes direction, so
        # relu(cos) ~ 0.
        assert float(angle_err) < 0.1

    def test_surface_neighbour_error_finite(self, static_sphere):
        spec, params = static_sphere
        rays = make_rays(8, spread=0.02)
        mask = jnp.ones((8, 1))
        err = surface_neighbour_error(spec, params, rays, mask,
                                      jax.random.PRNGKey(0), 0.05)
        assert np.isfinite(float(err))
        # Smooth init sphere -> neighbouring normals nearly parallel.
        assert float(err) < 0.2

    def test_render_on_depth(self, static_sphere):
        from endosurf_tpu.models.endosurf import render_on_depth
        spec, params = static_sphere
        rays = make_rays(6, spread=0.02)
        depth, valid = ray_march(spec, params, rays)
        color, grad = render_on_depth(spec, params, rays, depth, valid)
        assert color.shape == (6, 3) and grad.shape == (6, 3)
        c = np.asarray(color)
        assert c.min() >= 0 and c.max() <= 1
        # Invalid rays are zeroed.
        color0, grad0 = render_on_depth(spec, params, rays, depth,
                                        jnp.zeros_like(valid))
        np.testing.assert_array_equal(np.asarray(color0), 0.0)

    def test_surface_neighbour_error_reuse_close_to_march(
            self, static_sphere):
        spec, params = static_sphere
        rspec = RenderSpec()
        rays = make_rays(8, spread=0.02)
        mask = jnp.ones((8, 1))
        key = jax.random.PRNGKey(0)
        err_march = surface_neighbour_error(spec, params, rays, mask, key,
                                            0.05)
        out = render_rays(spec, rspec, params, rays, jnp.asarray(0.0),
                          return_upsample=True)
        err_reuse = surface_neighbour_error(
            spec, params, rays, mask, key, 0.05,
            samples=(out["up_z"], out["up_sdf"]))
        # Same surface, same neighbour draw (same key) -> near-identical
        # normal-consistency error; the only difference is the sub-mm
        # localization delta between secant-refined march and reuse interp.
        np.testing.assert_allclose(float(err_reuse), float(err_march),
                                   atol=2e-3)

    def test_surface_neighbour_error_all_masked(self, static_sphere):
        spec, params = static_sphere
        rays = make_rays(4)
        err = surface_neighbour_error(spec, params, rays, jnp.zeros((4, 1)),
                                      jax.random.PRNGKey(0), 0.05)
        assert float(err) == 0.0


class TestSamplingPrecision:
    """The bf16 sampling-path override must only perturb sample *locations*:
    render results stay close, and None (inherit) is bit-identical."""

    def test_inherit_is_identity(self, static_sphere):
        from endosurf_tpu.ops.mlp import (get_sampling_precision,
                                          set_sampling_precision)
        spec, params = static_sphere
        rspec = RenderSpec()
        rays = make_rays(8)
        prev = get_sampling_precision()  # trainer tests may have set it
        set_sampling_precision(None)
        try:
            base = render_rays(spec, rspec, params, rays, jnp.asarray(1000.0))
            again = render_rays(spec, rspec, params, rays,
                                jnp.asarray(1000.0))
        finally:
            set_sampling_precision(prev)
        np.testing.assert_array_equal(np.asarray(base["color_map"]),
                                      np.asarray(again["color_map"]))

    def test_bf16_sampling_close_and_restored(self, static_sphere):
        from endosurf_tpu.ops.mlp import (get_matmul_precision,
                                          set_sampling_precision)
        spec, params = static_sphere
        rspec = RenderSpec()
        rays = make_rays(8)
        set_sampling_precision(None)
        base = render_rays(spec, rspec, params, rays, jnp.asarray(1000.0))
        main_prec = get_matmul_precision()
        set_sampling_precision("default")
        try:
            fast = render_rays(spec, rspec, params, rays, jnp.asarray(1000.0))
            # The scope must restore the main precision after tracing.
            assert get_matmul_precision() == main_prec
            err = surface_neighbour_error(
                spec, params, rays, jnp.ones((8, 1)),
                jax.random.PRNGKey(0), 0.05)
            assert np.isfinite(float(err))
        finally:
            set_sampling_precision(None)
        # Only the importance sample z-locations moved; composited maps stay
        # close on the smooth init sphere.
        np.testing.assert_allclose(np.asarray(base["color_map"]),
                                   np.asarray(fast["color_map"]), atol=5e-3)
        np.testing.assert_allclose(np.asarray(base["depth_map"]),
                                   np.asarray(fast["depth_map"]), atol=5e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
