"""Parity tests for the Pallas sampler megakernels (kernels/fused_sampler).

Run in interpret mode on CPU: the kernels must reproduce the jnp sampling
stack (models/endosurf.py upsample_z / ray_march) — same math, same
deterministic inverse-CDF draws, same crossing selection — to float32
tolerance. Tie-breaking inside the sorted merge may differ on exactly-equal
z values (bitonic network vs stable argsort), a measure-zero event for the
random inputs used here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.kernels import fused_sampler as fs
from endosurf_tpu.models.endosurf import (
    RenderSpec,
    _split_rays,
    _stratified_z,
    ray_march,
    render_rays,
    upsample_z,
)
from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
from endosurf_tpu.ops.geometry import ray_sphere_intersection
from endosurf_tpu.ops.mlp import set_matmul_precision


@pytest.fixture(scope="module")
def setup():
    set_matmul_precision("highest")
    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    n = 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    o = jnp.concatenate(
        [jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
         jnp.full((n, 1), -1.5)], axis=-1)
    target = jax.random.uniform(k2, (n, 3), minval=-0.2, maxval=0.2)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(k3, (n, 1))
    rays = jnp.concatenate(
        [o, d, jnp.zeros((n, 2), o.dtype), t], axis=-1)
    yield spec, params, rays
    set_matmul_precision("highest")


def test_upsample_parity(setup):
    spec, params, rays = setup
    rspec = RenderSpec()
    rays_o, _rays_d, rays_d_z, t = _split_rays(rays)
    near, far, _ = ray_sphere_intersection(rays_o, _rays_d)
    z0 = _stratified_z(near, far, rspec.n_samples, None)

    ref = np.asarray(upsample_z(spec, rspec, params, rays_o, rays_d_z, t,
                                z0))
    got = np.asarray(fs.fused_upsample_z(
        spec, params, rays_o, rays_d_z, t, z0, rspec.n_importance,
        rspec.up_sample_steps, compute_dtype=jnp.float32, interpret=True))
    assert got.shape == (rays.shape[0], rspec.n_samples + rspec.n_importance)
    # Final z lists must be ascending and match the jnp stack.
    assert np.all(np.diff(got, axis=-1) >= 0)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_upsample_return_sdf_parity(setup):
    """return_sdf must leave z bit-identical to the plain call and emit the
    SDF the field actually takes at those z (the march-reuse contract)."""
    from endosurf_tpu.models.endosurf import _sdf_sampling

    spec, params, rays = setup
    rspec = RenderSpec()
    rays_o, _rays_d, rays_d_z, t = _split_rays(rays)
    near, far, _ = ray_sphere_intersection(rays_o, _rays_d)
    z0 = _stratified_z(near, far, rspec.n_samples, None)

    z_plain = np.asarray(fs.fused_upsample_z(
        spec, params, rays_o, rays_d_z, t, z0, rspec.n_importance,
        rspec.up_sample_steps, compute_dtype=jnp.float32, interpret=True))
    z, sdf = fs.fused_upsample_z(
        spec, params, rays_o, rays_d_z, t, z0, rspec.n_importance,
        rspec.up_sample_steps, compute_dtype=jnp.float32, interpret=True,
        return_sdf=True)
    z, sdf = np.asarray(z), np.asarray(sdf)
    np.testing.assert_array_equal(z, z_plain)

    n, s = z.shape
    pts = (np.asarray(rays_o)[:, None, :]
           + z[..., None] * np.asarray(rays_d_z)[:, None, :])
    tt = np.broadcast_to(np.asarray(t)[:, None, :], (n, s, 1))
    ref = np.asarray(_sdf_sampling(
        spec, params, jnp.asarray(pts.reshape(-1, 3)),
        jnp.asarray(tt.reshape(-1, 1)))).reshape(n, s)
    np.testing.assert_allclose(sdf, ref, atol=2e-5)


def test_ray_march_parity(setup):
    spec, params, rays = setup
    rays_o, rays_d, rays_d_z, t = _split_rays(rays)
    near, far, _ = ray_sphere_intersection(rays_o, rays_d)

    d_ref, v_ref = ray_march(spec, params, rays)
    d_got, v_got = fs.fused_ray_march(
        spec, params, rays_o, rays_d_z, t, near, far,
        compute_dtype=jnp.float32, interpret=True)
    v_ref, v_got = np.asarray(v_ref), np.asarray(v_got)
    assert v_ref.sum() > rays.shape[0] // 2, "test scene should hit surface"
    np.testing.assert_array_equal(v_got, v_ref)
    np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                               atol=2e-5)


def test_render_rays_dispatch_parity(setup):
    """render_rays with the sampler kernels forced on (interpreted) matches
    the jnp path end-to-end (same z_vals -> same rendered maps)."""
    spec, params, rays = setup
    rspec = RenderSpec(perturb=False, anneal_end=0.0)
    step = jnp.asarray(1000.0)
    try:
        fs.set_sampler_kernel_mode("off")
        ref = render_rays(spec, rspec, params, rays, step)
        fs.set_sampler_kernel_mode("on")
        got = render_rays(spec, rspec, params, rays, step)
    finally:
        fs.set_sampler_kernel_mode("auto")
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=1e-4)


def test_upsample_shape_gate():
    assert fs.upsample_shape_supported(32, 32, 4)
    assert not fs.upsample_shape_supported(64, 64, 4)   # > 64 total
    assert not fs.upsample_shape_supported(32, 32, 2)   # 16 new per round
    assert not fs.upsample_shape_supported(32, 30, 4)   # not divisible


def test_sampler_kernels_under_mesh(setup):
    """Sampler kernels under shard_map on the 8-device mesh (the dispatch
    path mesh runs take, since pallas_call has no GSPMD rule) match the jnp
    path: same upsampled render maps, same traced surface depths."""
    from endosurf_tpu.models.endosurf import surface_neighbour_error
    from endosurf_tpu.parallel import mesh as pm

    spec, params, rays = setup
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    rspec = RenderSpec(perturb=False, anneal_end=0.0)
    step = jnp.asarray(1000.0)
    mask = jnp.ones((rays.shape[0], 1))
    key = jax.random.PRNGKey(7)
    mesh = pm.make_mesh(8)
    try:
        fs.set_sampler_kernel_mode("off")
        ref = render_rays(spec, rspec, params, rays, step)
        e_ref = surface_neighbour_error(spec, params, rays, mask, key)
        fs.set_sampler_kernel_mode("on")
        with mesh:
            got = jax.jit(
                lambda p: render_rays(spec, rspec, p, rays, step))(params)
            e_got = jax.jit(
                lambda p: surface_neighbour_error(spec, p, rays, mask,
                                                  key))(params)
    finally:
        fs.set_sampler_kernel_mode("auto")
        pm.set_mesh_active(False)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=1e-4)
    np.testing.assert_allclose(float(e_got), float(e_ref), atol=1e-4)


def test_availability_gate_off_cpu():
    # mode "auto" never engages off-TPU; "on" forces (interpret path).
    fs.set_sampler_kernel_mode("auto")
    assert not fs.sampler_kernel_available(1024)
    fs.set_sampler_kernel_mode("on")
    assert fs.sampler_kernel_available(8)
    fs.set_sampler_kernel_mode("auto")


def test_march_kernel_gate():
    """The march kernel's own knob composes with the shared sampler gate:
    march 'off' beats sampler 'on'; march 'on'/'auto' defer to the shared
    availability rule (so 'auto' still never engages off-TPU)."""
    try:
        fs.set_sampler_kernel_mode("on")
        fs.set_march_kernel_mode("off")
        assert not fs.march_kernel_available(1024)
        fs.set_march_kernel_mode("auto")
        assert fs.march_kernel_available(1024)
        fs.set_sampler_kernel_mode("auto")
        assert not fs.march_kernel_available(1024)  # CPU: shared gate off
    finally:
        fs.set_sampler_kernel_mode("auto")
        fs.set_march_kernel_mode("auto")


def test_fine_resample_parity():
    """The DNeRF importance-resample kernel (coarse weights -> det draws ->
    128-lane bitonic merge) matches the jnp glue (raw2outputs weights +
    sample_pdf + sort) to f32 tolerance."""
    import jax.numpy as jnp

    from endosurf_tpu.models.endonerf import raw2outputs
    from endosurf_tpu.ops.pdf import sample_pdf

    n, n0 = 64, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    z = jnp.sort(jax.random.uniform(k1, (n, n0), minval=0.5, maxval=1.5),
                 axis=-1)
    sigma = jax.nn.relu(jax.random.normal(k2, (n, n0)) * 3.0)
    rays_d = jax.random.normal(k3, (n, 3))
    d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    _, _, w = raw2outputs(jnp.zeros((n, n0, 3)), sigma, z, rays_d)
    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_s = sample_pdf(z_mid, w[..., 1:-1], 64, key=None)
    ref = np.asarray(jnp.sort(jnp.concatenate([z, z_s], -1), axis=-1))

    got = np.asarray(fs.fused_fine_resample(z, sigma, d_norm,
                                            interpret=True))
    assert got.shape == (n, 128)
    assert np.all(np.diff(got, axis=-1) >= 0)
    # atol: the in-kernel CDF (triangular-matmul prefix sum) rounds
    # differently from XLA's cumsum, so a draw sitting exactly on a bin
    # boundary can land one bin over (~1e-4-scale z shift on O(1) depths;
    # observed 1/8192 elements). Sampling positions are stop-gradient
    # inputs, so this is measure-zero jitter, not bias.
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_endonerf_render_resample_dispatch():
    """EndoNeRF render_rays with the sampler kernel forced on (interpreted)
    matches the jnp path end-to-end at the kernel-supported shape."""
    import jax.numpy as jnp

    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              init_dnerf_params)
    from endosurf_tpu.models.endonerf import render_rays as dn_render

    spec = DNeRFSpec(deform_layers=(3, 64, (1,)),
                     density_layers=(3, 64, (1,)),
                     color_layers=(2, 32, ()), geo_feat_dim=32)
    params = init_dnerf_params(jax.random.PRNGKey(0), spec)
    rspec = DNeRFRenderSpec(n_samples=64, n_importance=64)
    n = 32
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    o = jnp.concatenate([jax.random.uniform(k1, (n, 2), minval=-0.2,
                                            maxval=0.2),
                         jnp.full((n, 1), -1.5)], -1)
    d = jnp.concatenate([jnp.zeros((n, 2)), jnp.ones((n, 1))], -1)
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 1.2), jnp.full((n, 1), 0.1),
         jax.random.uniform(k2, (n, 1))], -1)
    try:
        fs.set_sampler_kernel_mode("off")
        ref = dn_render(spec, rspec, params, rays, key=None)
        fs.set_sampler_kernel_mode("on")
        got = dn_render(spec, rspec, params, rays, key=None)
    finally:
        fs.set_sampler_kernel_mode("auto")
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=1e-4)


def test_upsample_block_override_parity(setup):
    """BLOCK_R is runtime-tunable (set_block_r, swept in
    tools/sweep_blocks_r3c.py); a small override forces a multi-block grid
    (64 rays / block 16 = 4 grid steps) and must not change the math."""
    spec, params, rays = setup
    rspec = RenderSpec()
    rays_o, _rays_d, rays_d_z, t = _split_rays(rays)
    near, far, _ = ray_sphere_intersection(rays_o, _rays_d)
    z0 = _stratified_z(near, far, rspec.n_samples, None)

    ref = np.asarray(upsample_z(spec, rspec, params, rays_o, rays_d_z, t,
                                z0))
    saved_block_r = fs.BLOCK_R
    try:
        fs.set_block_r(16)
        got = np.asarray(fs.fused_upsample_z(
            spec, params, rays_o, rays_d_z, t, z0, rspec.n_importance,
            rspec.up_sample_steps, compute_dtype=jnp.float32,
            interpret=True))
        # Cap is a jit static of the dispatched program: proves the
        # override was compiled in (round-3 ADVICE vacuous-test fix).
        assert fs.LAST_BLOCK_R_CAP == 16
    finally:
        fs.set_block_r(saved_block_r)
    np.testing.assert_allclose(got, ref, atol=2e-5)
