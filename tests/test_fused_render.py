"""Parity tests for the Pallas inference render megakernel
(kernels/fused_render.py).

Interpret mode on CPU: the whole-pipeline kernel (stratified init ->
upsample rounds -> full field eval -> NeuS composite) must reproduce
models/endosurf.py::render_rays (key=None) to float32 tolerance, including
the weights-weighted normal map that evaluation/render_eval.py assembles
from weights + gradients_o on the jnp path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.kernels import fused_render as fr
from endosurf_tpu.models.endosurf import (
    RenderSpec,
    render_rays,
    render_rays_inference,
)
from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
from endosurf_tpu.ops.mlp import set_matmul_precision


def _rays(n: int, key=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    o = jnp.concatenate(
        [jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
         jnp.full((n, 1), -1.5)], axis=-1)
    target = jax.random.uniform(k2, (n, 3), minval=-0.2, maxval=0.2)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(k3, (n, 1))
    return jnp.concatenate([o, d, jnp.zeros((n, 2), o.dtype), t], axis=-1)


@pytest.fixture(scope="module")
def setup():
    set_matmul_precision("highest")
    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    yield spec, params, _rays(64)
    set_matmul_precision("highest")


def _ref_maps(out, n):
    normal = (np.asarray(out["gradients_o"]).reshape(n, -1, 3)
              * np.asarray(out["weights"])[..., None]).sum(1)
    return {"color_map": np.asarray(out["color_map"]),
            "depth_map": np.asarray(out["depth_map"]),
            "normal_map": normal,
            "acc_map": np.asarray(out["weights"]).sum(-1, keepdims=True),
            "weight_max": np.asarray(out["weights"]).max(-1, keepdims=True)}


def _check(got, ref_maps, atol=1e-4):
    for k, rv in ref_maps.items():
        np.testing.assert_allclose(np.asarray(got[k]), rv, atol=atol,
                                   err_msg=k)


def test_render_parity(setup):
    """Mid-anneal step: the annealed iter-cos path must match too."""
    spec, params, rays = setup
    rspec = RenderSpec()
    step = jnp.asarray(30000.0)
    ref = render_rays(spec, rspec, params, rays, step, key=None)
    got = fr.fused_render_rays(
        spec, params, rays, step, rspec.n_samples, rspec.n_importance,
        rspec.up_sample_steps, rspec.anneal_end, interpret=True)
    _check(got, _ref_maps(ref, rays.shape[0]))


def test_render_parity_no_deform(setup):
    """Static-scene vertical (use_deform=False)."""
    _, _, rays = setup
    spec = EndoSurfSpec(use_deform=False)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    rspec = RenderSpec(anneal_end=0.0)
    step = jnp.asarray(1000.0)
    ref = render_rays(spec, rspec, params, rays, step, key=None)
    got = fr.fused_render_rays(
        spec, params, rays, step, rspec.n_samples, rspec.n_importance,
        rspec.up_sample_steps, rspec.anneal_end, interpret=True)
    _check(got, _ref_maps(ref, rays.shape[0]))


def test_inference_dispatch_parity(setup):
    """render_rays_inference with the kernel forced on (interpreted) matches
    its own fallback path end-to-end."""
    spec, params, rays = setup
    rspec = RenderSpec(anneal_end=0.0)
    step = jnp.asarray(1000.0)
    try:
        fr.set_render_kernel_mode("off")
        ref = render_rays_inference(spec, rspec, params, rays, step)
        fr.set_render_kernel_mode("on")
        got = render_rays_inference(spec, rspec, params, rays, step)
    finally:
        fr.set_render_kernel_mode("auto")
    assert "normal_map" in got          # fused path engaged
    assert "normal_map" not in ref      # fallback returns the raw dict
    nrm = (np.asarray(ref["gradients_o"]).reshape(rays.shape[0], -1, 3)
           * np.asarray(ref["weights"])[..., None]).sum(1)
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["normal_map"]), nrm,
                               atol=1e-4)


def test_render_kernel_under_mesh(setup):
    """The kernel under shard_map on the 8-device mesh (the path mesh runs
    take, since pallas_call has no GSPMD rule) matches the jnp maps."""
    from endosurf_tpu.parallel import mesh as pm

    spec, params, rays = setup
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    rspec = RenderSpec(anneal_end=0.0)
    step = jnp.asarray(1000.0)
    mesh = pm.make_mesh(8)
    try:
        fr.set_render_kernel_mode("off")
        ref = render_rays(spec, rspec, params, rays, step, key=None)
        fr.set_render_kernel_mode("on")
        with mesh:
            got = jax.jit(lambda p: render_rays_inference(
                spec, rspec, p, rays, step))(params)
    finally:
        fr.set_render_kernel_mode("auto")
        pm.set_mesh_active(False)
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=1e-4)


def test_high_precision_mode(setup):
    """matmul_precision 'high' maps to in-kernel HIGHEST (Mosaic has no
    HIGH dot precision — this crashed the first TPU demo run against the
    high-precision checkpoint). Must trace, run, and match the f32 path."""
    spec, params, rays = setup
    rspec = RenderSpec(anneal_end=0.0)
    step = jnp.asarray(1000.0)
    ref = render_rays(spec, rspec, params, rays, step, key=None)
    got = fr.fused_render_rays(
        spec, params, rays, step, rspec.n_samples, rspec.n_importance,
        rspec.up_sample_steps, rspec.anneal_end,
        main_precision="high", interpret=True)
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=1e-4)


def test_shape_gate():
    assert fr.render_shape_supported(32, 32, 4)
    assert not fr.render_shape_supported(64, 64, 4)    # > 64 total lanes
    assert not fr.render_shape_supported(32, 30, 4)    # not divisible
    # 9 + 3*5 = 24 total is chunkable by 8, but k_new > 8 is not mergeable.
    assert not fr.render_shape_supported(8, 48, 4)


def test_availability_gate_off_cpu():
    fr.set_render_kernel_mode("auto")
    assert not fr.render_kernel_available(4096)
    fr.set_render_kernel_mode("on")
    assert fr.render_kernel_available(8)
    fr.set_render_kernel_mode("off")
    assert not fr.render_kernel_available(4096)
    fr.set_render_kernel_mode("auto")


def test_render_block_override_parity(setup):
    """set_block_r (swept in tools/sweep_blocks_r3c.py) must be
    math-neutral: a 16-ray block over the 64-ray batch = 4 grid steps."""
    spec, params, rays = setup
    rspec = RenderSpec(perturb=False, anneal_end=0.0)
    step = jnp.asarray(1000.0)
    saved_block_r = fr.BLOCK_R
    try:
        fr.set_render_kernel_mode("off")
        ref = render_rays_inference(spec, rspec, params, rays, step)
        fr.set_render_kernel_mode("on")
        fr.set_block_r(16)
        got = render_rays_inference(spec, rspec, params, rays, step)
        # The cap is a jit STATIC of the dispatched program — asserting it
        # proves the override was really compiled in, not a stale trace
        # (round-3 ADVICE: the old setter was silently ignored after the
        # first trace and this test passed vacuously).
        assert fr.LAST_BLOCK_R_CAP == 16
    finally:
        fr.set_render_kernel_mode("auto")
        fr.set_block_r(saved_block_r)
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=1e-4)
