"""Parity tests for the EndoNeRF whole-pipeline inference megakernel
(kernels/fused_render_dnerf.py).

Interpret mode on CPU: the kernel (coarse sigma sweep -> importance
resample -> fine field eval -> raw2outputs composite) must reproduce
models/endonerf.py::render_rays (key=None, the eval path) to float32
tolerance on both the depth-guided Gaussian and the uniform z-init paths,
and the render_rays_inference dispatcher must route through it when forced.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.kernels import fused_render_dnerf as frd
from endosurf_tpu.models.endonerf import (
    DNeRFRenderSpec,
    DNeRFSpec,
    init_dnerf_params,
    render_rays,
    render_rays_inference,
)
from endosurf_tpu.ops.mlp import set_matmul_precision


def _rays(n: int, depth_guided: bool = True, key=1):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    o = jnp.concatenate(
        [jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
         jnp.full((n, 1), -1.5)], axis=-1)
    target = jax.random.uniform(k2, (n, 3), minval=-0.2, maxval=0.2)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(k3, (n, 1))
    if depth_guided:                     # slots 6/7 = (gt-depth mean, sigma)
        nf = jnp.concatenate(
            [jnp.full((n, 1), 1.45), jnp.full((n, 1), 0.08)], axis=-1)
    else:                                # slots 6/7 = (near, far)
        nf = jnp.concatenate(
            [jnp.full((n, 1), 0.8), jnp.full((n, 1), 2.2)], axis=-1)
    return jnp.concatenate([o, d, nf, t], axis=-1)


@pytest.fixture(scope="module")
def setup():
    set_matmul_precision("highest")
    spec = DNeRFSpec()
    params = init_dnerf_params(jax.random.PRNGKey(0), spec)
    yield spec, params
    set_matmul_precision("highest")


def _check(got, ref, atol=1e-4):
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=atol,
                               err_msg="color_map")
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=atol,
                               err_msg="depth_map")


def test_dnerf_render_parity_depth_guided(setup):
    spec, params = setup
    rspec = DNeRFRenderSpec()
    rays = _rays(64, depth_guided=True)
    ref = render_rays(spec, rspec, params, rays, key=None)
    got = frd.fused_render_rays_dnerf(spec, rspec, params, rays,
                                      interpret=True)
    _check(got, ref)
    acc_ref = np.asarray(ref["weights"]).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got["acc_map"]), acc_ref,
                               atol=1e-4, err_msg="acc_map")


def test_dnerf_render_parity_uniform(setup):
    """use_depth_sampling=False: stratified (unperturbed at eval) z init."""
    spec, params = setup
    rspec = DNeRFRenderSpec(use_depth_sampling=False)
    rays = _rays(64, depth_guided=False)
    ref = render_rays(spec, rspec, params, rays, key=None)
    got = frd.fused_render_rays_dnerf(spec, rspec, params, rays,
                                      interpret=True)
    _check(got, ref)


def test_inference_dispatch_parity(setup):
    """render_rays_inference must route through the kernel when forced 'on'
    (interpreted off-TPU) and match the 'off' jnp path."""
    spec, params = setup
    rspec = DNeRFRenderSpec()
    rays = _rays(64)
    try:
        frd.set_dnerf_render_kernel_mode("off")
        ref = render_rays_inference(spec, rspec, params, rays)
        frd.set_dnerf_render_kernel_mode("on")
        got = render_rays_inference(spec, rspec, params, rays)
    finally:
        frd.set_dnerf_render_kernel_mode("auto")
    _check(got, ref)


def test_inference_no_importance_falls_back(setup):
    """use_importance=False drops the importance stage (render_fn contract,
    round-3 VERDICT weak item 5) — must equal render_rays at n_importance=0."""
    spec, params = setup
    rspec = DNeRFRenderSpec()
    rays = _rays(32)
    try:
        frd.set_dnerf_render_kernel_mode("on")
        got = render_rays_inference(spec, rspec, params, rays,
                                    use_importance=False)
    finally:
        frd.set_dnerf_render_kernel_mode("auto")
    ref = render_rays(spec, dataclasses.replace(rspec, n_importance=0),
                      params, rays, key=None)
    _check(got, ref, atol=1e-5)


def test_block_override_parity(setup):
    """set_block_r must be compiled into the dispatched program (16-ray
    blocks over 64 rays = 4 grid steps) without changing the math."""
    spec, params = setup
    rspec = DNeRFRenderSpec()
    rays = _rays(64, key=3)
    ref = render_rays(spec, rspec, params, rays, key=None)
    saved_block_r = frd.BLOCK_R
    try:
        frd.set_block_r(16)
        got = frd.fused_render_rays_dnerf(spec, rspec, params, rays,
                                          interpret=True)
        assert frd.LAST_BLOCK_R_CAP == 16
    finally:
        frd.set_block_r(saved_block_r)
    _check(got, ref)


def test_shape_gate():
    spec = DNeRFSpec()
    assert frd.dnerf_render_shape_supported(spec, DNeRFRenderSpec())
    assert not frd.dnerf_render_shape_supported(
        spec, DNeRFRenderSpec(n_samples=32))
    assert not frd.dnerf_render_shape_supported(
        spec, DNeRFRenderSpec(n_importance=32))
    assert not frd.dnerf_render_shape_supported(
        DNeRFSpec(use_deform=False), DNeRFRenderSpec())
