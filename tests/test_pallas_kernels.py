"""Correctness tests for the fused Pallas SDF kernel (interpreter mode)."""

import jax
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from endosurf_tpu.kernels.fused_sdf import fused_sdf_observed
from endosurf_tpu.models.fields import (
    EndoSurfSpec,
    MLPSpec,
    init_endosurf_params,
    sdf_observed,
)


@pytest.fixture(scope="module")
def small():
    spec = EndoSurfSpec(
        deform=MLPSpec(3, 64, (1,), 3),
        sdf=MLPSpec(3, 64, (1,), 33),
        color=MLPSpec(2, 64, (), 3),
        color_feat_dim=32)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    return spec, params


def _compare(spec, params, n=700, seed=1, atol=2e-5):
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (n, 3), minval=-0.8, maxval=0.8)
    t = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 1))
    ref = np.asarray(sdf_observed(spec, params, x, t))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sdf_observed(spec, params, x, t))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=atol)


def test_matches_reference_with_deform(small):
    spec, params = small
    _compare(spec, params)


def test_matches_reference_no_deform(small):
    import dataclasses
    spec, params = small
    _compare(dataclasses.replace(spec, use_deform=False), params)


def test_non_multiple_block_padding(small):
    spec, params = small
    _compare(spec, params, n=513)
    _compare(spec, params, n=511)


def test_dispatch_gate_cpu(small):
    """On the CPU test backend the sampling dispatch must use the jnp path
    (the Mosaic kernel only wins — and only compiles — on real TPUs)."""
    from endosurf_tpu.kernels.fused_sdf import (fused_sdf_available,
                                                set_fused_sdf_enabled)
    assert not fused_sdf_available(1 << 20)  # cpu backend -> False
    set_fused_sdf_enabled(False)
    assert not fused_sdf_available(1 << 20)
    set_fused_sdf_enabled(True)
    # _sdf_sampling must agree with sdf_observed wherever it routes.
    spec, params = small
    import jax.numpy as jnp
    from endosurf_tpu.models.endosurf import _sdf_sampling
    x = jax.random.uniform(jax.random.PRNGKey(5), (9000, 3),
                           minval=-0.8, maxval=0.8)
    t = jax.random.uniform(jax.random.PRNGKey(6), (9000, 1))
    np.testing.assert_allclose(
        np.asarray(_sdf_sampling(spec, params, x, t)),
        np.asarray(sdf_observed(spec, params, x, t)), rtol=1e-5, atol=1e-6)


def test_full_size_spec_slice():
    # Full 9x256 networks through the kernel on a small batch.
    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(2), spec)
    _compare(spec, params, n=128, atol=5e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


# ---------------------------------------------------------------------------
# DNeRF density chain (fused_density_raw)
# ---------------------------------------------------------------------------

def _dnerf_small():
    from endosurf_tpu.models.endonerf import DNeRFSpec, init_dnerf_params
    spec = DNeRFSpec(deform_layers=(3, 64, (1,)),
                     density_layers=(3, 64, (1,)),
                     color_layers=(2, 32, ()), geo_feat_dim=32)
    params = init_dnerf_params(jax.random.PRNGKey(0), spec)
    return spec, params


def _compare_density(spec, params, n=700, seed=1):
    from endosurf_tpu.kernels.fused_sdf import fused_density_raw
    from endosurf_tpu.models.endonerf import _density_feat, _warp
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (n, 3), minval=-0.8, maxval=0.8)
    t = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 1))
    ref = np.asarray(_density_feat(spec, params,
                                   _warp(spec, params, x, t))[..., :1])
    got = np.asarray(fused_density_raw(spec, params, x, t, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


def test_density_matches_reference_with_deform():
    spec, params = _dnerf_small()
    _compare_density(spec, params)


def test_density_matches_reference_no_deform():
    import dataclasses
    spec, params = _dnerf_small()
    spec = dataclasses.replace(spec, use_deform=False)
    params = {k: v for k, v in params.items() if k != "deform"}
    _compare_density(spec, params)


def test_density_full_size_spec_slice():
    """Full-size DNeRF nets (9x256, skip 5, 10/10/10 octaves), small batch."""
    from endosurf_tpu.models.endonerf import DNeRFSpec, init_dnerf_params
    spec = DNeRFSpec()
    params = init_dnerf_params(jax.random.PRNGKey(2), spec)
    _compare_density(spec, params, n=260, seed=3)


def test_coarse_pass_kernel_parity():
    """render_rays' coarse importance weights are identical when the raw
    sigma query runs through the fused kernel (forced, interpreted)."""
    import jax.numpy as jnp

    from endosurf_tpu.kernels import fused_sdf as fsdf
    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec,
                                              init_dnerf_params,
                                              render_rays)
    spec, params = _dnerf_small()
    rspec = DNeRFRenderSpec(n_samples=16, n_importance=16)
    n = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    o = jnp.concatenate([jax.random.uniform(k1, (n, 2), minval=-0.2,
                                            maxval=0.2),
                         jnp.full((n, 1), -1.5)], -1)
    d = jnp.concatenate([jnp.zeros((n, 2)), jnp.ones((n, 1))], -1)
    rays = jnp.concatenate(
        [o, d, jnp.full((n, 1), 1.2), jnp.full((n, 1), 0.3),
         jax.random.uniform(k2, (n, 1))], -1)
    ref = render_rays(spec, rspec, params, rays, key=None)
    # Force the kernel gate open on CPU: min-points to 1, backend check
    # bypassed via interpret-mode flag inside _raw_sigma_sampling is not
    # reachable -> instead call with monkeypatched gate.
    old_min, old_en = fsdf._MIN_POINTS, fsdf._ENABLED
    old_avail = fsdf.fused_sdf_available
    try:
        fsdf.fused_sdf_available = lambda n_points: True
        import endosurf_tpu.kernels.fused_sdf as _m
        from jax.experimental.pallas import tpu as _pltpu
        with _pltpu.force_tpu_interpret_mode():
            got = render_rays(spec, rspec, params, rays, key=None)
    finally:
        fsdf.fused_sdf_available = old_avail
        fsdf._MIN_POINTS, fsdf._ENABLED = old_min, old_en
    np.testing.assert_allclose(np.asarray(got["color_map"]),
                               np.asarray(ref["color_map"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["depth_map"]),
                               np.asarray(ref["depth_map"]), atol=1e-4)
