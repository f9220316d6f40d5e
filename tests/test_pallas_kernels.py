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
