"""Property-based tests for the numerics core (hypothesis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from endosurf_tpu.ops.geometry import ray_sphere_intersection  # noqa: E402
from endosurf_tpu.ops.neus import exclusive_cumprod_weights, neus_alpha  # noqa: E402
from endosurf_tpu.ops.pdf import sample_pdf  # noqa: E402

finite = st.floats(min_value=-3.0, max_value=3.0, allow_nan=False,
                   width=32)


@settings(max_examples=25, deadline=None)
@given(st.lists(finite, min_size=3, max_size=3),
       st.lists(finite, min_size=3, max_size=3))
def test_sphere_intersection_invariants(o, d):
    o = np.array(o, np.float32)
    d = np.array(d, np.float32)
    if np.linalg.norm(d) < 1e-3:
        return
    near, far, hit = ray_sphere_intersection(jnp.asarray(o[None]),
                                             jnp.asarray(d[None]))
    near, far = float(near[0, 0]), float(far[0, 0])
    assert near >= 0.0
    # far < near only when the sphere lies entirely behind the origin
    # (near clamps to 0, far stays negative) — reference semantics
    # (renderer/utils.py:204-205); rays in the pipeline never do this.
    if far > 0:
        assert far >= near - 1e-6
    if bool(hit[0, 0]) and far > 0:
        # The far intersection point lies on the unit sphere.
        p = o + far * d
        np.testing.assert_allclose(np.linalg.norm(p), 1.0, atol=1e-3)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=1.0, width=32),
                min_size=4, max_size=12))
def test_weights_bounded_and_monotone_transmittance(alphas):
    a = jnp.asarray(np.array(alphas, np.float32))[None]
    w = np.asarray(exclusive_cumprod_weights(a, eps=0.0))[0]
    assert np.all(w >= -1e-6)
    assert w.sum() <= 1.0 + 1e-5


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=2, max_value=16),
       st.integers(min_value=1, max_value=16),
       st.integers(min_value=0, max_value=10**6))
def test_sample_pdf_within_bins(n_bins, n_samples, seed):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    bins = jnp.sort(jax.random.uniform(k1, (1, n_bins), minval=0, maxval=10))
    weights = jax.random.uniform(k2, (1, n_bins - 1)) + 0.01
    s = np.asarray(sample_pdf(bins, weights, n_samples, key=key))
    assert s.min() >= float(bins[0, 0]) - 1e-5
    assert s.max() <= float(bins[0, -1]) + 1e-5


@settings(max_examples=25, deadline=None)
@given(st.lists(finite, min_size=4, max_size=8),
       st.floats(min_value=0.0, max_value=1.0, width=32),
       st.floats(min_value=1.0, max_value=500.0, width=32))
def test_alpha_always_valid(sdfs, anneal, inv_s):
    sdf = jnp.asarray(np.array(sdfs, np.float32))[None]
    iter_cos = -jnp.abs(jnp.asarray(np.array(sdfs, np.float32)))[None] * anneal
    dists = jnp.full_like(sdf, 0.1)
    alpha, prev_cdf = neus_alpha(sdf, iter_cos, dists, inv_s)
    a = np.asarray(alpha)
    assert np.all((a >= 0) & (a <= 1))
    assert np.all(np.isfinite(np.asarray(prev_cdf)))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
