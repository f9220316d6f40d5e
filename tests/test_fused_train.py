"""Oracle tests for the fused fwd+bwd training megakernel (jnp path).

Validates kernels/fused_train.py against autodiff of the original
fields.fused_point_eval: forward outputs and parameter gradients (including
the second-order structure through grad_o's eikonal-style consumption) must
match at f32/"highest" precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.kernels.fused_train import (
    forward_math,
    megakernel_point_eval,
    pad_lanes,
    prepare_effective,
    selectors,
)
from endosurf_tpu.models.fields import (
    EndoSurfSpec,
    MLPSpec,
    fused_point_eval,
    init_endosurf_params,
)


@pytest.fixture(scope="module")
def small_spec():
    return EndoSurfSpec(
        deform=MLPSpec(3, 64, (1,), 3),
        sdf=MLPSpec(3, 64, (1,), 33),
        color=MLPSpec(2, 64, (), 3),
        color_feat_dim=32,
    )


@pytest.fixture(scope="module")
def small_params(small_spec):
    return init_endosurf_params(jax.random.PRNGKey(0), small_spec)


@pytest.fixture(scope="module")
def batch():
    key = jax.random.PRNGKey(7)
    kx, kd, kt = jax.random.split(key, 3)
    n = 33
    x = jax.random.uniform(kx, (n, 3), minval=-0.8, maxval=0.8)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(kt, (n, 1))
    return x, d, t


def _assert_out_close(ref, got, rtol=2e-5, atol=2e-6):
    for k in ("sdf", "color", "grad_o", "grad_c"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=rtol, atol=atol,
            err_msg=k)


def test_forward_parity_small(small_spec, small_params, batch):
    x, d, t = batch
    ref = fused_point_eval(small_spec, small_params, x, d, t)
    got = megakernel_point_eval(small_spec, small_params, x, d, t)
    _assert_out_close(ref, got)


def test_forward_parity_default_spec(batch):
    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(1), spec)
    x, d, t = batch
    ref = fused_point_eval(spec, params, x, d, t)
    got = megakernel_point_eval(spec, params, x, d, t)
    _assert_out_close(ref, got)


def test_forward_parity_no_deform(batch):
    spec = EndoSurfSpec(
        use_deform=False,
        sdf=MLPSpec(3, 64, (1,), 33),
        color=MLPSpec(2, 64, (), 3),
        color_feat_dim=32,
    )
    params = init_endosurf_params(jax.random.PRNGKey(2), spec)
    x, d, t = batch
    ref = fused_point_eval(spec, params, x, d, t)
    got = megakernel_point_eval(spec, params, x, d, t)
    _assert_out_close(ref, got)


def _loss(eval_fn, spec, params, x, d, t):
    """Mixed loss touching every output, incl. second-order through grad_o
    (the eikonal term the trainer differentiates through)."""
    out = eval_fn(spec, params, x, d, t)
    eik = jnp.mean((jnp.linalg.norm(out["grad_o"], axis=-1) - 1.0) ** 2)
    cos = jnp.mean(jnp.sum(d * out["grad_o"], axis=-1) * out["sdf"])
    col = jnp.mean((out["color"] - 0.5) ** 2)
    nrm = jnp.mean(jnp.abs(out["grad_c"]))
    return jnp.mean(jnp.abs(out["sdf"])) + eik + cos + col + 0.1 * nrm


def test_grad_parity_small(small_spec, small_params, batch):
    x, d, t = batch
    g_ref = jax.grad(
        lambda p: _loss(fused_point_eval, small_spec, p, x, d, t)
    )(small_params)
    g_got = jax.grad(
        lambda p: _loss(megakernel_point_eval, small_spec, p, x, d, t)
    )(small_params)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_got, _ = jax.tree_util.tree_flatten_with_path(g_got)
    assert len(flat_ref) == len(flat_got)
    for (path_r, a), (_, b) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path_r))


def test_grad_parity_default_spec(batch):
    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(1), spec)
    x, d, t = batch
    g_ref = jax.grad(
        lambda p: _loss(fused_point_eval, spec, p, x, d, t))(params)
    g_got = jax.grad(
        lambda p: _loss(megakernel_point_eval, spec, p, x, d, t))(params)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_got, _ = jax.tree_util.tree_flatten_with_path(g_got)
    for (path_r, a), (_, b) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path_r))


def test_monolithic_matches_segments(small_spec, small_params, batch):
    """forward_math (oracle composition) == the custom_vjp'd public entry."""
    x, d, t = batch
    eff = prepare_effective(small_spec, small_params)
    consts = selectors(small_spec)
    mono = forward_math(small_spec, eff, consts, pad_lanes(x, t),
                        pad_lanes(d))
    got = megakernel_point_eval(small_spec, small_params, x, d, t)
    np.testing.assert_allclose(np.asarray(mono["sdf"][:, 0]),
                               np.asarray(got["sdf"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mono["color"][:, :3]),
                               np.asarray(got["color"]), rtol=1e-6)
