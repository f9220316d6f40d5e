"""Tests for the EndoSurf field networks and the fused point evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.models.fields import (
    EndoSurfSpec,
    fused_point_eval,
    init_endosurf_params,
    inv_s,
    sdf_grad_observed,
    sdf_observed,
)


@pytest.fixture(scope="module")
def spec():
    return EndoSurfSpec()


@pytest.fixture(scope="module")
def small_spec():
    # Tiny networks keep CPU test time low while exercising all paths.
    from endosurf_tpu.models.fields import MLPSpec
    return EndoSurfSpec(
        deform=MLPSpec(3, 64, (1,), 3),
        sdf=MLPSpec(3, 64, (1,), 33),
        color=MLPSpec(2, 64, (), 3),
        color_feat_dim=32,
    )


@pytest.fixture(scope="module")
def small_params(small_spec):
    return init_endosurf_params(jax.random.PRNGKey(0), small_spec)


def test_param_tree_keys(small_params):
    assert set(small_params) == {
        "deform_network", "sdf_network", "color_network", "deviation_network"}


def test_from_config_matches_reference_yaml():
    net_cfg = {
        "bound": 1.0,
        "use_deform": True,
        "deform_network": {
            "enc_pos_cfg": {"multires": 6}, "enc_time_cfg": {"multires": 6},
            "n_layers": 9, "hidden_dim": 256, "skips": [4], "out_dim": 3},
        "sdf_network": {
            "enc_pos_cfg": {"multires": 6}, "n_layers": 9, "hidden_dim": 256,
            "skips": [4], "out_dim": 257, "geometric_init": True,
            "geometric_init_bias": 0.8},
        "color_network": {
            "enc_pos_cfg": {"multires": 10}, "enc_dir_cfg": {"multires": 4},
            "n_layers": 9, "hidden_dim": 256, "skips": [4], "feat_dim": 256,
            "out_dim": 3},
        "deviation_network": {"init_val": 0.3},
    }
    spec = EndoSurfSpec.from_config(net_cfg)
    assert spec == EndoSurfSpec()


def test_inv_s_init(small_params):
    np.testing.assert_allclose(float(inv_s(small_params)), np.exp(3.0),
                               rtol=1e-5)


def test_fused_eval_shapes_and_ranges(small_spec, small_params):
    key = jax.random.PRNGKey(1)
    n = 16
    x = jax.random.uniform(key, (n, 3), minval=-0.5, maxval=0.5)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    t = jnp.full((n, 1), 0.5)
    out = fused_point_eval(small_spec, small_params, x, d, t)
    assert out["sdf"].shape == (n,)
    assert out["color"].shape == (n, 3)
    assert out["grad_o"].shape == (n, 3)
    c = np.asarray(out["color"])
    assert c.min() >= 0.0 and c.max() <= 1.0


def test_grad_o_matches_finite_difference(small_spec, small_params):
    """Fused chain-rule gradient == numeric gradient of sdf_observed."""
    x = jnp.array([[0.1, -0.2, 0.3], [0.4, 0.1, -0.3]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    t = jnp.array([[0.3], [0.7]])
    out = fused_point_eval(small_spec, small_params, x, d, t)
    eps = 1e-3
    num = np.zeros((2, 3))
    for i in range(3):
        dx = jnp.zeros((2, 3)).at[:, i].set(eps)
        s_plus = np.asarray(sdf_observed(small_spec, small_params, x + dx, t))
        s_minus = np.asarray(sdf_observed(small_spec, small_params, x - dx, t))
        num[:, i] = ((s_plus - s_minus) / (2 * eps))[:, 0]
    np.testing.assert_allclose(np.asarray(out["grad_o"]), num,
                               rtol=1e-2, atol=1e-3)


def test_grad_o_matches_direct_vjp(small_spec, small_params):
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (8, 3), minval=-0.5, maxval=0.5)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    t = jnp.full((8, 1), 0.25)
    fused = fused_point_eval(small_spec, small_params, x, d, t)
    direct = sdf_grad_observed(small_spec, small_params, x, t)
    np.testing.assert_allclose(np.asarray(fused["grad_o"]),
                               np.asarray(direct), rtol=1e-4, atol=1e-5)


def test_no_deform_identity_jacobian(small_spec, small_params):
    import dataclasses
    spec_nd = dataclasses.replace(small_spec, use_deform=False)
    x = jnp.array([[0.1, 0.2, -0.3]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t = jnp.array([[0.5]])
    out = fused_point_eval(spec_nd, small_params, x, d, t)
    # Without deformation the observed and canonical gradients coincide.
    np.testing.assert_allclose(np.asarray(out["grad_o"]),
                               np.asarray(out["grad_c"]), rtol=1e-6)


def test_geometric_init_gives_spherical_sdf(spec):
    """Full-size nets: SAL init => sdf sign structure of a ~0.8 sphere."""
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    t = jnp.zeros((3, 1))
    x = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.95], [0.9, 0.0, 0.0]])
    # Deform net at torch-default init produces small offsets; sign structure
    # must survive.
    sdf = np.asarray(sdf_observed(spec, params, x, t))[:, 0]
    assert sdf[0] < 0  # center is inside
    assert sdf[1] > 0 and sdf[2] > 0  # near the unit shell is outside


def test_second_order_differentiable(small_spec, small_params):
    """Eikonal-style loss (through grad_o) must be differentiable in params."""
    x = jnp.array([[0.1, 0.2, 0.3]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t = jnp.array([[0.5]])

    def loss(p):
        out = fused_point_eval(small_spec, p, x, d, t)
        g = out["grad_o"]
        return ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).sum() + out["sdf"].sum()

    grads = jax.grad(loss)(small_params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_deform_jac_modes_agree(small_spec, small_params):
    """jacfwd and linearize formulations of the deform-Jacobian products
    must agree exactly — outputs AND second-order parameter gradients
    (the training step differentiates through grad_o)."""
    from endosurf_tpu.models.fields import set_deform_jac_mode

    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3),
                           minval=-0.5, maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t = jax.random.uniform(jax.random.PRNGKey(3), (16, 1))

    def loss(p):
        o = fused_point_eval(small_spec, p, x, d, t)
        return (jnp.mean((jnp.linalg.norm(o["grad_o"], axis=1) - 1.0) ** 2)
                + jnp.mean(o["color"]) + jnp.mean(o["sdf"]))

    outs, grads = {}, {}
    try:
        for mode in ("jacfwd", "linearize"):
            set_deform_jac_mode(mode)
            outs[mode] = jax.jit(
                lambda p: fused_point_eval(small_spec, p, x, d, t))(
                    small_params)
            grads[mode] = jax.jit(jax.grad(loss))(small_params)
    finally:
        set_deform_jac_mode("jacfwd")
    for k in ("sdf", "color", "grad_o", "grad_c"):
        np.testing.assert_allclose(np.asarray(outs["jacfwd"][k]),
                                   np.asarray(outs["linearize"][k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads["jacfwd"]),
                    jax.tree_util.tree_leaves(grads["linearize"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
