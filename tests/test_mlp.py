"""Tests for weight-normalized skip MLPs, including parity vs torch oracles."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from endosurf_tpu.ops.mlp import (
    init_skip_mlp,
    linear_apply,
    skip_mlp_apply,
    softplus100,
)


def test_layer_dims_nerf_skip():
    p = init_skip_mlp(jax.random.PRNGKey(0), n_layers=9, hidden_dim=256,
                      in_dim=39, out_dim=257, skips=[4], style="nerf")
    shapes = [l["v"].shape for l in p["layers"]]
    assert shapes[0] == (39, 256)
    assert shapes[4] == (256 + 39, 256)  # skip layer widens input
    assert shapes[8] == (256, 257)
    assert all(s == (256, 256) for i, s in enumerate(shapes) if i not in (0, 4, 8))


def test_layer_dims_idr_skip():
    p = init_skip_mlp(jax.random.PRNGKey(0), n_layers=9, hidden_dim=256,
                      in_dim=52, out_dim=3, skips=[4], style="idr")
    shapes = [l["v"].shape for l in p["layers"]]
    assert shapes[0] == (52, 256)
    assert shapes[3] == (256, 256 - 52)  # layer before skip shrinks output
    assert shapes[4] == (256, 256)
    assert shapes[8] == (256, 3)


def test_weight_norm_matches_torch():
    """Our (v, g, b) application must equal torch's nn.utils.weight_norm."""
    rng = np.random.default_rng(0)
    d0, d1 = 7, 5
    v = rng.normal(size=(d0, d1)).astype(np.float32)
    g = rng.uniform(0.5, 2.0, size=(d1,)).astype(np.float32)
    b = rng.normal(size=(d1,)).astype(np.float32)
    x = rng.normal(size=(11, d0)).astype(np.float32)

    ours = np.asarray(linear_apply(
        {"v": jnp.asarray(v), "g": jnp.asarray(g), "b": jnp.asarray(b)},
        jnp.asarray(x)))

    lin = nn.Linear(d0, d1)
    lin = nn.utils.weight_norm(lin)
    with torch.no_grad():
        lin.weight_v.copy_(torch.from_numpy(v.T))  # torch weight is [out, in]
        lin.weight_g.copy_(torch.from_numpy(g[:, None]))
        lin.bias.copy_(torch.from_numpy(b))
        theirs = lin(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_weight_norm_init_is_identity_transform():
    """At init, g = ||v|| so the effective weight equals the raw draw."""
    p = init_skip_mlp(jax.random.PRNGKey(3), n_layers=2, hidden_dim=8,
                      in_dim=4, out_dim=2, style="nerf")
    for layer in p["layers"]:
        v = np.asarray(layer["v"])
        g = np.asarray(layer["g"])
        np.testing.assert_allclose(g, np.linalg.norm(v, axis=0), rtol=1e-6)


def test_geometric_init_structure():
    in_dim = 39
    p = init_skip_mlp(jax.random.PRNGKey(1), n_layers=9, hidden_dim=256,
                      in_dim=in_dim, out_dim=257, skips=[4], style="nerf",
                      geometric_init=True, geometric_init_bias=0.8)
    l0 = p["layers"][0]
    # Frequency tail zeroed in layer 0.
    np.testing.assert_array_equal(np.asarray(l0["v"])[3:, :], 0.0)
    assert np.abs(np.asarray(l0["v"])[:3, :]).max() > 0
    np.testing.assert_array_equal(np.asarray(l0["b"]), 0.0)
    # Skip layer zeroes the re-injected encoding block.
    l4 = np.asarray(p["layers"][4]["v"])
    np.testing.assert_array_equal(l4[-(in_dim - 3):, :], 0.0)
    assert np.abs(l4[: -(in_dim - 3), :]).max() > 0
    # Last layer: mean ~ sqrt(pi)/sqrt(fan_in), tiny std, bias -0.8.
    l8 = p["layers"][8]
    expected_mean = math.sqrt(math.pi) / math.sqrt(256)
    assert abs(np.asarray(l8["v"]).mean() - expected_mean) < 1e-3
    assert np.asarray(l8["v"]).std() < 2e-4
    np.testing.assert_allclose(np.asarray(l8["b"]), -0.8)


def test_geometric_init_sdf_approximates_sphere():
    """SAL geometric init should yield sdf(x) ~ |x| - bias near init.

    This is the property the reference relies on for convergence
    (/root/reference/src/renderer/utils.py:38-56): with geometric init the raw
    network (before encoding influence) approximates a sphere of radius
    ``geometric_init_bias``.
    """
    from endosurf_tpu.ops.encoding import freq_encode, freq_encode_dim
    in_dim = freq_encode_dim(3, 6)
    p = init_skip_mlp(jax.random.PRNGKey(2), n_layers=9, hidden_dim=256,
                      in_dim=in_dim, out_dim=257, skips=[4], style="nerf",
                      geometric_init=True, geometric_init_bias=0.8)
    pts = np.stack(np.meshgrid(*([np.linspace(-1, 1, 5)] * 3)), -1).reshape(-1, 3)
    x = jnp.asarray(pts.astype(np.float32))
    out = skip_mlp_apply(p, freq_encode(x, 6), skips=[4],
                         activation="softplus100")
    sdf = np.asarray(out[:, 0])
    target = np.linalg.norm(pts, axis=-1) - 0.8
    # Loose tolerance: softplus vs relu and weight-norm wobble shift values,
    # but the zero level set must sit near radius 0.8.
    corr = np.corrcoef(sdf, target)[0, 1]
    assert corr > 0.9
    assert abs(sdf[np.abs(target).argmin()]) < 0.15
    # Inside the sphere (center) the SDF must be negative.
    assert sdf[np.linalg.norm(pts, axis=1).argmin()] < 0.0


def test_torch_default_init_distribution():
    p = init_skip_mlp(jax.random.PRNGKey(4), n_layers=1, hidden_dim=1,
                      in_dim=100, out_dim=400, style="nerf")
    w = np.asarray(p["layers"][0]["v"])
    bound = 1.0 / math.sqrt(100)
    assert w.min() >= -bound and w.max() <= bound
    # Uniform on [-b, b] has std b/sqrt(3).
    assert abs(w.std() - bound / math.sqrt(3)) < 0.02 * bound


def test_softplus100_matches_torch():
    x = np.linspace(-0.2, 0.2, 101).astype(np.float32)
    ours = np.asarray(softplus100(jnp.asarray(x)))
    theirs = torch.nn.Softplus(beta=100)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_skip_forward_matches_torch_reference_semantics():
    """Full 3-layer skip MLP forward vs a hand-built torch equivalent."""
    torch.manual_seed(0)
    in_dim, hidden, out_dim, skips = 6, 10, 2, [1]
    p = init_skip_mlp(jax.random.PRNGKey(5), n_layers=3, hidden_dim=hidden,
                      in_dim=in_dim, out_dim=out_dim, skips=skips, style="nerf")
    x = np.random.default_rng(1).normal(size=(4, in_dim)).astype(np.float32)
    ours = np.asarray(skip_mlp_apply(p, jnp.asarray(x), skips=skips,
                                     activation="relu"))

    # Torch oracle with identical weights, replicating the reference forward
    # (endosurf.py:778-783): concat+/sqrt(2) before skip layers, relu between.
    ws = [np.asarray(l["v"]) * (np.asarray(l["g"]) /
                                np.linalg.norm(np.asarray(l["v"]), axis=0))
          for l in p["layers"]]
    bs = [np.asarray(l["b"]) for l in p["layers"]]
    h = torch.from_numpy(x)
    xt = torch.from_numpy(x)
    for l in range(3):
        if l in skips:
            h = torch.cat([h, xt], -1) / math.sqrt(2)
        h = h @ torch.from_numpy(ws[l]) + torch.from_numpy(bs[l])
        if l != 2:
            h = torch.relu(h)
    np.testing.assert_allclose(ours, h.numpy(), rtol=1e-5, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_activation_dtype_mode():
    """bf16 activation storage: close to f32 results, restores cleanly, and
    gradients stay finite (second-order included via a grad-of-grad probe)."""
    import jax
    import jax.numpy as jnp

    from endosurf_tpu.ops.mlp import (init_skip_mlp, set_activation_dtype,
                                      skip_mlp_apply)

    params = init_skip_mlp(jax.random.PRNGKey(0), 4, 64, 16, 3, (2,),
                           style="nerf")
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    base = np.asarray(skip_mlp_apply(params, x, skips=(2,)))
    set_activation_dtype("bfloat16")
    try:
        fast = skip_mlp_apply(params, x, skips=(2,))
        assert fast.dtype == jnp.float32  # final layer output stays f32
        np.testing.assert_allclose(base, np.asarray(fast), atol=0.05,
                                   rtol=0.05)

        def f(xx):
            return jnp.sum(skip_mlp_apply(params, xx, skips=(2,)) ** 2)
        g = jax.grad(lambda xx: jnp.sum(jax.grad(f)(xx) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()
    finally:
        set_activation_dtype(None)
    again = np.asarray(skip_mlp_apply(params, x, skips=(2,)))
    np.testing.assert_array_equal(base, again)
