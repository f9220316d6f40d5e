"""Oracle tests for the D-NeRF fused fwd+bwd training megakernel
(kernels/fused_train_dnerf.py).

Forward outputs and parameter gradients of the custom_vjp segment
composition must match autodiff of the plain jnp field chain
(models/endonerf.py::field_eval internals) at f32/"highest" precision —
on the jnp oracle path AND on the Pallas path (interpret mode on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.kernels import fused_train as ft
from endosurf_tpu.kernels import fused_train_dnerf as ftd
from endosurf_tpu.models.endonerf import (
    DNeRFSpec,
    _color,
    _density_feat,
    _warp,
    field_eval,
    init_dnerf_params,
)
from endosurf_tpu.ops.mlp import set_matmul_precision


@pytest.fixture(scope="module")
def small_spec():
    return DNeRFSpec(
        deform_layers=(3, 64, (1,)),
        density_layers=(3, 64, (1,)),
        color_layers=(2, 64, ()),
        geo_feat_dim=32,
    )


@pytest.fixture(scope="module")
def small_params(small_spec):
    return init_dnerf_params(jax.random.PRNGKey(0), small_spec)


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


@pytest.fixture(autouse=True)
def _strict_precision():
    set_matmul_precision("highest")
    ft.set_compute_mode(jnp.float32, "highest")
    yield
    set_matmul_precision("highest")
    ft.set_compute_mode(jnp.float32, "highest")


def _ref_raw(spec, params, x, d, t):
    """The plain jnp field chain's raw outputs (megakernel contract)."""
    x_c = _warp(spec, params, x, t)
    h = _density_feat(spec, params, x_c)
    return _color(spec, params, d, h[..., 1:]), h[..., 0]


def _assert_raw_close(ref, got, rtol=2e-5, atol=2e-6):
    for name, rv, gv in zip(("rgb", "raw_sigma"), ref, got):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                                   rtol=rtol, atol=atol, err_msg=name)


def test_forward_parity_small(small_spec, small_params, batch):
    x, d, t = batch
    ref = _ref_raw(small_spec, small_params, x, d, t)
    got = ftd.megakernel_field_raw(small_spec, small_params, x, d, t)
    _assert_raw_close(ref, got)


def test_forward_parity_default_spec(batch):
    spec = DNeRFSpec()
    params = init_dnerf_params(jax.random.PRNGKey(1), spec)
    x, d, t = batch
    ref = _ref_raw(spec, params, x, d, t)
    got = ftd.megakernel_field_raw(spec, params, x, d, t)
    _assert_raw_close(ref, got)


def test_forward_parity_no_deform(batch):
    spec = DNeRFSpec(use_deform=False, deform_layers=(3, 64, (1,)),
                     density_layers=(3, 64, (1,)),
                     color_layers=(2, 64, ()), geo_feat_dim=32)
    params = init_dnerf_params(jax.random.PRNGKey(2), spec)
    x, d, t = batch
    ref = _ref_raw(spec, params, x, d, t)
    got = ftd.megakernel_field_raw(spec, params, x, d, t)
    _assert_raw_close(ref, got)


def _loss(raw_fn, spec, params, x, d, t, cr, cs):
    """Scalar objective exercising both outputs incl. the post-segment
    noise/relu glue shape (relu of shifted raw sigma)."""
    rgb, raw = raw_fn(spec, params, x, d, t)
    return (jnp.sum(rgb * cr)
            + jnp.sum(jax.nn.relu(raw + 0.3) * cs))


def _oracle_raw(spec, params, x, d, t):
    """Same math as the megakernel WITHOUT custom_vjp: plain autodiff of the
    forward_math composition. Grad parity against this is EXACT — it
    isolates the hand-structured backward from f32 formulation noise."""
    eff = ftd.prepare_effective_dnerf(spec, params)
    consts = ftd.selectors_dnerf(spec)
    out = ftd.forward_math(spec, eff, consts, ft.pad_lanes(x, t),
                           ft.pad_lanes(d))
    return out["rgb"][:, :3], out["raw_sigma"][:, 0]


def test_grad_exact_vs_same_math(small_spec, small_params, batch):
    """The custom_vjp backward must reproduce plain autodiff of the SAME
    forward math bit-for-bit (it is jax.vjp of that math)."""
    x, d, t = batch
    kr, ks = jax.random.split(jax.random.PRNGKey(3))
    cr = jax.random.normal(kr, (x.shape[0], 3))
    cs = jax.random.normal(ks, (x.shape[0],))
    g_ref = jax.grad(lambda p: _loss(_oracle_raw, small_spec, p, x, d, t,
                                     cr, cs))(small_params)
    g_got = jax.grad(lambda p: _loss(ftd.megakernel_field_raw, small_spec,
                                     p, x, d, t, cr, cs))(small_params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_g = jax.tree_util.tree_leaves(g_got)
    for (path, rv), gv in zip(flat_r, flat_g):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(rv), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))


def test_grad_parity_vs_reference_chain(small_spec, small_params, batch):
    """Against the plain jnp field chain the comparison is between two
    mathematically-equal but differently-ordered f32 programs; measured
    noise floor: BOTH paths sit ~1.5e-2 (worst abs) from the f64 ground
    truth of this ill-conditioned random-init net (relu pre-activations
    down to 2.7e-4 flip gates under rounding), while differing from each
    other by <=5e-4. Tolerance reflects that floor."""
    x, d, t = batch
    kr, ks = jax.random.split(jax.random.PRNGKey(3))
    cr = jax.random.normal(kr, (x.shape[0], 3))
    cs = jax.random.normal(ks, (x.shape[0],))
    g_ref = jax.grad(lambda p: _loss(_ref_raw, small_spec, p, x, d, t,
                                     cr, cs))(small_params)
    g_got = jax.grad(lambda p: _loss(ftd.megakernel_field_raw, small_spec,
                                     p, x, d, t, cr, cs))(small_params)
    for rv, gv in zip(jax.tree_util.tree_leaves(g_ref),
                      jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                                   atol=2e-3)


def test_grad_parity_default_spec(batch):
    spec = DNeRFSpec()
    params = init_dnerf_params(jax.random.PRNGKey(4), spec)
    x, d, t = batch
    kr, ks = jax.random.split(jax.random.PRNGKey(5))
    cr = jax.random.normal(kr, (x.shape[0], 3))
    cs = jax.random.normal(ks, (x.shape[0],))
    g_ref = jax.grad(lambda p: _loss(_oracle_raw, spec, p, x, d, t,
                                     cr, cs))(params)
    g_got = jax.grad(lambda p: _loss(ftd.megakernel_field_raw, spec,
                                     p, x, d, t, cr, cs))(params)
    for rv, gv in zip(jax.tree_util.tree_leaves(g_ref),
                      jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                                   rtol=1e-6, atol=1e-7)


def test_pallas_forward_parity(small_spec, small_params, batch):
    """force_kernel=True routes through the Pallas segment kernels
    (interpret mode on CPU)."""
    x, d, t = batch
    ref = _ref_raw(small_spec, small_params, x, d, t)
    got = ftd.megakernel_field_raw(small_spec, small_params, x, d, t,
                                   force_kernel=True)
    _assert_raw_close(ref, got)


def test_pallas_grad_parity(small_spec, small_params, batch):
    x, d, t = batch
    kr, ks = jax.random.split(jax.random.PRNGKey(6))
    cr = jax.random.normal(kr, (x.shape[0], 3))
    cs = jax.random.normal(ks, (x.shape[0],))
    g_ref = jax.grad(lambda p: _loss(_oracle_raw, small_spec, p, x, d, t,
                                     cr, cs))(small_params)
    g_got = jax.grad(lambda p: _loss(
        lambda s, pp, xx, dd, tt: ftd.megakernel_field_raw(
            s, pp, xx, dd, tt, force_kernel=True),
        small_spec, p, x, d, t, cr, cs))(small_params)
    for rv, gv in zip(jax.tree_util.tree_leaves(g_ref),
                      jax.tree_util.tree_leaves(g_got)):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                                   rtol=2e-4, atol=1e-5)


def test_field_eval_dispatch_parity(small_spec, small_params, batch):
    """field_eval with the megakernel forced on matches the jnp chain,
    including the noise glue (same key)."""
    x, d, t = batch
    key = jax.random.PRNGKey(11)
    try:
        ftd.set_dnerf_megakernel_mode("off")
        ref = field_eval(small_spec, small_params, x, d, t, noise_key=key)
        ftd.set_dnerf_megakernel_mode("on")
        got = field_eval(small_spec, small_params, x, d, t, noise_key=key)
    finally:
        ftd.set_dnerf_megakernel_mode("auto")
    for name, rv, gv in zip(("rgb", "sigma"), ref, got):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                                   rtol=2e-5, atol=2e-6, err_msg=name)


def test_train_step_parity(small_spec):
    """Full EndoNeRF train step: loss with the megakernel on (Pallas
    interpret path on CPU) matches the XLA path."""
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endonerf import DNeRFRenderSpec
    from endosurf_tpu.train.trainer_endonerf import make_train_step

    scene = make_synthetic_arrays(n_frames=2, h=24, w=32)
    rspec = DNeRFRenderSpec(n_samples=8, n_importance=8)
    tx = optax.adam(1e-3)
    weights = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}
    key = jax.random.PRNGKey(9)
    losses = {}
    try:
        for mode in ("off", "on"):
            ftd.set_dnerf_megakernel_mode(mode)
            step = make_train_step(small_spec, rspec, tx, scene.h, scene.w,
                                   64, weights)
            # Fresh params per mode: the jitted step DONATES its params/
            # opt-state buffers (donate_argnums), so they cannot be reused.
            params = init_dnerf_params(jax.random.PRNGKey(0), small_spec)
            p2, _, metrics = step(params, tx.init(params),
                                  scene.device_arrays, key,
                                  jnp.asarray(1.0))
            losses[mode] = float(np.asarray(metrics["loss_total"]))
            del p2
    finally:
        ftd.set_dnerf_megakernel_mode("auto")
    assert np.isfinite(losses["off"]) and np.isfinite(losses["on"])
    np.testing.assert_allclose(losses["on"], losses["off"],
                               rtol=1e-4, atol=1e-6)


def test_mode_gate():
    try:
        ftd.set_dnerf_megakernel_mode("off")
        assert not ftd.dnerf_megakernel_serves(1 << 20)
        ftd.set_dnerf_megakernel_mode("on")
        assert ftd.dnerf_megakernel_serves(8)
        ftd.set_dnerf_megakernel_mode("auto")
        # CPU backend: the auto gate must bounce.
        assert not ftd.dnerf_megakernel_serves(1 << 20)
    finally:
        ftd.set_dnerf_megakernel_mode("auto")


def test_megakernel_under_mesh(small_spec, small_params, batch):
    """Forced megakernel under the 8-device virtual mesh dispatches the
    Pallas segments per shard via shard_map (pallas_call has no GSPMD
    rule) and matches the XLA chain."""
    from endosurf_tpu.models.endonerf import _field_raw
    from endosurf_tpu.parallel import mesh as pm

    x, d, t = batch
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    n = 40  # divisible by 8; padded per-shard inside the kernel runner
    x, d, t = x[:n], d[:n], t[:n]
    mesh = pm.make_mesh(8)
    try:
        ftd.set_dnerf_megakernel_mode("off")
        ref = _field_raw(small_spec, small_params, x, d, t)
        ftd.set_dnerf_megakernel_mode("on")
        with mesh:
            assert ftd.dnerf_megakernel_mesh(n) is not None
            got = jax.jit(lambda p: _field_raw(small_spec, p, x, d, t))(
                small_params)
    finally:
        ftd.set_dnerf_megakernel_mode("auto")
        pm.set_mesh_active(False)
    _assert_raw_close(ref, got, rtol=2e-4, atol=1e-5)
