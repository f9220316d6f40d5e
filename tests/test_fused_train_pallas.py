"""Pallas megakernel vs jnp-oracle parity (interpret mode on CPU).

Forces megakernel_point_eval through the Pallas segment kernels
(set_force_kernel; interpret mode auto-engages on the CPU backend) and
checks forward outputs and parameter gradients against the pure-jnp path,
which tests/test_fused_train.py already pins to fields.fused_point_eval.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.kernels import fused_train as ft
from endosurf_tpu.models.fields import (
    EndoSurfSpec,
    MLPSpec,
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
    key = jax.random.PRNGKey(11)
    kx, kd, kt = jax.random.split(key, 3)
    n = 150   # non-multiple of 128: exercises padding
    x = jax.random.uniform(kx, (n, 3), minval=-0.8, maxval=0.8)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(kt, (n, 1))
    return x, d, t


@pytest.fixture
def force_kernel():
    ft.set_force_kernel(True)
    yield
    ft.set_force_kernel(False)


def _loss(spec, params, x, d, t):
    out = ft.megakernel_point_eval(spec, params, x, d, t)
    eik = jnp.mean((jnp.linalg.norm(out["grad_o"], axis=-1) - 1.0) ** 2)
    col = jnp.mean((out["color"] - 0.5) ** 2)
    return jnp.mean(jnp.abs(out["sdf"])) + eik + col


def test_pallas_forward_matches_jnp(small_spec, small_params, batch,
                                    force_kernel):
    x, d, t = batch
    got = ft.megakernel_point_eval(small_spec, small_params, x, d, t)
    ft.set_force_kernel(False)
    ref = ft.megakernel_point_eval(small_spec, small_params, x, d, t)
    for k in ("sdf", "color", "grad_o", "grad_c"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=2e-5, atol=2e-6,
            err_msg=k)


def test_pallas_grads_match_jnp(small_spec, small_params, batch,
                                force_kernel):
    x, d, t = batch
    g_got = jax.grad(lambda p: _loss(small_spec, p, x, d, t))(small_params)
    ft.set_force_kernel(False)
    g_ref = jax.grad(lambda p: _loss(small_spec, p, x, d, t))(small_params)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_got, _ = jax.tree_util.tree_flatten_with_path(g_got)
    assert len(flat_ref) == len(flat_got)
    for (path_r, a), (_, b) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path_r))


def test_pallas_grads_no_deform(batch, force_kernel):
    """Static-scene (use_deform=False) vertical through the Pallas path."""
    from endosurf_tpu.models.fields import MLPSpec
    spec = EndoSurfSpec(
        use_deform=False,
        sdf=MLPSpec(3, 64, (1,), 33),
        color=MLPSpec(2, 64, (), 3),
        color_feat_dim=32,
    )
    params = init_endosurf_params(jax.random.PRNGKey(2), spec)
    x, d, t = batch
    g_got = jax.grad(lambda p: _loss(spec, p, x, d, t))(params)
    ft.set_force_kernel(False)
    g_ref = jax.grad(lambda p: _loss(spec, p, x, d, t))(params)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_got, _ = jax.tree_util.tree_flatten_with_path(g_got)
    assert len(flat_ref) == len(flat_got)
    for (path_r, a), (_, b) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path_r))


def test_trainer_step_megakernel_parity(tmp_path_factory):
    """Full trainer step with megakernel forced through Pallas (interpret)
    matches the vmapped-autodiff path at f32/highest."""
    from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene
    from endosurf_tpu.models.fields import set_megakernel_mode
    from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer
    from tests.test_train_smoke import tiny_cfg

    d = tmp_path_factory.mktemp("scene_mk")
    pkl = make_synthetic_scene(str(d), n_frames=3, h=16, w=20)
    scene = SceneData.load(pkl)

    def run(exp_dir, megakernel):
        cfg = tiny_cfg(str(exp_dir), n_iter=4)
        cfg["train"]["matmul_precision"] = "highest"
        cfg["train"]["megakernel"] = megakernel
        trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
        m1 = trainer.train_step(1)
        m2 = trainer.train_step(2)
        return (float(m1["loss_total"]), float(m2["loss_total"]),
                np.asarray(trainer.params["sdf_network"]["layers"][0]["v"]))

    l1_off, l2_off, p_off = run(tmp_path_factory.mktemp("off"), "off")
    ft.set_force_kernel(True)
    try:
        l1_on, l2_on, p_on = run(tmp_path_factory.mktemp("on"), "on")
    finally:
        ft.set_force_kernel(False)
        set_megakernel_mode("auto")

    assert np.isfinite(l1_on) and np.isfinite(l2_on)
    np.testing.assert_allclose(l1_on, l1_off, rtol=2e-4)
    np.testing.assert_allclose(l2_on, l2_off, rtol=2e-3)
    np.testing.assert_allclose(p_on, p_off, rtol=1e-3, atol=2e-6)


def test_megakernel_under_shard_map(small_spec, small_params):
    """Megakernel under shard_map on an 8-device mesh: values + param
    grads match the vmapped path, with NO all-gathers (pallas_call has no
    GSPMD rule; shard_map partitions the batch explicitly)."""
    from endosurf_tpu.kernels import fused_train_pallas as ftp
    from endosurf_tpu.models import fields as F
    from endosurf_tpu.parallel import mesh as pm

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    mesh = pm.make_mesh(8)
    ftp.set_interpret(True)
    try:
        n = 1024
        key = jax.random.PRNGKey(1)
        x = jax.random.uniform(key, (n, 3), minval=-0.5, maxval=0.5)
        d = jnp.ones((n, 3)) / jnp.sqrt(3.0)
        t = jnp.full((n, 1), 0.5)

        def loss_sharded(p):
            out = F._megakernel_eval_sharded(small_spec, p, x, d, t, mesh)
            return (jnp.mean(out["sdf"]) + jnp.mean(out["color"])
                    + jnp.mean(jnp.square(out["grad_o"])))

        def loss_ref(p):
            out = F.fused_point_eval(small_spec, p, x, d, t)
            return (jnp.mean(out["sdf"]) + jnp.mean(out["color"])
                    + jnp.mean(jnp.square(out["grad_o"])))

        with mesh:
            v_s = float(jax.jit(loss_sharded)(small_params))
            g_s = jax.jit(jax.grad(loss_sharded))(small_params)
            hlo = jax.jit(loss_sharded).lower(
                small_params).compile().as_text()
        v_r = float(jax.jit(loss_ref)(small_params))
        g_r = jax.jit(jax.grad(loss_ref))(small_params)

        np.testing.assert_allclose(v_s, v_r, rtol=1e-5)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_flatten_with_path(g_s)[0],
                jax.tree_util.tree_flatten_with_path(g_r)[0]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6,
                err_msg=jax.tree_util.keystr(pa))
        assert hlo.count("all-gather") == 0
    finally:
        ftp.set_interpret(None)
        pm.set_mesh_active(False)


def test_megakernel_under_mesh(small_spec, small_params, batch):
    """Forced EndoSurf megakernel under the 8-device virtual mesh takes the
    shard_map dispatch (mesh consulted BEFORE the serves gate) and matches
    the vmapped autodiff path."""
    import numpy as np
    import pytest

    from endosurf_tpu.models.fields import (fused_point_eval,
                                            set_megakernel_mode)
    from endosurf_tpu.parallel import mesh as pm

    x, d, t = batch
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh (tests/conftest.py)")
    n = 32
    x, d, t = x[:n], d[:n], t[:n]
    mesh = pm.make_mesh(8)
    try:
        set_megakernel_mode("off")
        ref = fused_point_eval(small_spec, small_params, x, d, t)
        set_megakernel_mode("on")
        with mesh:
            got = jax.jit(lambda p: fused_point_eval(
                small_spec, p, x, d, t))(small_params)
    finally:
        set_megakernel_mode("auto")
        pm.set_mesh_active(False)
    for k in ("sdf", "color", "grad_o", "grad_c"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
