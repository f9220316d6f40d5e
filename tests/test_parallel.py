"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from endosurf_tpu.parallel.mesh import make_mesh, ray_sharding, \
    replicated_sharding

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_dryrun_multichip_entrypoint():
    """The driver-facing dry run must compile + execute the sharded step."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_when_devices_insufficient():
    """Driver regression (round 1): dryrun_multichip is invoked in a process
    whose backend has too few devices (ambient shell = one tunneled TPU chip)
    and must self-provision a virtual CPU mesh via a clean subprocess instead
    of asserting. Simulated here with a 1-device CPU parent."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (f"import sys; sys.path.insert(0, {repo!r}); import jax; "
            "jax.config.update('jax_platforms', 'cpu'); "
            "assert len(jax.devices()) == 1; "
            "import __graft_entry__; __graft_entry__.dryrun_multichip(4)")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(4): OK" in proc.stdout


def test_sharded_matches_single_device():
    """One sharded train step must match the replicated step numerically.

    Data parallelism here is a layout annotation, not an algorithm change —
    the same global batch flows through the same math, so losses must agree
    to float tolerance.
    """
    from __graft_entry__ import _synthetic_arrays
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec, MLPSpec,
                                            init_endosurf_params)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    scene = _synthetic_arrays()
    spec = EndoSurfSpec(
        deform_pos_freqs=2, deform_time_freqs=2, sdf_pos_freqs=2,
        color_pos_freqs=2, color_dir_freqs=2,
        deform=MLPSpec(2, 32, (), 3), sdf=MLPSpec(2, 32, (), 17),
        color=MLPSpec(2, 32, (), 3), color_feat_dim=16)
    rspec = RenderSpec(n_samples=4, n_importance=4, up_sample_steps=2,
                       anneal_end=10.0)
    tx = optax.adam(warmup_cosine(5e-4, 5, 100, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}

    mesh = make_mesh(8)
    args = (spec, rspec, tx, scene.h, scene.w, 16, lw)

    def run(step_fn, put=None):
        params = init_endosurf_params(jax.random.PRNGKey(0), spec)
        opt_state = tx.init(params)
        arrays = scene.device_arrays
        if put is not None:
            params = jax.device_put(params, put)
            opt_state = jax.device_put(opt_state, put)
            arrays = jax.device_put(arrays, put)
        p, o, m = step_fn(params, opt_state, arrays, jax.random.PRNGKey(7),
                          jnp.asarray(1.0))
        return (float(np.asarray(m["loss_total"])),
                np.asarray(p["sdf_network"]["layers"][0]["v"]))

    loss_rep, p_rep = run(
        make_train_step(*args, surf_neig_rad=0.1, mesh=None))
    loss_sh, p_sh = run(
        make_train_step(*args, surf_neig_rad=0.1, mesh=mesh),
        put=replicated_sharding(mesh))

    np.testing.assert_allclose(loss_sh, loss_rep, rtol=1e-4)
    np.testing.assert_allclose(p_sh, p_rep, rtol=1e-4, atol=1e-6)


def test_endonerf_sharded_matches_single_device():
    from __graft_entry__ import _synthetic_arrays
    from endosurf_tpu.models.endonerf import DNeRFRenderSpec, DNeRFSpec, \
        init_dnerf_params
    from endosurf_tpu.train.schedules import exponential
    from endosurf_tpu.train.trainer_endonerf import make_train_step

    scene = _synthetic_arrays()
    spec = DNeRFSpec(pos_density_freqs=2, dir_color_freqs=2,
                     time_deform_freqs=2, pos_deform_freqs=2,
                     deform_layers=(2, 32, ()), density_layers=(2, 32, ()),
                     color_layers=(2, 32, ()), geo_feat_dim=16)
    rspec = DNeRFRenderSpec(n_samples=4, n_importance=4)
    tx = optax.adam(exponential(5e-4, 250))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}
    mesh = make_mesh(8)

    def run(step_fn, put=None):
        params = init_dnerf_params(jax.random.PRNGKey(0), spec)
        opt_state = tx.init(params)
        arrays = scene.device_arrays
        if put is not None:
            params, opt_state, arrays = jax.device_put(
                (params, opt_state, arrays), put)
        _, _, m = step_fn(params, opt_state, arrays, jax.random.PRNGKey(3),
                          jnp.asarray(1.0))
        return float(np.asarray(m["loss_total"]))

    loss_rep = run(make_train_step(spec, rspec, tx, scene.h, scene.w, 16, lw))
    loss_sh = run(make_train_step(spec, rspec, tx, scene.h, scene.w, 16, lw,
                                  mesh=mesh), put=replicated_sharding(mesh))
    np.testing.assert_allclose(loss_sh, loss_rep, rtol=1e-4)


def test_ray_batch_actually_sharded():
    """Sharding constraint yields a batch laid out across all 8 devices."""
    from endosurf_tpu.parallel.mesh import shard_ray_batch
    mesh = make_mesh(8)
    batch = {"rays": jnp.zeros((64, 9)), "frame_id": jnp.asarray(3)}

    @jax.jit
    def f(b):
        b = shard_ray_batch(b, mesh)
        return jax.tree_util.tree_map(lambda x: x + 0.0, b)

    out = f(batch)
    sh = out["rays"].sharding
    assert sh.is_equivalent_to(ray_sharding(mesh), 2)
    assert len(out["rays"].addressable_shards) == 8
    assert out["rays"].addressable_shards[0].data.shape == (8, 9)


def test_eval_render_sharded_matches_replicated(tmp_path):
    """The eval/demo render closures must produce identical pixels with and
    without the mesh: constrain_axis0 is layout-only. Also checks the odd-
    size no-op path (axis not divisible by the mesh)."""
    from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene
    from endosurf_tpu.parallel.mesh import constrain_axis0
    from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer
    from tests.test_train_smoke import tiny_cfg

    pkl = make_synthetic_scene(str(tmp_path / "scene"), n_frames=3, h=16,
                               w=16)
    scene = SceneData.load(pkl)
    rays = np.array(jax.random.normal(jax.random.PRNGKey(0), (32, 9)))
    rays[:, 3:6] /= np.linalg.norm(rays[:, 3:6], axis=1, keepdims=True)
    rays[:, 8] = 0.5

    pts = np.array(jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                                      minval=-0.5, maxval=0.5))
    outs, fields = {}, {}
    for dp in (False, True):
        cfg = tiny_cfg(str(tmp_path / f"dp{dp}"), n_iter=2)
        cfg["parallel"] = {"data_parallel": dp}
        tr = EndoSurfTrainer(cfg, mode="train", scene=scene)
        out = tr.render_fn()(tr.params, jnp.asarray(rays), jnp.asarray(1.0))
        outs[dp] = np.asarray(out["color_map"])
        field = jax.jit(tr.demo_field_fn())(
            jnp.asarray(pts), jnp.full((64, 1), 0.5))
        fields[dp] = np.asarray(field)
        if dp:
            assert len(out["color_map"].sharding.device_set) == 8
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(fields[True], fields[False], rtol=2e-5,
                               atol=2e-6)

    # Odd leading axis: constraint is a no-op, not an error.
    odd = jnp.zeros((15, 3))
    assert constrain_axis0(odd, make_mesh(8)) is odd


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_mesh_disables_pallas_kernels():
    """pallas_call has no GSPMD rule; a >1-device mesh must gate the
    kernel dispatches to the XLA path (which shards correctly)."""
    from endosurf_tpu.kernels.fused_sdf import fused_sdf_available
    from endosurf_tpu.kernels.fused_train import _use_kernel
    from endosurf_tpu.parallel import mesh as pm

    pm.set_mesh_active(False)
    try:
        baseline_sdf = fused_sdf_available(1 << 20)
        baseline_mk = _use_kernel(1 << 20)   # False on CPU, True on TPU
        m = pm.make_mesh(2)
        assert m.size == 2
        assert pm.mesh_active()
        assert not fused_sdf_available(1 << 20)
        assert not _use_kernel(1 << 20)
        del baseline_sdf, baseline_mk
    finally:
        pm.set_mesh_active(False)
