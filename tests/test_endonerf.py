"""EndoNeRF (D-NeRF baseline) model + trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene
from endosurf_tpu.models.endonerf import (
    DNeRFRenderSpec,
    DNeRFSpec,
    density_grad_observed,
    density_observed,
    field_eval,
    init_dnerf_params,
    raw2outputs,
    render_rays,
)
from endosurf_tpu.train.trainer_endonerf import EndoNeRFTrainer


@pytest.fixture(scope="module")
def tiny():
    spec = DNeRFSpec(
        pos_density_freqs=2, dir_color_freqs=2, time_deform_freqs=2,
        pos_deform_freqs=2, deform_layers=(2, 32, ()),
        density_layers=(2, 32, ()), color_layers=(2, 32, ()),
        geo_feat_dim=16, raw_noise_std=1.0)
    params = init_dnerf_params(jax.random.PRNGKey(0), spec)
    return spec, params


def test_param_shapes(tiny):
    spec, params = tiny
    assert set(params) == {"deform", "density", "color"}
    # Plain (non-weight-norm) layers.
    assert "w" in params["density"]["layers"][0]
    assert params["density"]["layers"][-1]["w"].shape[-1] == 1 + 16


def test_field_eval(tiny):
    spec, params = tiny
    n = 12
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (n, 3), minval=-0.5, maxval=0.5)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    t = jnp.full((n, 1), 0.5)
    rgb, sigma = field_eval(spec, params, x, d, t)
    assert rgb.shape == (n, 3) and sigma.shape == (n,)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1
    assert float(sigma.min()) >= 0  # relu density
    # Noise changes sigma during training.
    _, sigma_noisy = field_eval(spec, params, x, d, t,
                                noise_key=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(sigma), np.asarray(sigma_noisy))


def test_density_grad_matches_fd(tiny):
    spec, params = tiny
    x = jnp.array([[0.1, -0.2, 0.3]])
    t = jnp.array([[0.4]])
    g = np.asarray(density_grad_observed(spec, params, x, t))[0]
    eps = 1e-3
    num = np.zeros(3)
    for i in range(3):
        dx = jnp.zeros((1, 3)).at[0, i].set(eps)
        diff = (density_observed(spec, params, x + dx, t)
                - density_observed(spec, params, x - dx, t))
        num[i] = float(diff[0, 0]) / (2 * eps)
    np.testing.assert_allclose(g, num, rtol=1e-2, atol=1e-4)


def test_raw2outputs_opaque_wall():
    # A single fully opaque sample -> color equals that sample, depth ~ z.
    z = jnp.array([[1.0, 1.5, 2.0, 2.5]])
    sigma = jnp.array([[0.0, 1e8, 0.0, 0.0]])
    rgb = jnp.zeros((1, 4, 3)).at[0, 1].set(jnp.array([0.2, 0.5, 0.9]))
    d = jnp.array([[0.0, 0.0, 1.0]])
    rgb_map, depth_map, weights = raw2outputs(rgb, sigma, z, d)
    np.testing.assert_allclose(np.asarray(rgb_map)[0], [0.2, 0.5, 0.9],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth_map)[0, 0], 1.5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(weights)[0, 1], 1.0, atol=1e-4)


def test_render_rays_depth_sampling(tiny):
    spec, params = tiny
    rspec = DNeRFRenderSpec(n_samples=8, n_importance=8,
                            use_depth_sampling=True, depth_sampling_sigma=0.3)
    n = 4
    rays = np.concatenate([
        np.tile([0, 0, -2.0], (n, 1)),
        np.tile([0, 0, 1.0], (n, 1)),
        np.full((n, 1), 1.8),   # slot 6: gt depth mean
        np.full((n, 1), 0.3),   # slot 7: sigma
        np.full((n, 1), 0.5),
    ], -1).astype(np.float32)
    out = render_rays(spec, rspec, params, jnp.asarray(rays),
                      key=jax.random.PRNGKey(0))
    assert out["color_map"].shape == (n, 3)
    assert out["depth_map"].shape == (n, 1)
    assert out["weights"].shape == (n, 16)
    assert np.all(np.isfinite(np.asarray(out["color_map"])))
    # Eval path with normals.
    out_e = render_rays(spec, rspec, params, jnp.asarray(rays), key=None,
                        want_normals=True)
    assert out_e["normal_map"].shape == (n, 3)


def test_render_rays_uniform_sampling(tiny):
    """Non-depth-guided branch: stratified near/far sampling (the intended
    behavior of the reference's broken uniform path, endonerf.py:70-79)."""
    spec, params = tiny
    rspec = DNeRFRenderSpec(n_samples=8, n_importance=0,
                            use_depth_sampling=False, perturb=True)
    n = 4
    rays = np.concatenate([
        np.tile([0, 0, -2.0], (n, 1)), np.tile([0, 0, 1.0], (n, 1)),
        np.full((n, 1), 1.0),   # near
        np.full((n, 1), 3.0),   # far
        np.full((n, 1), 0.5),
    ], -1).astype(np.float32)
    out = render_rays(spec, rspec, params, jnp.asarray(rays),
                      key=jax.random.PRNGKey(0))
    assert out["weights"].shape == (n, 8)
    assert np.all(np.isfinite(np.asarray(out["color_map"])))
    # Deterministic eval differs from perturbed train sampling.
    out_det = render_rays(spec, rspec, params, jnp.asarray(rays), key=None)
    assert not np.allclose(np.asarray(out["depth_map"]),
                           np.asarray(out_det["depth_map"]))


def test_no_deform_variant(tiny):
    import dataclasses
    spec, params = tiny
    spec_nd = dataclasses.replace(spec, use_deform=False)
    x = jnp.array([[0.1, 0.2, 0.3]])
    t = jnp.array([[0.5]])
    d1 = density_observed(spec_nd, params, x, t)
    d2 = density_observed(spec_nd, params, x, t + 0.4)
    # Without deformation the density is time-independent.
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def tiny_nerf_cfg(exp_dir, n_iter=4):
    return {
        "exp": {"project_name": "test", "exp_name": "nerf_smoke",
                "exp_dir": exp_dir, "seed": 0},
        "render": {"type": "endonerf", "n_samples": 8, "n_importance": 8,
                   "perturb": True, "use_depth_sampling": True,
                   "depth_sampling_sigma": 1.0},
        "train": {"n_iter": n_iter, "ray_batch": 32,
                  "mask_guided_ray_sampling": True,
                  "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                  "resume": False,
                  "optim": {"lr": 5e-4, "lr_decay": 250},
                  "eval": {"ray_batch": 256}},
        "net": {"net_type": "dnerf", "use_deform": True, "raw_noise_std": 1.0,
                "enc_pos_density_cfg": {"multires": 2},
                "enc_dir_color_cfg": {"multires": 2},
                "enc_time_deform_cfg": {"multires": 2},
                "enc_pos_deform_cfg": {"multires": 2},
                "net_deform_cfg": {"n_layers": 2, "hidden_dim": 32,
                                   "skips": []},
                "net_density_cfg": {"n_layers": 2, "hidden_dim": 32,
                                    "skips": []},
                "net_color_cfg": {"n_layers": 2, "hidden_dim": 32,
                                  "skips": []},
                "geo_feat_dim": 16},
        "log": {"i_eval": 0, "i_save": 0},
    }


def test_endonerf_trainer_smoke(tmp_path, tmp_path_factory):
    d = tmp_path_factory.mktemp("nerfscene")
    pkl = make_synthetic_scene(str(d), n_frames=4, h=20, w=24)
    scene = SceneData.load(pkl)
    cfg = tiny_nerf_cfg(str(tmp_path))
    trainer = EndoNeRFTrainer(cfg, mode="train", scene=scene)
    m1 = trainer.train_step(1)
    m2 = trainer.train_step(2)
    assert np.isfinite(m1["loss_total"]) and np.isfinite(m2["loss_total"])
    assert "psnr_color" in m1
    # Eval path end-to-end (all test frames, like the reference).
    stats = trainer.eval(2)
    assert "psnr_rgb_vr" in stats and np.isfinite(stats["psnr_rgb_vr"])


def test_endonerf_steps_per_call_matches_sequential(tmp_path_factory):
    """The EndoNeRF K-step scan window must equal K sequential K=1 calls
    bit-for-bit given the same key-derivation chain (mirror of the
    EndoSurf test in test_train_smoke.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              init_dnerf_params)
    from endosurf_tpu.train.schedules import exponential
    from endosurf_tpu.train.trainer_endonerf import make_train_step

    d = tmp_path_factory.mktemp("nerfscene_spc")
    pkl = make_synthetic_scene(str(d), n_frames=3, h=16, w=16)
    scene = SceneData.load(pkl)
    cfg = tiny_nerf_cfg(str(d))
    spec = DNeRFSpec.from_config(cfg["net"])
    rspec = DNeRFRenderSpec.from_config(cfg["render"])
    tx = optax.adam(exponential(5e-4, 250))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}
    arrays = scene.device_arrays
    args = (spec, rspec, tx, scene.h, scene.w, 16, lw)
    K = 3

    def init():
        p = init_dnerf_params(jax.random.PRNGKey(0), spec)
        return p, tx.init(p)

    fn1 = make_train_step(*args)
    p1, o1 = init()
    key = jax.random.PRNGKey(7)
    for i in range(K):
        key, k = jax.random.split(key)
        p1, o1, m1 = fn1(p1, o1, arrays, k, jnp.asarray(float(1 + i)))

    # Both window paths (presampled batch gathers and in-scan sampling)
    # must reproduce the K sequential K=1 steps.
    for pre in (True, False):
        fnK = make_train_step(*args, steps_per_call=K, presample=pre)
        pK, oK = init()
        pK, oK, mK = fnK(pK, oK, arrays, jax.random.PRNGKey(7),
                         jnp.asarray(1.0))

        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(pK)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(float(np.asarray(m1["loss_total"])),
                                   float(np.asarray(mK["loss_total"])),
                                   rtol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
