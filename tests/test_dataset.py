"""Tests for scene loading, synthetic scene generation, and batch sampling."""

import jax
import numpy as np
import pytest

from endosurf_tpu.data.scene_data import (
    SceneData,
    decompose_projection,
    frame_rays,
    make_synthetic_scene,
    sample_train_batch,
)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    pkl = make_synthetic_scene(str(d), n_frames=8, h=24, w=32)
    return SceneData.load(pkl)


def test_decompose_projection_roundtrip():
    K = np.array([[120.0, 0, 40], [0, 110.0, 30], [0, 0, 1]])
    # Rotation around y + translation.
    th = 0.3
    R = np.array([[np.cos(th), 0, np.sin(th)],
                  [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    c2w = np.eye(4)
    c2w[:3, :3] = R
    c2w[:3, 3] = [0.5, -0.2, 1.0]
    w2c = np.linalg.inv(c2w)
    P = K @ w2c[:3, :4]
    K_out, pose_out = decompose_projection(P)
    np.testing.assert_allclose(K_out[:3, :3], K, atol=1e-4)
    np.testing.assert_allclose(pose_out, c2w, atol=1e-4)


def test_scene_shapes(scene):
    assert scene.n_frames == 8
    assert (scene.h, scene.w) == (24, 32)
    a = scene.device_arrays
    assert a["colors"].shape == (8, 24, 32, 3)
    assert a["depths"].shape == (8, 24, 32, 1)
    assert a["masks"].shape == (8, 24, 32, 1)
    assert a["sample_w"].shape == (8, 24 * 32)
    assert a["poses"].shape == (8, 4, 4)
    assert len(scene.list_train) + len(scene.list_test) == 8
    # Depth normalization puts the scene in unit-ish range.
    d = np.asarray(a["depths"])
    assert 1.0 < d.mean() < 3.5
    assert scene.depth_scale == 100.0


def test_camera_decomposition_matches_generator(scene):
    # Synthetic camera sits at (0,0,-2) with identity rotation.
    np.testing.assert_allclose(scene.poses[0][:3, 3], [0, 0, -2], atol=1e-4)
    np.testing.assert_allclose(scene.poses[0][:3, :3], np.eye(3), atol=1e-4)


def test_masks_exclude_tool_and_background(scene):
    a = scene.device_arrays
    masks = np.asarray(a["masks"])
    color_masks = np.asarray(a["color_masks"])
    # The synthetic tool rectangle zeroes part of every frame's color mask.
    assert color_masks.min() == 0.0 and color_masks.max() == 1.0
    # Combined masks are sparser than color masks (depth band cut).
    assert masks.sum() < color_masks.sum()


def test_sample_train_batch(scene):
    a = scene.device_arrays
    batch = sample_train_batch(a, scene.h, scene.w, jax.random.PRNGKey(0),
                               ray_batch=256)
    assert batch["rays"].shape == (256, 9)
    assert batch["color"].shape == (256, 3)
    assert batch["depth"].shape == (256, 1)
    assert batch["mask"].shape == (256, 1)
    # Sampled frame must come from the train split.
    assert int(batch["frame_id"]) in set(scene.list_train.tolist())
    # Directions are unit; time in [0, 1].
    d = np.asarray(batch["rays"][:, 3:6])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    t = np.asarray(batch["rays"][:, 8])
    assert t.min() >= 0 and t.max() <= 1
    # Mask-guided sampling never picks pixels outside the color mask.
    cm = np.asarray(batch["color_mask"])
    assert cm.min() == 1.0


def test_sample_batch_jits(scene):
    a = scene.device_arrays
    import functools
    fn = jax.jit(functools.partial(sample_train_batch, h=scene.h, w=scene.w,
                                   ray_batch=64))
    b1 = fn(a, key=jax.random.PRNGKey(1))
    b2 = fn(a, key=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(b1["rays"]), np.asarray(b2["rays"]))


def test_frame_rays_consistency(scene):
    """Per-pixel rays reproduce GT depth geometry: o + d/d_z * depth lands on
    the synthetic sphere surface."""
    a = scene.device_arrays
    fid = 0
    rays = np.asarray(frame_rays(a, scene.h, scene.w, fid))
    assert rays.shape == (scene.h, scene.w, 9)
    depth = np.asarray(a["depths"][fid])[..., 0]
    mask = np.asarray(a["depth_masks"][fid])[..., 0] > 0
    o = rays[..., :3]
    d = rays[..., 3:6]
    d_z = d / (d[..., 2:3] + 1e-6)
    pts = o + d_z * depth[..., None]
    r = np.linalg.norm(pts, axis=-1)
    # Frame 0 sphere radius is 0.5 (sin(0)=0).
    np.testing.assert_allclose(r[mask], 0.5, atol=0.02)


def test_orbit_scene_geometry(tmp_path):
    """Multi-view variant: every frame's rays+depth unproject onto that
    frame's sphere, and the cameras actually move."""
    pkl = make_synthetic_scene(str(tmp_path), n_frames=6, h=24, w=32,
                               orbit_deg=30.0)
    scene = SceneData.load(pkl)
    a = scene.device_arrays
    cams = scene.poses[:, :3, 3]
    # Camera centers all at distance 2 but spread out on the orbit.
    np.testing.assert_allclose(np.linalg.norm(cams, axis=-1), 2.0, atol=1e-3)
    assert np.ptp(cams[:, 0]) > 0.5 and np.ptp(cams[:, 1]) > 0.1
    for fid in range(scene.n_frames):
        rays = np.asarray(frame_rays(a, scene.h, scene.w, fid))
        depth = np.asarray(a["depths"][fid])[..., 0]
        mask = np.asarray(a["depth_masks"][fid])[..., 0] > 0
        o, d = rays[..., :3], rays[..., 3:6]
        pts = o + d / (d[..., 2:3] + 1e-6) * depth[..., None]
        t_norm = fid / (scene.n_frames - 1)
        radius = 0.5 * (1.0 + 0.1 * np.sin(2 * np.pi * t_norm))
        np.testing.assert_allclose(np.linalg.norm(pts, axis=-1)[mask],
                                   radius, atol=0.02)


def test_importance_map_upweights_occluded(scene):
    a = scene.device_arrays
    w = np.asarray(a["sample_w"]).reshape(8, scene.h, scene.w)
    # Pixels under the moving tool in other frames get weight > plain mask
    # weight when visible.
    masks = np.asarray(a["masks"]).reshape(8, scene.h, scene.w)
    vis = (masks[0] > 0)
    occluded_somewhere = ((masks.min(0) == 0) & vis)
    never_occluded = ((masks.min(0) > 0) & vis)
    assert w[0][occluded_somewhere].mean() > w[0][never_occluded].mean()


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_alias_table_exact_distribution():
    """Alias table encodes EXACTLY the normalized weights: for category j,
    p(j) = (prob[j] + sum_{k: alias[k]==j} (1 - prob[k])) / n."""
    from endosurf_tpu.native.meshops import alias_table
    rng = np.random.default_rng(3)
    w = (rng.random((2, 733)) * (rng.random((2, 733)) > 0.4)).astype(
        np.float32)
    prob, alias = alias_table(w)
    assert prob.shape == w.shape and alias.shape == w.shape
    for f in range(w.shape[0]):
        n = w.shape[1]
        p = prob[f].astype(np.float64) / n
        np.add.at(p, alias[f], (1.0 - prob[f].astype(np.float64)) / n)
        np.testing.assert_allclose(p, w[f] / w[f].sum(), atol=1e-7)
    # Degenerate all-zero weights: uniform self-alias fallback.
    p0, a0 = alias_table(np.zeros(5, np.float32))
    assert (p0 == 1.0).all() and (a0 == np.arange(5)).all()


def test_sample_from_alias_matches_cdf_distribution():
    """Alias draws and CDF draws agree in distribution (same weights)."""
    from endosurf_tpu.native.meshops import alias_table
    from endosurf_tpu.ops.pdf import sample_from_alias, sample_from_cdf
    rng = np.random.default_rng(4)
    w = (rng.random(257) * (rng.random(257) > 0.5)).astype(np.float32)
    prob, alias = alias_table(w)
    cdf = np.cumsum(w + 1e-12); cdf = (cdf / cdf[-1]).astype(np.float32)
    import jax.numpy as jnp
    n = 200_000
    ia = np.asarray(sample_from_alias(jnp.asarray(prob), jnp.asarray(alias),
                                      n, jax.random.PRNGKey(5)))
    ic = np.asarray(sample_from_cdf(jnp.asarray(cdf), n,
                                    jax.random.PRNGKey(6)))
    ref = w / w.sum()
    fa = np.bincount(ia, minlength=257) / n
    fc = np.bincount(ic, minlength=257) / n
    # Both within the same Monte-Carlo band of the true distribution.
    tol = 4.0 * np.sqrt(ref.max() / n)  # ~4 sigma of the largest bin
    assert np.abs(fa - ref).max() < tol
    assert np.abs(fc - ref).max() < tol
    # Zero-weight categories are never drawn by the alias sampler.
    assert fa[w == 0].sum() == 0.0


def test_sample_train_batch_alias(scene):
    a = scene.device_arrays
    batch = sample_train_batch(a, scene.h, scene.w, jax.random.PRNGKey(0),
                               ray_batch=256, pixel_sampler="alias")
    assert batch["rays"].shape == (256, 9)
    # Mask-guided alias sampling also never leaves the color mask.
    assert np.asarray(batch["color_mask"]).min() == 1.0
    # And it jits.
    import functools
    fn = jax.jit(functools.partial(sample_train_batch, h=scene.h, w=scene.w,
                                   ray_batch=64, pixel_sampler="alias"))
    b1 = fn(a, key=jax.random.PRNGKey(1))
    b2 = fn(a, key=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(b1["rays"]), np.asarray(b2["rays"]))
