"""Demo-mode smoke test: meshes, PLYs, geometric error, videos, PLY IO."""

import glob
import os.path as osp

import numpy as np
import pytest

from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene
from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer
from endosurf_tpu.utils.ply import read_ply, write_ply
from tests.test_train_smoke import tiny_cfg


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    tris = rng.integers(0, 10, size=(5, 3)).astype(np.int32)
    colors = rng.uniform(0, 1, size=(10, 3)).astype(np.float32)

    p1 = str(tmp_path / "mesh.ply")
    write_ply(p1, verts, tris, colors)
    v, t, c = read_ply(p1)
    np.testing.assert_allclose(v, verts, rtol=1e-6)
    np.testing.assert_array_equal(t, tris)
    np.testing.assert_allclose(c / 255.0, colors, atol=1 / 255.0)

    p2 = str(tmp_path / "pcd.ply")
    write_ply(p2, verts)
    v2, t2, c2 = read_ply(p2)
    np.testing.assert_allclose(v2, verts)
    assert t2 is None and c2 is None


def test_demo_end_to_end(tmp_path, tmp_path_factory):
    d = tmp_path_factory.mktemp("demo_scene")
    pkl = make_synthetic_scene(str(d), n_frames=4, h=20, w=24)
    scene = SceneData.load(pkl)
    cfg = tiny_cfg(str(tmp_path), n_iter=2)
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    trainer.train_step(1)

    stats = trainer.demo(1, test_mode=True, visualize=True,
                         demo_2d=True, demo_3d=True)
    assert "psnr_rgb_vr" in stats
    assert "geo_err_mean" in stats and np.isfinite(stats["geo_err_mean"])

    base = osp.join(trainer.exp_dir, "demo", "iter_00000001")
    assert glob.glob(osp.join(base, "test_2d", "*_all.png"))
    assert osp.exists(osp.join(base, "test_2d", "demo.mp4"))
    assert osp.exists(osp.join(base, "test_2d", "stats_out.txt"))
    d3 = glob.glob(osp.join(base, "test_3d_*"))
    assert d3
    plys = glob.glob(osp.join(d3[0], "*_geometry.ply"))
    assert plys
    v, t, _ = read_ply(plys[0])
    assert len(v) > 0 and len(t) > 0
    # Mesh screenshots rendered by the native rasterizer.
    assert glob.glob(osp.join(d3[0], "*_color.png"))
    assert osp.exists(osp.join(base, "test_final", "demo.mp4"))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])


def test_virtual_camera_loader(tmp_path):
    """Open3D PinholeCameraParameters JSON (column-major) parses correctly."""
    import json

    from endosurf_tpu.evaluation.demo import load_virtual_camera

    K = np.array([[440.0, 0, 255.5], [0, 441.0, 254.5], [0, 0, 1.0]])
    w2c = np.eye(4)
    w2c[:3, 3] = [0.1, 0.2, 1.3]
    data = {
        "class_name": "PinholeCameraParameters",
        "extrinsic": list(w2c.T.reshape(-1)),
        "intrinsic": {"width": 512, "height": 480,
                      "intrinsic_matrix": list(K.T.reshape(-1))},
        "version_major": 1, "version_minor": 0,
    }
    p = str(tmp_path / "vcam.json")
    with open(p, "w") as f:
        json.dump(data, f)
    K2, w2c2, w, h = load_virtual_camera(p)
    np.testing.assert_allclose(K2, K)
    np.testing.assert_allclose(w2c2, w2c)
    assert (w, h) == (512, 480)


def test_demo_with_virtual_camera(tmp_path, tmp_path_factory):
    """demo.virtual_camera="mean" shoots every mesh from one fixed camera."""
    d = tmp_path_factory.mktemp("demo_vcam_scene")
    pkl = make_synthetic_scene(str(d), n_frames=4, h=20, w=24, orbit_deg=25.0)
    scene = SceneData.load(pkl)
    cfg = tiny_cfg(str(tmp_path), n_iter=2)
    cfg["demo"]["virtual_camera"] = "mean"
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    trainer.train_step(1)
    stats = trainer.demo(1, test_mode=True, visualize=True,
                         demo_2d=True, demo_3d=True)
    assert np.isfinite(stats["geo_err_mean"])
    base = osp.join(trainer.exp_dir, "demo", "iter_00000001")
    assert osp.exists(osp.join(base, "test_final", "demo.mp4"))


def test_bundled_virtual_cameras():
    """The shipped configs/vis_cfg JSONs parse and carry sane geometry
    (reference analog: src/dataset/vis_cfg/virtual_cam_*.json)."""
    import glob

    from endosurf_tpu.evaluation.demo import load_virtual_camera

    paths = sorted(glob.glob("configs/vis_cfg/virtual_cam_*.json"))
    assert len(paths) >= 3  # endonerf, scared2019, synthetic
    for p in paths:
        K, w2c, w, h = load_virtual_camera(p)
        assert w > 0 and h > 0
        assert K[0, 0] > 0 and K[1, 1] > 0
        # rotation block orthonormal, camera outside the unit sphere
        R = w2c[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        c = -R.T @ w2c[:3, 3]
        assert 0.5 < np.linalg.norm(c) < 5.0


def test_make_virtual_camera_tool(tmp_path, tmp_path_factory):
    """tools/make_virtual_camera.py output round-trips through the demo
    loader and frames the synthetic scene."""
    from endosurf_tpu.evaluation.demo import load_virtual_camera
    from tools.make_virtual_camera import camera_from_scene, \
        write_virtual_camera

    d = tmp_path_factory.mktemp("vcam_scene")
    pkl = make_synthetic_scene(str(d), n_frames=4, h=20, w=24, orbit_deg=25.0)
    scene = SceneData.load(pkl)
    K, w2c, w, h = camera_from_scene(scene, pullback=0.25, tilt_deg=10.0)
    p = str(tmp_path / "cam.json")
    write_virtual_camera(p, K, w2c, w, h)
    K2, w2c2, w2, h2 = load_virtual_camera(p)
    np.testing.assert_allclose(K2, K, rtol=1e-12)
    np.testing.assert_allclose(w2c2, w2c, rtol=1e-9, atol=1e-12)
    assert (w2, h2) == (w, h)
    # the scene center (origin) must project inside the image
    c = w2c[:3, :3] @ np.zeros(3) + w2c[:3, 3]
    assert c[2] > 0
    u = c[0] / c[2] * K[0, 0] + K[0, 2]
    v = c[1] / c[2] * K[1, 1] + K[1, 2]
    assert 0 <= u < w and 0 <= v < h


def test_render_full_frames_chunks_per_call(tmp_path, tmp_path_factory):
    """Folding chunks into one dispatch (lax.map) is bit-identical to the
    per-chunk loop, including the non-grouped remainder chunks."""
    from endosurf_tpu.evaluation.render_eval import render_full_frames

    d = tmp_path_factory.mktemp("cpc_scene")
    pkl = make_synthetic_scene(str(d), n_frames=2, h=20, w=24)
    scene = SceneData.load(pkl)
    cfg = tiny_cfg(str(tmp_path), n_iter=2)
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)

    arrays = scene.device_arrays
    kw = dict(ray_chunk=64, ray_transform=None)
    # 480 rays -> 8 padded chunks: cpc=3 exercises grouped (6 chunks in 2
    # mapped calls) + remainder (2 single-chunk calls); cpc=4 is exact.
    ref = render_full_frames(trainer.render_fn(), trainer.params, arrays,
                             scene.h, scene.w, [0, 1], 1,
                             chunks_per_call=1, **kw)
    for cpc in (3, 4):
        got = render_full_frames(trainer.render_fn(), trainer.params,
                                 arrays, scene.h, scene.w, [0, 1], 1,
                                 chunks_per_call=cpc, **kw)
        assert set(got) == set(ref)
        for k in ref:
            # Not bit-equal: XLA fuses the lax.map body differently from
            # the standalone chunk program (CPU oneDNN reductions).
            np.testing.assert_allclose(got[k], ref[k], rtol=2e-5,
                                       atol=2e-6, err_msg=k)
