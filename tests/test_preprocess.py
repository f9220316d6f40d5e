"""End-to-end preprocessing tests on synthetic raw captures."""

import json
import os
import os.path as osp
import pickle

import numpy as np
import pytest

from endosurf_tpu.data.preprocess_endonerf import create_endonerf_info
from endosurf_tpu.data.preprocess_scared import create_scared_info
from endosurf_tpu.data.scene_data import SceneData


def make_raw_endonerf(root, n_frames=6, h=32, w=40):
    """Fake ENDONERF capture: LLFF poses_bounds + images/depth/masks."""
    import imageio.v2 as iio
    os.makedirs(osp.join(root, "images"))
    os.makedirs(osp.join(root, "depth"))
    os.makedirs(osp.join(root, "masks"))
    rng = np.random.default_rng(0)
    f = 0.9 * w
    poses = []
    for i in range(n_frames):
        c2w = np.eye(4)
        c2w[2, 3] = -120.0  # mm scale
        hwf = np.array([[h], [w], [f]])
        poses.append(np.hstack([c2w[:3, :4], hwf]).ravel())
        # Sphere-ish depth image in mm (radius 40 at origin).
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        r2 = ((xs - w / 2) / (w / 3)) ** 2 + ((ys - h / 2) / (h / 3)) ** 2
        depth = np.where(r2 < 1, 80.0 + 20.0 * r2, 0.0).astype(np.float32)
        color = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)  # inverted: 0 = visible
        mask[:, : w // 8] = 255            # tool strip
        iio.imwrite(osp.join(root, "images", f"{i:03d}.png"), color)
        iio.imwrite(osp.join(root, "depth", f"{i:03d}.png"),
                    depth.astype(np.uint16))
        iio.imwrite(osp.join(root, "masks", f"{i:03d}.png"), mask)
    arr = np.stack([np.concatenate([p, [60.0, 110.0]]) for p in poses])
    np.save(osp.join(root, "poses_bounds.npy"), arr)


def make_raw_scared(root, n_frames=6, h=48, w=320):
    """Fake SCARED capture: calib jsons + disparity tiffs + reprojection."""
    import imageio.v2 as iio
    for sub in ("frame_data", "left_finalpass", "disparity",
                "reprojection_data"):
        os.makedirs(osp.join(root, "data", sub))
    rng = np.random.default_rng(1)
    K = [[250.0, 0, w / 2], [0, 250.0, h / 2], [0, 0, 1]]
    fl, bl = 250.0, 4.0
    for i in range(n_frames):
        pose = np.eye(4)
        pose[0, 3] = 0.5 * i  # slight camera drift
        with open(osp.join(root, "data", "frame_data",
                           f"{i:06d}.json"), "w") as f:
            json.dump({"camera-calibration": {"KL": K},
                       "camera-pose": pose.tolist()}, f)
        with open(osp.join(root, "data", "reprojection_data",
                           f"{i:06d}.json"), "w") as f:
            Q = np.zeros((4, 4))
            Q[2, 3] = fl
            Q[3, 2] = 1.0 / bl
            json.dump({"reprojection-matrix": Q.tolist()}, f)
        # Disparity giving depth 60-150mm: disp = fl*bl/depth.
        depth = rng.uniform(60, 150, (h, w)).astype(np.float32)
        disp = fl * bl / depth
        iio.imwrite(osp.join(root, "data", "left_finalpass",
                             f"{i:06d}.png"),
                    rng.uniform(0, 255, (h, w, 3)).astype(np.uint8))
        iio.imwrite(osp.join(root, "data", "disparity", f"{i:06d}.tiff"),
                    disp)


def test_preprocess_endonerf_roundtrip(tmp_path):
    raw = str(tmp_path / "pulling_soft_tissues")
    make_raw_endonerf(raw)
    pkl = create_endonerf_info(raw, str(tmp_path / "info"), test_every=4)
    with open(pkl, "rb") as f:
        info = pickle.load(f)
    assert info["dset_name"] == "endonerf"
    assert info["depth_type"] == "depth"
    assert info["mask_type"] == "mask_invert"
    assert info["scale_mat"].shape == (4, 4)
    assert info["bbox_minmax"].shape == (info["n_frames"], 3, 2)
    assert set(info["list_train"]) | set(info["list_test"]) == set(range(6))
    assert set(info["list_train"]) & set(info["list_test"]) == set()

    # The normalized scene must fit the unit sphere.
    scene = SceneData.load(pkl)
    assert scene.n_frames == 6
    assert np.abs(info["bbox_minmax"]).max() <= 1.1
    # Camera pose recovered from P = K[R|t] decomposition sits at the
    # normalized version of (0,0,-120).
    cam = scene.poses[0][:3, 3]
    expected = (np.array([0, 0, -120.0]) - info["scale_mat"][:3, 3]) \
        / info["scale_mat"][0, 0]
    np.testing.assert_allclose(cam, expected, atol=1e-3)


def test_preprocess_scared_roundtrip(tmp_path):
    raw = str(tmp_path / "dataset_9_keyframe_9")
    make_raw_scared(raw)
    pkl = create_scared_info(raw, str(tmp_path / "info"), skip_every=2,
                             test_every=2, disp_type="disparity")
    with open(pkl, "rb") as f:
        info = pickle.load(f)
    assert info["dset_name"] == "scared2019"
    assert info["depth_type"] == "disp"
    assert len(info["disp_const"]) == info["n_frames"] == 3  # 6 / skip 2
    scene = SceneData.load(pkl)
    # Disparity -> depth -> normalization: all depths inside ~unit range.
    d = np.asarray(scene.device_arrays["depths"])
    assert d.max() < 3.0
    # disp->depth conversion: depth * radius must lie in [60, 150] mm.
    dep_mm = d * scene.depth_scale
    assert 55.0 < dep_mm[dep_mm > 0].min() < 70.0
    assert 140.0 < dep_mm.max() < 160.0


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
