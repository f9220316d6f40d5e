"""SCARED2019 dataset preprocessing: stereo keyframe capture -> info pkl.

Open3D-free re-implementation of /root/reference/data/scared2019/
preprocess.py: per-frame calibration JSONs (KL + camera pose, re-based to
frame 0), disparity TIFFs converted via the reprojection matrix
(depth = fl*bl / disp), 30-300mm depth thresholds, morphological-close color
masks, optional border crop for predicted disparity, frame subsampling, and
the same unit-sphere normalization + split as ENDONERF.

Per-case skip_every values (reference data/scared2019/README.md):
d1k1=2, d2k1=1, d3k1=4, d6k1=8, d7k1=8.

Usage:
    python -m endosurf_tpu.data.preprocess_scared \
        --dset_dir data/scared2019/dataset_1_keyframe_1 \
        --info_dir data/data_info/scared2019/ --skip_every 2
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle

import numpy as np

from endosurf_tpu.data.preprocess_common import (
    frame_pointclouds,
    train_test_split,
    unit_sphere_normalization,
)

DEPTH_FAR_MM = 300.0
DEPTH_NEAR_MM = 30.0
CROP_WIDTH = 100
PAD_MM = np.array([0.0, 0.0, 0.0])


def create_scared_info(dset_dir: str, info_dir: str, scale_factor: int = 1,
                       object_scale_in_sphere: float = 0.6,
                       skip_every: int = 2, test_every: int = 8,
                       disp_type: str = "disparity_pred") -> str:
    import cv2
    import imageio.v2 as iio

    scene_name = osp.basename(osp.normpath(dset_dir))
    calibs_dir = osp.join(dset_dir, "data", "frame_data")
    rgbs_dir = osp.join(dset_dir, "data", "left_finalpass")
    disps_dir = osp.join(dset_dir, "data", disp_type)
    reproj_dir = osp.join(dset_dir, "data", "reprojection_data")
    frame_ids = sorted(f[:-5] for f in os.listdir(calibs_dir))[::skip_every]
    n_frames = len(frame_ids)

    out_base = osp.join(dset_dir, "data_processed")
    disp_save = osp.join(out_base, f"{disp_type}_scale_{scale_factor}")
    rgb_save = osp.join(out_base, f"rgb_scale_{scale_factor}")
    mask_save = osp.join(out_base, f"mask_scale_{scale_factor}")
    for d in (disp_save, rgb_save, mask_save):
        os.makedirs(d, exist_ok=True)

    (colors, depths, world_mat, camera_mat, pose_mat, bds, disp_consts,
     rgb_paths, disp_paths, mask_paths) = ([], [], [], [], [], [], [], [],
                                           [], [])
    c2w0_inv = None
    for fid in frame_ids:
        with open(osp.join(calibs_dir, f"{fid}.json")) as f:
            calib = json.load(f)
        K = np.eye(4)
        K[:3, :3] = np.array(calib["camera-calibration"]["KL"])
        if scale_factor != 1:
            K = np.diag([1 / scale_factor, 1 / scale_factor, 1, 1]) @ K
        c2w = np.linalg.inv(np.array(calib["camera-pose"]))
        if c2w0_inv is None:
            c2w0_inv = np.linalg.inv(c2w)  # re-base poses to frame 0
        c2w = c2w0_inv @ c2w
        w2c = np.linalg.inv(c2w)

        rgb = np.asarray(iio.imread(osp.join(rgbs_dir, f"{fid}.png")))
        disp = np.asarray(iio.imread(
            osp.join(disps_dir, f"{fid}.tiff"))).astype(np.float32)
        h, w = disp.shape
        if scale_factor != 1:
            w, h = int(w / scale_factor), int(h / scale_factor)
            rgb = cv2.resize(rgb, (w, h), interpolation=cv2.INTER_LINEAR)
            disp = cv2.resize(disp, (w, h), interpolation=cv2.INTER_NEAREST)

        with open(osp.join(reproj_dir, f"{fid}.json")) as f:
            Q = np.array(json.load(f)["reprojection-matrix"])
        disp_const = Q[2, 3] * (1.0 / Q[3, 2])  # focal length * baseline

        depth = np.zeros_like(disp)
        nz = disp != 0
        depth[nz] = disp_const / disp[nz]
        depth[depth > DEPTH_FAR_MM] = 0
        depth[depth < DEPTH_NEAR_MM] = 0

        depth_mask = (depth != 0).astype(np.float32)
        kernel = np.ones((max(1, w // 128),) * 2, np.uint8)
        color_mask = cv2.morphologyEx(depth_mask, cv2.MORPH_CLOSE, kernel)
        if disp_type == "disparity_pred":
            # Predicted disparity is unreliable near the border: keep only
            # the central crop (preprocess.py:114-117).
            border = np.ones_like(disp)
            border[CROP_WIDTH:-CROP_WIDTH, CROP_WIDTH:-CROP_WIDTH] = 0
            depth[border == 1] = 0

        rp = osp.join(rgb_save, f"{fid}.png")
        dp = osp.join(disp_save, f"{fid}.tiff")
        mp = osp.join(mask_save, f"{fid}.png")
        iio.imwrite(rp, rgb)
        iio.imwrite(dp, disp)
        iio.imwrite(mp, (color_mask * 255).astype(np.uint8))

        colors.append(rgb[..., :3].astype(np.float32) / 255.0)
        depths.append(depth)
        world_mat.append(K @ w2c)
        camera_mat.append(K)
        pose_mat.append(c2w)
        bds.append(np.array([depth[depth != 0].min(),
                             depth[depth != 0].max()]))
        disp_consts.append(disp_const)
        rgb_paths.append(rp)
        disp_paths.append(dp)
        mask_paths.append(mp)

    colors = np.stack(colors)
    depths = np.stack(depths)
    world_mat = np.stack(world_mat)
    camera_mat = np.stack(camera_mat)
    pose_mat = np.stack(pose_mat)
    bds = np.stack(bds)

    pcds, bboxes = frame_pointclouds(
        colors, depths, camera_mat, pose_mat, depth_trunc=bds.max(),
        fraction=0.1, radius_mult=10.0)
    all_pts = np.concatenate(pcds, 0)
    scale_mat, radius, bbox_minmax = unit_sphere_normalization(
        all_pts, bboxes, object_scale_in_sphere, PAD_MM)

    list_train, list_test = train_test_split(n_frames, test_every)
    info = {
        "dset_name": "scared2019",
        "scene_name": f"{scene_name}_{disp_type}",
        "world_mat": world_mat,
        "camera_mat": camera_mat,
        "pose_mat": pose_mat,
        "wh": [w, h],
        "n_frames": n_frames,
        "color": rgb_paths,
        "depth": disp_paths,
        "depth_type": "disp",
        "disp_const": disp_consts,
        "mask": mask_paths,
        "scale_mat": scale_mat,
        "bounds": bds,
        "list_train": list_train,
        "list_test": list_test,
        "bbox_minmax": bbox_minmax,
        "mask_type": "mask",
        "depth_norm_scale": radius,
    }
    out_path = osp.join(info_dir, f"{scene_name}_{disp_type}.pkl")
    os.makedirs(info_dir, exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(info, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"info data saved in {out_path}")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dset_dir", default="data/scared2019/dataset_1_keyframe_1")
    ap.add_argument("--info_dir", default="data/data_info/scared2019/")
    ap.add_argument("--scale_factor", default=1, type=int)
    ap.add_argument("--object_scale_in_sphere", default=0.6, type=float)
    ap.add_argument("--skip_every", default=2, type=int)
    ap.add_argument("--test_every", default=8, type=int)
    ap.add_argument("--disp_type", default="disparity_pred",
                    choices=["disparity_pred", "disparity"])
    args = ap.parse_args()
    create_scared_info(args.dset_dir, args.info_dir, args.scale_factor,
                       args.object_scale_in_sphere, args.skip_every,
                       args.test_every, args.disp_type)


if __name__ == "__main__":
    main()
