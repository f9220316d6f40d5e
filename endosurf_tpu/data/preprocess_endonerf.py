"""ENDONERF dataset preprocessing: raw capture -> info pkl.

Open3D-free re-implementation of /root/reference/data/endonerf/preprocess.py:
LLFF-style poses_bounds.npy (3x5 [R|t|hwf] per frame) -> per-frame K and
projection matrices; depth cleanup with 3%/99.9% percentile clipping and
tool-mask zeroing; per-frame denoised point clouds; scene->unit-sphere scale
matrix; padded normalized bboxes; (i-1)%8 train/test split.

Usage:
    python -m endosurf_tpu.data.preprocess_endonerf \
        --dset_dir data/endonerf/dataset/pulling_soft_tissues \
        --info_dir data/data_info/endonerf/
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle

import numpy as np

from endosurf_tpu.data.preprocess_common import (
    frame_pointclouds,
    train_test_split,
    unit_sphere_normalization,
)

PAD_MM = np.array([-5.0, -5.0, 10.0])  # bbox padding (preprocess.py:21)


def _list_images(d, exts=("JPG", "jpg", "png")):
    return [osp.join(d, f) for f in sorted(os.listdir(d))
            if f.split(".")[-1] in exts]


def _read_stack(paths, kind):
    import imageio.v2 as iio
    imgs = []
    for p in paths:
        img = np.asarray(iio.imread(p))
        if kind == "color":
            imgs.append(img[..., :3].astype(np.float32) / 255.0)
        elif kind == "depth":
            imgs.append(img.astype(np.float32))
        elif kind == "mask_invert":
            imgs.append(1.0 - img.astype(np.float32) / 255.0)
    return np.stack(imgs)


def create_endonerf_info(dset_dir: str, info_dir: str, test_every: int = 8,
                         object_scale_in_sphere: float = 0.6) -> str:
    scene_name = osp.basename(osp.normpath(dset_dir))

    # LLFF poses: [n, 17] -> [n, 3, 5] of [R|t|hwf] (preprocess.py:24-47).
    poses_arr = np.load(osp.join(dset_dir, "poses_bounds.npy"))
    poses = poses_arr[:, :-2].reshape(-1, 3, 5)
    bds = poses_arr[:, -2:]
    n_frames = poses.shape[0]

    world_mat, camera_mat, pose_mat = [], [], []
    for i in range(n_frames):
        pose = poses[i]
        c2w = np.vstack([pose[:, :4], [[0, 0, 0, 1]]])
        w2c = np.linalg.inv(c2w)
        h, w, f = int(pose[0, 4]), int(pose[1, 4]), pose[2, 4]
        K = np.array([[f, 0, (w - 1) * 0.5, 0], [0, f, (h - 1) * 0.5, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]])
        world_mat.append(K @ w2c)
        camera_mat.append(K)
        pose_mat.append(c2w)
    world_mat = np.stack(world_mat)
    camera_mat = np.stack(camera_mat)
    pose_mat = np.stack(pose_mat)

    color_paths = _list_images(osp.join(dset_dir, "images"))
    depth_paths = _list_images(osp.join(dset_dir, "depth"))
    mask_paths = _list_images(osp.join(dset_dir, "masks"))
    for name, paths in (("images", color_paths), ("depth", depth_paths),
                        ("masks", mask_paths)):
        assert len(paths) == n_frames, (
            f"Mismatch between {name} ({len(paths)}) and poses ({n_frames})")

    colors = _read_stack(color_paths, "color")
    depths = _read_stack(depth_paths, "depth")
    masks = _read_stack(mask_paths, "mask_invert")

    # Depth cleanup (preprocess.py:54-59): zero under tool masks, clip to
    # the 3% / 99.9% percentile band.
    depths[masks == 0] = 0
    close_depth = np.percentile(depths[depths != 0], 3.0)
    inf_depth = np.percentile(depths[depths != 0], 99.9)
    depths[depths > inf_depth] = 0
    depths[(depths < close_depth) & (depths != 0)] = 0

    pcds, bboxes = frame_pointclouds(
        colors, depths, camera_mat, pose_mat, depth_trunc=inf_depth,
        fraction=0.005, radius_mult=20.0)
    all_pts = np.concatenate(pcds, 0)
    scale_mat, radius, bbox_minmax = unit_sphere_normalization(
        all_pts, bboxes, object_scale_in_sphere, PAD_MM)

    list_train, list_test = train_test_split(n_frames, test_every)
    info = {
        "dset_name": "endonerf",
        "scene_name": scene_name,
        "world_mat": world_mat,
        "camera_mat": camera_mat,
        "pose_mat": pose_mat,
        "wh": [int(poses[0, 1, 4]), int(poses[0, 0, 4])],
        "n_frames": n_frames,
        "color": color_paths,
        "depth": depth_paths,
        "depth_type": "depth",
        "mask": mask_paths,
        "scale_mat": scale_mat,
        "bounds": bds,
        "list_train": list_train,
        "list_test": list_test,
        "bbox_minmax": bbox_minmax,
        "mask_type": "mask_invert",
        "depth_norm_scale": radius,
    }
    out_path = osp.join(info_dir, f"{scene_name}.pkl")
    os.makedirs(info_dir, exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(info, f, protocol=pickle.HIGHEST_PROTOCOL)
    print(f"info data saved in {out_path}")
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dset_dir",
                    default="data/endonerf/dataset/pulling_soft_tissues")
    ap.add_argument("--info_dir", default="data/data_info/endonerf/")
    ap.add_argument("--test_every", default=8, type=int)
    ap.add_argument("--object_scale_in_sphere", default=0.8, type=float)
    args = ap.parse_args()
    create_endonerf_info(args.dset_dir, args.info_dir, args.test_every,
                         args.object_scale_in_sphere)


if __name__ == "__main__":
    main()
