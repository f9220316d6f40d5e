#!/usr/bin/env python
"""Generate a demo virtual-camera JSON for a scene.

The reference ships hand-tuned Open3D PinholeCameraParameters JSONs per
dataset (src/dataset/vis_cfg/virtual_cam_{endonerf,scared2019}.json,
selected at dataset.py:108-113) for the offscreen mesh screenshots in demo
mode. This tool derives an equivalent camera from any scene info pkl: the
chirality-corrected mean frame pose, pulled back along the view axis and
optionally tilted, written in the same column-major Open3D JSON format so
`demo.virtual_camera: <path>` consumes it directly
(endosurf_tpu/evaluation/demo.py:load_virtual_camera).

    python tools/make_virtual_camera.py <info.pkl> out.json \
        [--pullback 0.25] [--tilt-deg 10]
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def camera_from_scene(scene, pullback: float = 0.25, tilt_deg: float = 0.0):
    """Mean-pose virtual camera: (K [3,3], w2c [4,4], w, h)."""
    poses = scene.poses
    Rm = poses[:, :3, :3].mean(0)
    u, _, vt = np.linalg.svd(Rm)
    R = u @ vt
    if np.linalg.det(R) < 0:
        R = u @ np.diag([1.0, 1.0, -1.0]) @ vt
    center = poses[:, :3, 3].mean(0)
    # Pull the camera back along its own viewing axis (+z in camera frame)
    # so the whole unit-sphere scene stays in frame, and tilt it slightly
    # off the mean axis so surface relief reads in the screenshots (the
    # reference's hand-tuned cameras do the same by eye).
    if tilt_deg:
        a = np.deg2rad(tilt_deg)
        tilt = np.array([[1, 0, 0],
                         [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])
        R = R @ tilt
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = center - R[:, 2] * pullback
    return scene.intrinsics[0][:3, :3].copy(), np.linalg.inv(pose), \
        int(scene.w), int(scene.h)


def write_virtual_camera(path: str, K, w2c, w: int, h: int) -> None:
    """Write Open3D PinholeCameraParameters JSON (column-major matrices)."""
    data = {
        "class_name": "PinholeCameraParameters",
        "extrinsic": [float(v) for v in np.asarray(w2c).T.reshape(-1)],
        "intrinsic": {
            "height": int(h),
            "intrinsic_matrix": [float(v)
                                 for v in np.asarray(K).T.reshape(-1)],
            "width": int(w),
        },
        "version_major": 1,
        "version_minor": 0,
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("info_pkl")
    ap.add_argument("out_json")
    ap.add_argument("--pullback", type=float, default=0.25)
    ap.add_argument("--tilt-deg", type=float, default=0.0)
    args = ap.parse_args()

    from endosurf_tpu.data.scene_data import SceneData
    scene = SceneData.load(args.info_pkl)
    K, w2c, w, h = camera_from_scene(scene, args.pullback, args.tilt_deg)
    write_virtual_camera(args.out_json, K, w2c, w, h)
    print(f"wrote {args.out_json} ({w}x{h})")


if __name__ == "__main__":
    main()
