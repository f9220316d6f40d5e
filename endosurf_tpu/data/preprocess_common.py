"""Shared preprocessing machinery: point clouds, scene normalization, splits.

Open3D-free re-implementation of the common stages of the reference
preprocess scripts (data/endonerf/preprocess.py:61-116, data/scared2019/
preprocess.py:146-202): per-frame RGBD point clouds with downsampling +
radius-outlier removal, per-frame AABBs, a global scene->unit-sphere scale
matrix, normalized padded bboxes, and the (i-1) % test_every split.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from endosurf_tpu.evaluation.geometry3d import rgbd_to_pointcloud
from endosurf_tpu.native import nn_distance_excl_self, radius_outlier_mask


def downsample_and_denoise(pts: np.ndarray, fraction: float,
                           nb_points: int = 5, radius_mult: float = 20.0,
                           rng: np.random.Generator = None) -> np.ndarray:
    """Random downsample then radius-outlier removal with an adaptive radius
    (radius = mean nearest-neighbor distance * radius_mult, matching the
    reference, preprocess.py:78-80)."""
    rng = rng or np.random.default_rng(0)
    if fraction < 1.0 and len(pts) > 0:
        n_keep = max(1, int(round(len(pts) * fraction)))
        idx = rng.choice(len(pts), size=n_keep, replace=False)
        pts = pts[idx]
    if len(pts) > nb_points:
        radius = float(nn_distance_excl_self(pts).mean()) * radius_mult
        keep = radius_outlier_mask(pts, nb_points, radius)
        pts = pts[keep]
    return pts


def frame_pointclouds(colors: np.ndarray, depths: np.ndarray,
                      camera_mats: np.ndarray, pose_mats: np.ndarray,
                      depth_trunc: float, fraction: float,
                      radius_mult: float,
                      seed: int = 0) -> Tuple[List[np.ndarray], np.ndarray]:
    """Per-frame denoised world point clouds + per-frame AABBs [n,3,2]."""
    rng = np.random.default_rng(seed)
    pcds, bboxes = [], []
    for i in range(len(colors)):
        pts, _ = rgbd_to_pointcloud(colors[i], depths[i],
                                    camera_mats[i][:3, :3], pose_mats[i],
                                    depth_trunc)
        pts = downsample_and_denoise(pts, fraction, radius_mult=radius_mult,
                                     rng=rng)
        pcds.append(pts)
        bboxes.append(np.stack([pts.min(0), pts.max(0)], -1))
    return pcds, np.stack(bboxes)


def unit_sphere_normalization(all_points: np.ndarray,
                              bboxes: np.ndarray,
                              object_scale_in_sphere: float,
                              pad_mm: np.ndarray
                              ) -> Tuple[np.ndarray, float, np.ndarray]:
    """Scene -> unit-sphere scale matrix + normalized padded bboxes.

    scale_mat maps normalized coords back to the scene: diag(radius) with the
    bbox center as translation (preprocess.py:89-112). Returns
    (scale_mat [4,4], radius, bbox_minmax [n,3,2] normalized).
    """
    bbox_min = all_points.min(0)
    bbox_max = all_points.max(0)
    center = (bbox_min + bbox_max) / 2.0
    radius = (np.linalg.norm(all_points - center, axis=-1).max()
              / object_scale_in_sphere)
    scale_mat = np.diag([radius, radius, radius, 1.0]).astype(np.float32)
    scale_mat[:3, 3] = center

    pad_norm = np.asarray(pad_mm, np.float64) / radius
    raw = (bboxes - center[None, :, None]) / radius
    norm_bboxes = raw.copy()
    norm_bboxes[:, :, 0] -= pad_norm
    norm_bboxes[:, :, 1] += pad_norm
    # The reference pads x/y NEGATIVELY (preprocess.py:21, pad=[-5,-5,10]mm
    # — a deliberate shrink that trims stereo boundary noise). On a real
    # capture the per-frame bbox is far wider than 10mm so this never
    # degenerates, but on a tiny scene the shrink can invert min>max, which
    # poisons every downstream grid (marching tetrahedra gets descending
    # axes). Guard: any axis the pad inverted falls back to its unpadded
    # bounds — identical to the reference on all non-degenerate data.
    inverted = norm_bboxes[:, :, 0] > norm_bboxes[:, :, 1]
    norm_bboxes[inverted] = raw[inverted]
    return scale_mat, float(radius), norm_bboxes.astype(np.float32)


def train_test_split(n_frames: int, test_every: int
                     ) -> Tuple[List[int], List[int]]:
    """(i-1) % test_every split (preprocess.py:114-116)."""
    list_train = [i for i in range(n_frames) if (i - 1) % test_every != 0]
    list_test = [i for i in range(n_frames) if (i - 1) % test_every == 0]
    return list_train, list_test
