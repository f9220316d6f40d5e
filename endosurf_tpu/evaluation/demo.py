"""Demo / test modes: 2D view synthesis + 3D mesh extraction with metrics.

Equivalent of the reference's demo() (trainer_endosurf.py:285-554,
trainer_endonerf.py:227-495): renders every (or every test) frame, scores
PSNR/SSIM/LPIPS/RMSE, extracts per-frame marching-tetrahedra meshes, colors
them from the radiance field, writes PLYs + screenshots + mp4/gif, and
reports the mean geometric error (gt point cloud -> mesh vertices, mm).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, List, Optional

import numpy as np

from endosurf_tpu.evaluation.geometry3d import (
    colored_meshes,
    extract_mesh,
    geometric_error,
    rgbd_to_pointcloud,
)
from endosurf_tpu.evaluation.metrics import cal_lpips, cal_psnr, cal_rmse, \
    cal_ssim
from endosurf_tpu.evaluation.render_eval import render_full_frames
from endosurf_tpu.evaluation.vis import (
    depth_to_show,
    hstack_labeled,
    normal_to_show,
    rgb_to_show,
    to8b,
    write_gif,
    write_video,
)
from endosurf_tpu.native import rasterize_mesh
from endosurf_tpu.utils.ply import write_ply


def load_virtual_camera(path: str):
    """Parse an Open3D PinholeCameraParameters JSON (the reference's
    vis_cfg/virtual_cam_*.json format, selected at dataset.py:108-113).
    Open3D stores matrices column-major. Returns (K [3,3], w2c [4,4], w, h).
    """
    import json
    with open(path) as f:
        data = json.load(f)
    intr = data["intrinsic"]
    K = np.asarray(intr["intrinsic_matrix"], np.float64).reshape(3, 3).T
    w2c = np.asarray(data["extrinsic"], np.float64).reshape(4, 4).T
    return K, w2c, int(intr["width"]), int(intr["height"])


def resolve_virtual_camera(cfg: Dict, scene):
    """Demo screenshot camera from config: a vis_cfg JSON path, or "mean"
    (fixed camera at the average frame pose — a scene-agnostic stand-in for
    the reference's hand-tuned per-dataset virtual cameras). None = shoot
    each frame from its own camera."""
    spec = cfg.get("virtual_camera")
    if not spec:
        return None
    if isinstance(spec, str) and spec != "mean":
        return load_virtual_camera(spec)
    poses = scene.poses
    Rm = poses[:, :3, :3].mean(0)
    u, _, vt = np.linalg.svd(Rm)
    R = u @ vt
    if np.linalg.det(R) < 0:
        R = u @ np.diag([1.0, 1.0, -1.0]) @ vt
    pose = np.eye(4)
    pose[:3, :3] = R
    pose[:3, 3] = poses[:, :3, 3].mean(0)
    return (scene.intrinsics[0][:3, :3], np.linalg.inv(pose),
            scene.w, scene.h)


def _screenshot(verts, tris, colors, K, w2c, h, w):
    """Project a world-space mesh through a camera and rasterize."""
    if len(verts) == 0:
        return np.ones((h, w, 3), np.float32)
    R, t = w2c[:3, :3], w2c[:3, 3]
    cam = verts @ R.T + t
    z = np.maximum(cam[:, 2], 1e-6)
    x = cam[:, 0] / z * K[0, 0] + K[0, 2]
    y = cam[:, 1] / z * K[1, 1] + K[1, 2]
    screen = np.stack([x, y, z], -1).astype(np.float32)
    return rasterize_mesh(screen, colors, tris, w, h)


def run_demo(trainer, step: int, test_mode: bool = False,
             visualize: bool = True, demo_2d: bool = True,
             demo_3d: bool = True) -> Dict[str, float]:
    scene = trainer.scene
    cfg = trainer.cfg.get("demo", {})
    fps = cfg.get("fps", 10)
    ray_chunk = cfg.get("ray_batch", 1024)
    mesh_resolution = cfg.get("marching_cubes_resolution", 128)
    thresh = cfg.get("marching_cubes_thresh", 0)
    mesh_smooth_iters = cfg.get("marching_cubes_filter", None)
    if mesh_smooth_iters in ("None", None):
        mesh_smooth_iters = 0

    fids = (list(scene.list_test) if test_mode
            else list(range(scene.n_frames)))
    fids = [int(f) for f in fids]
    tag = "test" if test_mode else "all"
    base_dir = osp.join(trainer.exp_dir, "demo", f"iter_{step:08d}")
    arrays = scene.device_arrays
    rgb_gt = np.asarray(arrays["colors"])[fids]
    depth_gt = np.asarray(arrays["depths"])[fids]
    mask_gt = np.asarray(arrays["masks"])[fids]
    color_mask_gt = np.asarray(arrays["color_masks"])[fids]
    ts = np.asarray(arrays["ts"])[fids]
    depth_max = scene.far
    ds = scene.depth_scale
    stats: Dict[str, float] = {}
    shows_2d: Optional[List[np.ndarray]] = None
    mesh_shots: Dict[str, List[np.ndarray]] = {}

    import imageio.v2 as iio

    if demo_2d:
        d2 = osp.join(base_dir, f"{tag}_2d")
        os.makedirs(d2, exist_ok=True)
        pred = render_full_frames(
            trainer.render_fn(), trainer.params, arrays, scene.h, scene.w,
            fids, step, ray_chunk,
            ray_transform=getattr(trainer, "eval_ray_transform", None),
            chunks_per_call=cfg.get("chunks_per_call", 0))
        depth_filter = cfg.get("depth_filter")
        if depth_filter not in ("None", None):
            # Demo-only depth smoothing (reference trainer_endonerf.py:288).
            from endosurf_tpu.evaluation.vis import filter_depth
            pred["depth"] = filter_depth(pred["depth"], depth_filter)
        if ("normal" not in pred
                and getattr(trainer, "normals_from_depth", False)):
            from endosurf_tpu.data.scene_data import frame_rays
            from endosurf_tpu.evaluation.vis import normal_from_depth
            rays = np.stack([
                np.asarray(frame_rays(arrays, scene.h, scene.w, f))
                for f in fids])
            pred["normal"] = normal_from_depth(rays, pred["depth"])
        stats.update({
            "psnr_rgb_vr": cal_psnr(rgb_gt, pred["rgb"], color_mask_gt),
            "ssim_rgb_vr": cal_ssim(rgb_gt, pred["rgb"], color_mask_gt),
            "rmse_d_vr": cal_rmse(depth_gt * ds, pred["depth"] * ds, mask_gt),
        })
        lp = cal_lpips(rgb_gt, pred["rgb"], color_mask_gt)
        if lp is not None:
            stats["lpips_rgb_vr"] = lp
        with open(osp.join(d2, "stats_out.txt"), "w") as f:
            for k, v in stats.items():
                f.write(f"{k}: {v:f}\n")

        if visualize:
            normal_show = (normal_to_show(pred["normal"], scene.poses[fids])
                           if "normal" in pred else None)
            shows_2d = []
            for i in range(len(fids)):
                panels = [rgb_to_show(rgb_gt[i]), rgb_to_show(pred["rgb"][i]),
                          depth_to_show(depth_gt[i], depth_max),
                          depth_to_show(pred["depth"][i], depth_max)]
                labels = ["rgb_gt", "rgb_pred", "depth_gt", "depth_pred"]
                if normal_show is not None:
                    panels.append(normal_show[i])
                    labels.append("normal_pred")
                row = hstack_labeled(panels, labels)
                shows_2d.append(row)
                iio.imwrite(osp.join(d2, f"{i:03d}_all.png"), row)
                iio.imwrite(osp.join(d2, f"{i:03d}_rgb_vr.png"),
                            rgb_to_show(pred["rgb"][i]))
                iio.imwrite(osp.join(d2, f"{i:03d}_depth_vr.png"),
                            depth_to_show(pred["depth"][i], depth_max))
            write_video(osp.join(d2, "demo.mp4"), shows_2d, fps)
            write_gif(osp.join(d2, "demo.gif"), shows_2d, fps)

    if demo_3d:
        d3 = osp.join(base_dir,
                      f"{tag}_3d_thresh_{thresh}_res_{mesh_resolution}")
        os.makedirs(d3, exist_ok=True)
        # Optional fixed virtual camera for mesh screenshots (reference
        # vis_cfg/virtual_cam_*.json; demo.virtual_camera = path | "mean").
        vcam = resolve_virtual_camera(cfg, scene)
        view_point = scene.poses[:, :3, 3].mean(0)
        import jax
        field_fn = jax.jit(trainer.demo_field_fn())  # one cache, all frames
        render_pts = trainer.render_points_fn()
        geo_errs = []
        for i, fid in enumerate(fids):
            pcd_pts, pcd_col = rgbd_to_pointcloud(
                rgb_gt[i], depth_gt[i], scene.intrinsics[fid][:3, :3],
                scene.poses[fid], depth_max)
            # Slightly enlarged per-frame bbox (trainer_endosurf.py:423-424).
            bmin = scene.bbox_minmax[fid, :, 0] * 1.2
            bmax = scene.bbox_minmax[fid, :, 1] * 1.2
            verts, tris = extract_mesh(
                field_fn, float(ts[i]), bmin, bmax, mesh_resolution,
                trainer.demo_field_threshold(thresh))
            assert len(verts) > 0, (
                "Failed to find surface! Please tune threshold.")
            if mesh_smooth_iters:
                from endosurf_tpu.native import laplacian_smooth
                verts = laplacian_smooth(verts, tris, mesh_smooth_iters)
            cm = colored_meshes(render_pts, verts, tris, view_point,
                                float(ts[i]))
            write_ply(osp.join(d3, f"{i:03d}_geometry.ply"), verts, tris)
            write_ply(osp.join(d3, f"{i:03d}_color.ply"), verts, tris,
                      cm["color"])
            write_ply(osp.join(d3, f"{i:03d}_normal.ply"), verts, tris,
                      cm["normal_color"])
            write_ply(osp.join(d3, f"{i:03d}_gt.ply"), pcd_pts,
                      colors=pcd_col)
            geo_errs.append(geometric_error(pcd_pts, verts, ds))

            if visualize:
                if vcam is not None:
                    K, w2c, shot_w, shot_h = vcam
                else:
                    K = scene.intrinsics[fid][:3, :3]
                    w2c = np.linalg.inv(scene.poses[fid])
                    shot_w, shot_h = scene.w, scene.h
                shade = np.clip(
                    np.abs(cm["normals"] @ (-w2c[2, :3])), 0.2, 1.0)
                for kind, col in (
                        ("geometry", np.repeat(shade[:, None], 3, 1)),
                        ("color", cm["color"]),
                        ("normal", cm["normal_color"])):
                    img = _screenshot(verts, tris, col, K, w2c,
                                      shot_h, shot_w)
                    mesh_shots.setdefault(kind, []).append(to8b(img))
                    iio.imwrite(osp.join(d3, f"{i:03d}_{kind}.png"),
                                to8b(img))

        stats["geo_err_mean"] = float(np.mean(geo_errs))
        # Per-frame errors: the deformation-extreme vs neutral-frame split
        # is the round-2/3 capacity diagnostic (VALIDATION.md); expose it
        # programmatically, not only via stats_out.txt.
        stats["geo_err_per_frame"] = [float(e) for e in geo_errs]
        with open(osp.join(d3, "stats_out.txt"), "w") as f:
            f.write(f"mean: {stats['geo_err_mean']:f}\n")
            for k, v in enumerate(geo_errs):
                f.write(f"{k}: {v:f}\n")

        if visualize and mesh_shots:
            frames = [hstack_labeled(
                [mesh_shots[k][i] for k in mesh_shots],
                list(mesh_shots)) for i in range(len(fids))]
            write_video(osp.join(d3, "demo.mp4"), frames, fps)
            write_gif(osp.join(d3, "demo.gif"), frames, fps)

    if demo_2d and demo_3d and visualize and shows_2d:
        df = osp.join(base_dir, f"{tag}_final")
        os.makedirs(df, exist_ok=True)

        def match_h(img, h):
            if img.shape[0] == h:
                return img
            import cv2
            return cv2.resize(img, (max(1, int(img.shape[1] * h
                                               / img.shape[0])), h))

        frames = []
        for i in range(len(fids)):
            # A virtual camera may shoot at a different resolution than the
            # 2D renders; normalize heights before compositing.
            panels = [shows_2d[i]] + [
                match_h(mesh_shots[k][i], shows_2d[i].shape[0])
                for k in mesh_shots]
            row = hstack_labeled(panels,
                                 ["render"] + [f"mesh_{k}" for k in mesh_shots])
            frames.append(row)
            iio.imwrite(osp.join(df, f"{i:03d}.png"), row)
        write_video(osp.join(df, "demo.mp4"), frames, fps)
        write_gif(osp.join(df, "demo.gif"), frames, fps)

    print("DEMO|" + "|".join(f"{k}:{v:.4f}" for k, v in stats.items()
                             if np.isscalar(v)), flush=True)
    return stats
