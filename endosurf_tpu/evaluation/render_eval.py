"""Full-frame rendering for eval/test/demo modes.

Chunked equivalent of the reference eval loops (trainer_endosurf.py:205-283,
trainer_endonerf.py:153-225): frames are flattened to rays, rendered in
fixed-size jitted chunks (one compilation, reused across frames), and
reassembled into RGB / depth / weighted-normal maps, then scored with the
masked metric stack and saved as side-by-side composites.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from endosurf_tpu.data.scene_data import frame_rays
from endosurf_tpu.evaluation.metrics import cal_lpips, cal_psnr, cal_rmse, cal_ssim
from endosurf_tpu.evaluation.vis import (
    depth_to_show,
    hstack_labeled,
    normal_to_show,
    rgb_to_show,
)


def default_chunks_per_call() -> int:
    """Chunks folded into one dispatch by default.

    The tunneled-TPU dispatch RTT oscillates 1.9 ms .. 2.3 s (CLAUDE.md);
    a 512x640 frame is 160 chunks of 2048 rays, so per-chunk dispatch makes
    frame latency hostage to the tunnel. On TPU backends, fold 16 chunks
    per call (lax.map — sequential on device, so peak memory stays
    ~one-chunk); on CPU keep 1 (tests, no RTT to amortize).
    """
    import jax
    try:
        return 16 if jax.default_backend() not in ("cpu",) else 1
    except Exception:
        return 1


def render_full_frames(render_fn, params, arrays, h: int, w: int,
                       fids: Sequence[int], step: int,
                       ray_chunk: int = 2048,
                       ray_transform=None,
                       chunks_per_call: int = 0) -> Dict[str, np.ndarray]:
    """Render frames with a jitted chunked renderer.

    ``render_fn(params, rays[chunk,9], step_f) -> dict`` must return at least
    color_map/depth_map and, for SDF models, weights + gradients_o for the
    weighted normal map. ``ray_transform(rays[N,9], fid) -> rays`` lets a
    model rewrite ray slots per frame (EndoNeRF writes gt depth into slot 6
    for depth-guided sampling, reference trainer_endonerf.py:163-165).

    ``chunks_per_call`` > 1 folds that many chunks into a single device
    dispatch via ``lax.map`` (0 = backend default, see
    ``default_chunks_per_call``). Numerically identical to the per-chunk
    loop up to compiler fusion differences (~1e-7); only the dispatch
    count changes.
    """
    import jax

    if chunks_per_call <= 0:
        chunks_per_call = default_chunks_per_call()

    render_many = None
    if chunks_per_call > 1:
        @jax.jit
        def render_many(params, rays3, step_f):
            return jax.lax.map(
                lambda r: render_fn(params, r, step_f), rays3)

    rgbs, depths, normals = [], [], []
    step_f = jnp.asarray(float(step))
    for fid in fids:
        rays = np.asarray(frame_rays(arrays, h, w, int(fid))).reshape(-1, 9)
        if ray_transform is not None:
            rays = np.asarray(ray_transform(rays, int(fid)))
        n_rays = rays.shape[0]
        n_pad = (-n_rays) % ray_chunk
        rays_p = np.concatenate(
            [rays, np.repeat(rays[-1:], n_pad, 0)], 0) if n_pad else rays
        rgb_parts, depth_parts, normal_parts = [], [], []

        def collect(out, n_sub: int):
            """Append one call's outputs ([n_sub*chunk, ...])."""
            rgb_parts.append(np.asarray(out["color_map"]).reshape(
                n_sub * ray_chunk, -1))
            depth_parts.append(np.asarray(out["depth_map"]).reshape(
                n_sub * ray_chunk, -1))
            if "normal_map" in out:
                normal_parts.append(np.asarray(out["normal_map"]).reshape(
                    n_sub * ray_chunk, -1))
            elif "gradients_o" in out:
                g = np.asarray(out["gradients_o"]).reshape(
                    n_sub * ray_chunk, -1, 3)
                wgt = np.asarray(out["weights"]).reshape(
                    n_sub * ray_chunk, -1)
                normal_parts.append((g * wgt[..., None]).sum(1))

        n_chunks = rays_p.shape[0] // ray_chunk
        n_grouped = (0 if render_many is None
                     else (n_chunks // chunks_per_call) * chunks_per_call)
        if n_grouped:
            rays3 = jnp.asarray(rays_p[:n_grouped * ray_chunk]).reshape(
                -1, chunks_per_call, ray_chunk, 9)
            for g in range(rays3.shape[0]):
                collect(render_many(params, rays3[g], step_f),
                        chunks_per_call)
        for c in range(n_grouped, n_chunks):
            i = c * ray_chunk
            collect(render_fn(params, jnp.asarray(rays_p[i:i + ray_chunk]),
                              step_f), 1)
        rgb = np.concatenate(rgb_parts, 0)[:n_rays].reshape(h, w, 3)
        depth = np.concatenate(depth_parts, 0)[:n_rays].reshape(h, w, 1)
        rgbs.append(rgb)
        depths.append(depth)
        if normal_parts:
            normals.append(
                np.concatenate(normal_parts, 0)[:n_rays].reshape(h, w, 3))
    out = {"rgb": np.stack(rgbs), "depth": np.stack(depths)}
    if normals:
        out["normal"] = np.stack(normals)
    return out


def eval_frames(trainer, fids: Sequence[int], step: int,
                ray_chunk: int = 2048, save_dir_name: str = "eval",
                save_images: bool = True,
                chunks_per_call: int = 0) -> Dict[str, float]:
    """Render test frames, compute masked metrics, save composites + stats."""
    scene = trainer.scene
    arrays = scene.device_arrays
    fids = [int(f) for f in fids]

    render_fn = trainer.render_fn()
    pred = render_full_frames(
        render_fn, trainer.params, arrays, scene.h, scene.w, fids, step,
        ray_chunk, ray_transform=getattr(trainer, "eval_ray_transform", None),
        chunks_per_call=chunks_per_call)
    if "normal" not in pred and getattr(trainer, "normals_from_depth", False):
        from endosurf_tpu.evaluation.vis import normal_from_depth
        rays = np.stack([np.asarray(frame_rays(arrays, scene.h, scene.w, f))
                         for f in fids])
        pred["normal"] = normal_from_depth(rays, pred["depth"])

    rgb_gt = np.asarray(arrays["colors"])[fids]
    depth_gt = np.asarray(arrays["depths"])[fids]
    mask_gt = np.asarray(arrays["masks"])[fids]
    color_mask_gt = np.asarray(arrays["color_masks"])[fids]
    ds = scene.depth_scale

    stats = {
        "psnr_rgb_vr": cal_psnr(rgb_gt, pred["rgb"], color_mask_gt),
        "ssim_rgb_vr": cal_ssim(rgb_gt, pred["rgb"], color_mask_gt),
        "rmse_d_vr": cal_rmse(depth_gt * ds, pred["depth"] * ds, mask_gt),
    }
    lp = cal_lpips(rgb_gt, pred["rgb"], color_mask_gt)
    if lp is not None:
        stats["lpips_rgb_vr"] = lp

    # Multi-process runs: every process rendered (the jitted chunks hold
    # cross-process collectives, so all must participate), but only the
    # main process writes artifacts into the shared exp_dir.
    if not getattr(trainer, "is_main", True):
        return stats

    save_dir = osp.join(trainer.exp_dir, save_dir_name, f"iter_{step:08d}")
    os.makedirs(save_dir, exist_ok=True)
    with open(osp.join(save_dir, "stats_out.txt"), "w") as f:
        for k, v in stats.items():
            f.write(f"{k}: {v:f}\n")

    if save_images:
        import imageio.v2 as iio
        depth_max = scene.far
        poses = scene.poses[fids]
        normal_show = (normal_to_show(pred["normal"], poses)
                       if "normal" in pred else None)
        for i in range(len(fids)):
            panels = [rgb_to_show(rgb_gt[i]), rgb_to_show(pred["rgb"][i]),
                      depth_to_show(depth_gt[i], depth_max),
                      depth_to_show(pred["depth"][i], depth_max)]
            labels = ["rgb_gt", "rgb_pred", "depth_gt", "depth_pred"]
            if normal_show is not None:
                panels.append(normal_show[i])
                labels.append("normal_pred")
            row = hstack_labeled(panels, labels)
            iio.imwrite(osp.join(save_dir, f"eval_{i:03d}.png"), row)
            if trainer.writer is not None and i == 0:
                trainer.writer.add_image(f"{save_dir_name}/results", row, step)

    print(f"EVAL|iter:{step}|" + "|".join(
        f"{k}:{v:.4f}" for k, v in stats.items()), flush=True)
    return stats
