"""3D geometry extraction and metrics.

Replaces the reference's mesh pipeline (extract_fields + PyMCubes at
renderer/utils.py:130-157, Open3D cleanup at trainer_endosurf.py:435-446, and
the geometric error at trainer_endosurf.py:472) with:

  * dense field evaluation on device in fixed-shape jitted blocks
    (TPU evaluates the grid; only the scalar field ships to host),
  * first-party marching tetrahedra + mesh cleanup (endosurf_tpu.native),
  * KD-tree one-sided point-cloud distance for the mm geometric error.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from endosurf_tpu.native import clean_mesh, marching_tetrahedra, \
    point_cloud_distance, vertex_normals


def eval_field_grid(field_fn: Callable, t: float, bound_min: np.ndarray,
                    bound_max: np.ndarray, resolution: int,
                    block: int = 64) -> np.ndarray:
    """Evaluate ``field_fn(pts [N,3], t [N,1]) -> [N,1]`` on a dense grid.

    The grid is processed in fixed-shape [block^2 * res] batches so one jit
    compilation serves every block and every frame (reference extract_fields
    splits 128^3 chunks in a triple python loop, renderer/utils.py:139-157).
    """
    lin = [np.linspace(bound_min[i], bound_max[i], resolution,
                       dtype=np.float32) for i in range(3)]
    out = np.empty((resolution,) * 3, np.float32)

    n_block = min(block, resolution)
    # NOTE: field_fn should be jitted by the caller if it will be reused
    # across frames — jitting here would build a fresh cache per call.

    t_full = None
    for x0 in range(0, resolution, n_block):
        xs = lin[0][x0:x0 + n_block]
        # One [len(xs), res, res] slab per call keeps shapes fixed when
        # resolution % block == 0 (pad the last slab otherwise).
        pad = n_block - len(xs)
        xs_p = np.pad(xs, (0, pad), mode="edge")
        xx, yy, zz = np.meshgrid(xs_p, lin[1], lin[2], indexing="ij")
        pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
        if t_full is None or len(pts) != len(t_full):
            t_full = jnp.full((len(pts), 1), float(t), jnp.float32)
        val = np.asarray(field_fn(jnp.asarray(pts), t_full))
        val = val.reshape(n_block, resolution, resolution)[
            : len(xs)]
        out[x0:x0 + len(xs)] = val
    return out


def extract_mesh(field_fn: Callable, t: float, bound_min, bound_max,
                 resolution: int = 128, threshold: float = 0.0,
                 keep_ratio: float = 0.9,
                 block: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """Dense field eval -> isosurface -> cleaned mesh in world coordinates."""
    bound_min = np.asarray(bound_min, np.float32)
    bound_max = np.asarray(bound_max, np.float32)
    grid = eval_field_grid(field_fn, t, bound_min, bound_max, resolution,
                           block)
    verts, tris = marching_tetrahedra(grid, threshold)
    if len(verts) == 0:
        return verts, tris
    verts = (verts / (resolution - 1.0) * (bound_max - bound_min)[None, :]
             + bound_min[None, :])
    return clean_mesh(verts, tris, keep_ratio)


def rgbd_to_pointcloud(rgb: np.ndarray, depth: np.ndarray, K: np.ndarray,
                       c2w: np.ndarray, depth_trunc: float
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Unproject an RGBD frame to a world-space colored point cloud
    (Open3D create_from_rgbd_image equivalent, trainer/utils.py:249-277).

    Returns (points [N,3], colors [N,3] in [0,1]) for valid depth pixels.
    """
    depth = np.asarray(depth)
    if depth.ndim == 3:
        depth = depth[..., 0]
    h, w = depth.shape
    valid = (depth > 0) & (depth < depth_trunc)
    ys, xs = np.nonzero(valid)
    z = depth[ys, xs]
    K = np.asarray(K)
    x_cam = (xs - K[0, 2]) / K[0, 0] * z
    y_cam = (ys - K[1, 2]) / K[1, 1] * z
    pts_cam = np.stack([x_cam, y_cam, z], -1)
    R, t = np.asarray(c2w)[:3, :3], np.asarray(c2w)[:3, 3]
    pts = pts_cam @ R.T + t
    colors = np.asarray(rgb)[ys, xs][:, :3]
    if colors.dtype == np.uint8:
        colors = colors.astype(np.float32) / 255.0
    return pts.astype(np.float32), colors.astype(np.float32)


def geometric_error(gt_points: np.ndarray, mesh_verts: np.ndarray,
                    depth_scale: float = 1.0) -> float:
    """Mean one-sided distance gt-pcd -> mesh vertices, scaled to mm
    (reference trainer_endosurf.py:472)."""
    if len(mesh_verts) == 0 or len(gt_points) == 0:
        return float("inf")
    d = point_cloud_distance(gt_points, mesh_verts)
    return float(d.mean() * depth_scale)


def colored_meshes(render_pts_fn: Callable, verts: np.ndarray,
                   tris: np.ndarray, view_point: np.ndarray,
                   t: float, chunk: int = 65536
                   ) -> Dict[str, np.ndarray]:
    """Vertex colors from the radiance field + normal colormap
    (reference demo 3D coloring, trainer_endosurf.py:449-462).

    ``render_pts_fn(pts [N,3], dirs [N,3], t [N,1]) -> colors [N,3]``.
    """
    dirs = verts - view_point[None, :]
    dirs = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-10)
    colors = np.empty((len(verts), 3), np.float32)
    n = len(verts)
    n_pad = (-n) % chunk if n > chunk else chunk - n
    v_p = np.concatenate([verts, np.repeat(verts[-1:], n_pad, 0)], 0)
    d_p = np.concatenate([dirs, np.repeat(dirs[-1:], n_pad, 0)], 0)
    for i in range(0, len(v_p), chunk):
        t_arr = np.full((chunk, 1), t, np.float32)
        c = np.asarray(render_pts_fn(v_p[i:i + chunk], d_p[i:i + chunk],
                                     t_arr))
        end = min(i + chunk, n)
        if end > i:
            colors[i:end] = c[: end - i]
    normals = vertex_normals(verts, tris)
    normal_colors = np.clip(-normals * 0.5 + 0.5, 0, 1)
    return {"color": np.clip(colors, 0, 1), "normal_color": normal_colors,
            "normals": normals}
