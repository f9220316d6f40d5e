"""Scene dataset: info-pkl loading, device-resident tensors, batch sampling.

Consumes the same preprocessed info-pkl schema as the reference
(/root/reference/src/dataset/dataset.py:22-115 and the preprocess scripts'
output keys at data/endonerf/preprocess.py:118-144): per-frame world matrices,
a scene-to-unit-sphere scale matrix, color/depth/mask image paths, depth
normalization, train/test splits, and per-frame bounding boxes.

TPU re-design vs the reference:
  * no precomputed [n_frames, H, W, 9] ray tensor — rays are generated inside
    the jitted step from K^-1/pose (see endosurf_tpu.ops.geometry), saving
    ~750MB of HBM on a typical scene;
  * pixel sampling is a jit-compatible inverse-CDF draw over a precomputed
    per-frame weight map (mask-guided importance sampling of dataset.py:
    135-142, with-replacement statistical parity);
  * images load once to host numpy, then ship to device as one struct of
    arrays.
"""

from __future__ import annotations

import dataclasses
import os.path as osp
import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from endosurf_tpu.native.meshops import alias_table as native_alias_table
from endosurf_tpu.ops.geometry import rays_from_pixels
from endosurf_tpu.ops.pdf import sample_from_alias, sample_from_cdf


def decompose_projection(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split P = K [R|t] into intrinsics and camera-to-world pose.

    Equivalent to the reference's cv2.decomposeProjectionMatrix usage
    (dataset.py:312-335) via RQ decomposition with positive-diagonal K.
    """
    import scipy.linalg
    M = P[:3, :3]
    K, R = scipy.linalg.rq(M)
    # Fix signs so K has a positive diagonal.
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1.0
    S = np.diag(signs)
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        K, R = -K, -R
    t_w2c = np.linalg.solve(K, P[:3, 3])
    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float64)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float64)
    pose[:3, :3] = R.T
    pose[:3, 3] = -R.T @ t_w2c
    return intrinsics.astype(np.float32), pose.astype(np.float32)


def _imread(path: str) -> np.ndarray:
    import imageio.v2 as iio
    return np.asarray(iio.imread(path))


def _load_images(paths: Sequence[str], kind: str,
                 disp_const: Optional[Sequence[float]] = None) -> np.ndarray:
    """Load a stack of images (dataset.py:276-310 semantics)."""
    out = []
    for i, p in enumerate(paths):
        img = _imread(p)
        if kind == "color":
            arr = img[..., :3].astype(np.float32) / 255.0
        elif kind == "depth":
            arr = img.astype(np.float32)[..., None]
        elif kind == "disp":
            disp = img.astype(np.float32)
            arr = np.zeros_like(disp)
            nz = disp != 0
            arr[nz] = disp_const[i] / disp[nz]
            arr = arr[..., None]
        elif kind == "mask":
            arr = (img.astype(np.float32) / 255.0)[..., None]
        elif kind == "mask_invert":
            arr = (1.0 - img.astype(np.float32) / 255.0)[..., None]
        else:
            raise ValueError(f"unknown image kind {kind!r}")
        out.append(arr)
    return np.stack(out, axis=0)


@dataclasses.dataclass
class SceneData:
    """Host-side scene container with device tensors in ``device_arrays``."""

    dset_name: str
    scene_name: str
    n_frames: int
    h: int
    w: int
    depth_scale: float
    near: float
    far: float
    list_train: np.ndarray
    list_test: np.ndarray
    bbox_minmax: np.ndarray          # [n, 3, 2]
    intrinsics: np.ndarray           # [n, 4, 4]
    poses: np.ndarray                # [n, 4, 4]
    device_arrays: Dict[str, jnp.ndarray]

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @staticmethod
    def load(info_path: str, normalize_time: bool = True,
             base_dir: Optional[str] = None) -> "SceneData":
        """Load a preprocessed scene from an info pkl."""
        assert osp.exists(info_path), (
            f"Info file {info_path} does not exist — preprocess the dataset "
            f"first (see endosurf_tpu/data/preprocess_*.py)")
        with open(info_path, "rb") as f:
            info = pickle.load(f)
        base = base_dir or ""

        def fix(paths):
            return [p if osp.isabs(p) or not base else osp.join(base, p)
                    for p in paths]

        n_frames = info["n_frames"]
        scale_mat = np.asarray(info["scale_mat"], np.float64)
        world_mat = np.asarray(info["world_mat"], np.float64)
        intrinsics, poses = [], []
        for i in range(n_frames):
            P = (world_mat[i] @ scale_mat)[:3, :4]
            K, pose = decompose_projection(P)
            intrinsics.append(K)
            poses.append(pose)
        intrinsics = np.stack(intrinsics)
        poses = np.stack(poses)

        colors = _load_images(fix(info["color"]), "color")
        depth_type = info["depth_type"]
        if depth_type == "depth":
            depths = _load_images(fix(info["depth"]), "depth")
        elif depth_type == "disp":
            depths = _load_images(fix(info["depth"]), "disp",
                                  disp_const=info["disp_const"])
        else:
            raise ValueError(f"unknown depth type {depth_type!r}")
        depth_scale = float(info["depth_norm_scale"])
        depths = depths / depth_scale

        mask_type = info.get("mask_type")
        if mask_type is not None:
            color_masks = _load_images(fix(info["mask"]), mask_type)
        else:
            color_masks = np.ones_like(depths)

        return SceneData.from_arrays(
            dset_name=info["dset_name"], scene_name=info["scene_name"],
            colors=colors, depths=depths, color_masks=color_masks,
            intrinsics=intrinsics, poses=poses,
            bounds=np.asarray(info["bounds"], np.float32) / depth_scale,
            bbox_minmax=np.asarray(info["bbox_minmax"], np.float32),
            list_train=np.asarray(info["list_train"], np.int32),
            list_test=np.asarray(info["list_test"], np.int32),
            depth_scale=depth_scale, normalize_time=normalize_time)

    @staticmethod
    def from_arrays(dset_name: str, scene_name: str, colors: np.ndarray,
                    depths: np.ndarray, color_masks: np.ndarray,
                    intrinsics: np.ndarray, poses: np.ndarray,
                    bounds: np.ndarray, bbox_minmax: np.ndarray,
                    list_train: np.ndarray, list_test: np.ndarray,
                    depth_scale: float,
                    normalize_time: bool = True) -> "SceneData":
        n_frames, h, w = colors.shape[:3]

        # Depth-validity band from global percentiles (dataset.py:75-77).
        near = float(np.percentile(depths, 3.0))
        far = float(np.percentile(depths, 99.5))
        depth_masks = ((depths > near) & (depths < far)).astype(np.float32)
        masks = depth_masks * color_masks

        # Mask-guided ray-importance map (dataset.py:260-266): pixels that
        # are often occluded across frames get upweighted when visible.
        freq = (1.0 - masks).sum(0)
        p = freq / np.sqrt((freq ** 2).sum() + 1e-12)
        importance = masks * (1.0 + p)
        # Effective per-pixel sampling weight, folding in the reference's
        # color-mask pre-filter and the +1e-5 floor (dataset.py:134,243).
        sample_w = (color_masks * (importance + 1e-5)).reshape(n_frames, -1)
        uniform_w = color_masks.reshape(n_frames, -1)

        def norm_cdf(w):
            cdf = np.cumsum(w + 1e-12, axis=-1)
            return (cdf / cdf[:, -1:]).astype(np.float32)

        if normalize_time:
            ts = np.linspace(0.0, 1.0, n_frames, dtype=np.float32)
        else:
            ts = np.arange(n_frames, dtype=np.float32)

        intrinsics_inv = np.linalg.inv(intrinsics[:, :3, :3]).astype(np.float32)

        device_arrays = {
            "colors": jnp.asarray(colors, jnp.float32),
            "depths": jnp.asarray(depths, jnp.float32),
            "masks": jnp.asarray(masks, jnp.float32),
            "color_masks": jnp.asarray(color_masks, jnp.float32),
            "depth_masks": jnp.asarray(depth_masks, jnp.float32),
            "sample_w": jnp.asarray(sample_w, jnp.float32),
            "uniform_w": jnp.asarray(uniform_w, jnp.float32),
            # Precomputed pixel-sampling CDFs: turns per-step sampling into
            # log2(H*W) binary-search gathers instead of a cumsum + compare.
            "sample_cdf": jnp.asarray(norm_cdf(sample_w)),
            "uniform_cdf": jnp.asarray(norm_cdf(uniform_w)),
            # Walker/Vose alias tables over the same weights (native O(n)
            # build): identical categorical distribution, O(1) per draw —
            # see ops/pdf.py::sample_from_alias and train.pixel_sampler.
            **dict(zip(("sample_alias_prob", "sample_alias_idx"),
                       map(jnp.asarray, native_alias_table(sample_w)))),
            **dict(zip(("uniform_alias_prob", "uniform_alias_idx"),
                       map(jnp.asarray, native_alias_table(uniform_w)))),
            "intrinsics_inv": jnp.asarray(intrinsics_inv),
            "poses": jnp.asarray(poses, jnp.float32),
            "bounds": jnp.asarray(bounds, jnp.float32),
            "ts": jnp.asarray(ts),
            "list_train": jnp.asarray(list_train, jnp.int32),
        }
        return SceneData(
            dset_name=dset_name, scene_name=scene_name, n_frames=n_frames,
            h=h, w=w, depth_scale=depth_scale, near=near, far=far,
            list_train=np.asarray(list_train), list_test=np.asarray(list_test),
            bbox_minmax=np.asarray(bbox_minmax),
            intrinsics=intrinsics, poses=poses, device_arrays=device_arrays)


    # ------------------------------------------------------------------
    # debugging
    # ------------------------------------------------------------------

    def export_debug_geometry(self, out_dir: str,
                              downsample: float = 0.1) -> None:
        """Write scene geometry to PLYs for external inspection.

        Non-interactive equivalent of the reference's Open3D vis_dataset
        (dataset.py:182-214): merged RGBD point cloud, camera centers, and a
        unit-sphere shell, each as a PLY viewable in MeshLab etc.
        """
        import os

        from endosurf_tpu.evaluation.geometry3d import rgbd_to_pointcloud
        from endosurf_tpu.utils.ply import write_ply

        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.default_rng(0)
        pts_all, col_all = [], []
        colors = np.asarray(self.device_arrays["colors"])
        depths = np.asarray(self.device_arrays["depths"])
        for i in range(self.n_frames):
            pts, col = rgbd_to_pointcloud(
                colors[i], depths[i], self.intrinsics[i][:3, :3],
                self.poses[i], self.far)
            keep = rng.uniform(size=len(pts)) < downsample
            pts_all.append(pts[keep])
            col_all.append(col[keep])
        write_ply(osp.join(out_dir, "pointcloud.ply"),
                  np.concatenate(pts_all), colors=np.concatenate(col_all))
        cams = self.poses[:, :3, 3]
        cam_col = np.zeros((len(cams), 3), np.float32)
        cam_col[:, 0] = 1.0
        write_ply(osp.join(out_dir, "cameras.ply"), cams, colors=cam_col)
        u = np.linspace(0, np.pi, 32)
        v = np.linspace(0, 2 * np.pi, 64)
        uu, vv = np.meshgrid(u, v)
        sphere = np.stack([np.sin(uu) * np.cos(vv), np.sin(uu) * np.sin(vv),
                           np.cos(uu)], -1).reshape(-1, 3)
        write_ply(osp.join(out_dir, "unit_sphere.ply"),
                  sphere.astype(np.float32))


# ---------------------------------------------------------------------------
# jit-side sampling / ray construction
# ---------------------------------------------------------------------------

def sample_train_batch(arrays: Dict[str, jnp.ndarray], h: int, w: int,
                       key: jax.Array, ray_batch: int,
                       mask_guided: bool = True,
                       pixel_sampler: str = "cdf") -> Dict[str, jnp.ndarray]:
    """Draw one training batch: a random train frame + importance pixels.

    Jit-compatible equivalent of the reference sampler (dataset.py:117-161).
    Returns rays [B,9] plus per-ray supervision tensors.

    pixel_sampler selects HOW the importance-weighted pixel indices are
    drawn (identical categorical distribution either way):
      "cdf"   — binary search over the precomputed CDF (log2(H*W) gather
                rounds per batch);
      "alias" — Walker/Vose alias table (two O(1) gathers per ray).
    The PRNG streams differ, so individual draws (and loss tracks) are not
    bit-equal across the two settings.
    """
    k_frame, k_pix = jax.random.split(key)
    list_train = arrays["list_train"]
    fid = list_train[jax.random.randint(k_frame, (), 0, list_train.shape[0])]

    if pixel_sampler == "alias":
        kind = "sample" if mask_guided else "uniform"
        pix = sample_from_alias(arrays[f"{kind}_alias_prob"][fid],
                                arrays[f"{kind}_alias_idx"][fid],
                                ray_batch, k_pix)  # [B] flat indices
    elif pixel_sampler == "cdf":
        cdf = (arrays["sample_cdf"]
               if mask_guided else arrays["uniform_cdf"])[fid]
        pix = sample_from_cdf(cdf, ray_batch, k_pix)  # [B] flat indices
    else:
        raise ValueError(f"unknown pixel_sampler: {pixel_sampler!r}")

    py = (pix // w).astype(jnp.float32)
    px = (pix % w).astype(jnp.float32)
    rays_o, rays_d = rays_from_pixels(
        px, py, arrays["intrinsics_inv"][fid], arrays["poses"][fid])

    def gather(name):
        return arrays[name][fid].reshape(h * w, -1)[pix]

    n_rays = ray_batch
    bounds = jnp.broadcast_to(arrays["bounds"][fid][None, :], (n_rays, 2))
    t = jnp.full((n_rays, 1), arrays["ts"][fid])
    rays = jnp.concatenate([rays_o, rays_d, bounds, t], axis=-1)
    return {
        "rays": rays,
        "color": gather("colors"),
        "depth": gather("depths"),
        "mask": gather("masks"),
        "color_mask": gather("color_masks"),
        "depth_mask": gather("depth_masks"),
        "frame_id": fid,
    }


def frame_rays(arrays: Dict[str, jnp.ndarray], h: int, w: int,
               fid) -> jnp.ndarray:
    """Full-frame [H, W, 9] ray tensor for eval/demo rendering."""
    py, px = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    rays_o, rays_d = rays_from_pixels(
        px, py, arrays["intrinsics_inv"][fid], arrays["poses"][fid])
    bounds = jnp.broadcast_to(arrays["bounds"][fid], (h, w, 2))
    t = jnp.full((h, w, 1), arrays["ts"][fid])
    return jnp.concatenate([rays_o, rays_d, bounds, t], axis=-1)


# ---------------------------------------------------------------------------
# synthetic scenes (tests / benchmarks; no real capture data required)
# ---------------------------------------------------------------------------

def make_synthetic_arrays(n_frames: int = 4, h: int = 16, w: int = 16,
                          seed: int = 0) -> "SceneData":
    """In-memory random-content SceneData (no file IO) for dry runs and
    throughput benchmarks where image content is irrelevant."""
    rng = np.random.default_rng(seed)
    colors = rng.uniform(0, 1, (n_frames, h, w, 3)).astype(np.float32)
    depths = rng.uniform(1.4, 2.4, (n_frames, h, w, 1)).astype(np.float32)
    color_masks = np.ones((n_frames, h, w, 1), np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.8 * w
    K[0, 2], K[1, 2] = w / 2, h / 2
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    ids = np.arange(n_frames)
    return SceneData.from_arrays(
        dset_name="synthetic", scene_name="arrays",
        colors=colors, depths=depths, color_masks=color_masks,
        intrinsics=np.tile(K, (n_frames, 1, 1)),
        poses=np.tile(pose, (n_frames, 1, 1)),
        bounds=np.tile(np.array([1.0, 3.0], np.float32), (n_frames, 1)),
        bbox_minmax=np.tile(
            np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32),
            (n_frames, 1, 1)),
        list_train=ids[:-1], list_test=ids[-1:], depth_scale=100.0)


def _orbit_pose(t_norm: float, orbit_deg: float,
                dist: float = 2.0) -> np.ndarray:
    """Camera-to-world pose on a look-at orbit around the origin.

    Azimuth sweeps +-orbit_deg (and elevation +-orbit_deg/2) over the
    sequence; orbit_deg=0 reduces exactly to the fixed camera at (0,0,-dist)
    with identity rotation. Columns of R are the camera axes (x right,
    y down, z forward — the image convention of rays_from_pixels).
    """
    az = np.radians(orbit_deg) * np.sin(2 * np.pi * t_norm)
    el = np.radians(0.5 * orbit_deg) * np.cos(2 * np.pi * t_norm)
    C = dist * np.array([np.sin(az) * np.cos(el), np.sin(el),
                         -np.cos(az) * np.cos(el)])
    z_cam = -C / np.linalg.norm(C)
    x_cam = np.cross([0.0, 1.0, 0.0], z_cam)
    x_cam = x_cam / np.linalg.norm(x_cam)
    y_cam = np.cross(z_cam, x_cam)
    pose = np.eye(4)
    pose[:3, :3] = np.stack([x_cam, y_cam, z_cam], axis=1)
    pose[:3, 3] = C
    return pose


def make_synthetic_scene(out_dir: str, n_frames: int = 8, h: int = 48,
                         w: int = 64, deform_amp: float = 0.1,
                         seed: int = 0, orbit_deg: float = 0.0) -> str:
    """Generate a synthetic pulsating-sphere scene in the info-pkl schema.

    Writes color PNGs, float32 TIFF depths, mask PNGs, and an info pkl, then
    returns the pkl path. The scene: a Lambertian sphere of radius
    0.5*(1 + deform_amp*sin(2 pi t)) at the origin, observed from distance 2.
    With orbit_deg=0 the camera is fixed at z=-2 looking down +z; with
    orbit_deg>0 it orbits a +-orbit_deg look-at arc (multi-view supervision,
    which the SDF needs for a well-conditioned mesh — single-viewpoint
    training collapses the zero set to a thin fragmenting crust; see
    VALIDATION.md). Depth images are metric (mm-like) with
    depth_norm_scale=100 so the normalized scene sits inside the unit sphere.
    """
    import os

    import imageio.v2 as iio

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    fx = fy = 0.8 * w
    cx, cy = w / 2.0, h / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    depth_norm_scale = 100.0

    world_mats, colors, depths, masks, bboxes, bounds = [], [], [], [], [], []
    # Integer pixel coordinates: the ray convention (geometry.rays_from_pixels
    # / reference dataset.py:223-228) shoots rays through integer coords.
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    dirs_cam = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)

    for i in range(n_frames):
        t_norm = i / max(n_frames - 1, 1)
        radius = 0.5 * (1.0 + deform_amp * np.sin(2 * np.pi * t_norm))
        pose = _orbit_pose(t_norm, orbit_deg)
        R, o = pose[:3, :3], pose[:3, 3]
        w2c = np.linalg.inv(pose)
        # Analytic ray-sphere in world space: o = camera center, unit d.
        d = dirs_cam @ R.T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        b = np.sum(d * o, -1)
        c = np.sum(o * o) - radius ** 2
        disc = b ** 2 - c
        hit = disc > 0
        t_hit = -b - np.sqrt(np.maximum(disc, 0.0))
        pts = o + t_hit[..., None] * d
        # Depth images are WORLD-z depth: the 9-float ray contract divides
        # directions by their world z-component (endosurf.py:66 — its real
        # cameras are near-axis-aligned so world-z == camera-z there); the
        # orbit cameras here stay within that convention's validity as long
        # as every pixel ray keeps a positive world-z component.
        z_depth = np.where(hit, pts[..., 2] - o[2], 3.0)  # background at z=3
        assert (d[..., 2] > 0.05).all(), (
            "orbit too wide for the world-z depth convention")

        normal = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True),
                                  1e-6)
        lam = np.clip(-np.sum(normal * d, -1), 0, 1)
        base = 0.5 + 0.5 * np.sin(6 * pts[..., 0]) * np.cos(6 * pts[..., 1])
        col = np.stack([lam * base, lam * (1 - base), 0.3 + 0.7 * lam], -1)
        col = np.where(hit[..., None], col, 0.05)

        # A drifting rectangular "tool" occlusion, like the reference's
        # surgical-tool masks.
        mask = np.ones((h, w), np.float32)
        x0 = int((0.2 + 0.5 * t_norm) * w)
        mask[h // 3: h // 2, x0: x0 + w // 6] = 0.0

        world_mats.append(K @ w2c[:3, :4])
        colors.append((np.clip(col, 0, 1) * 255).astype(np.uint8))
        depths.append((z_depth * depth_norm_scale).astype(np.float32))
        masks.append((mask * 255).astype(np.uint8))
        pad = 0.05
        pts_box = pts[hit] if hit.any() else pts.reshape(-1, 3)
        bboxes.append(np.stack([pts_box.min(0) - pad,
                                pts_box.max(0) + pad], -1))
        z_near = z_depth[hit].min() if hit.any() else z_depth.min()
        bounds.append(np.array([z_near, z_depth.max()]) * depth_norm_scale)

    color_paths, depth_paths, mask_paths = [], [], []
    for i in range(n_frames):
        cp = osp.join(out_dir, f"color_{i:03d}.png")
        dp = osp.join(out_dir, f"depth_{i:03d}.tiff")
        mp = osp.join(out_dir, f"mask_{i:03d}.png")
        iio.imwrite(cp, colors[i])
        iio.imwrite(dp, depths[i])
        iio.imwrite(mp, masks[i])
        color_paths.append(cp)
        depth_paths.append(dp)
        mask_paths.append(mp)

    world_mat4 = np.zeros((n_frames, 4, 4))
    world_mat4[:, :3, :4] = np.stack(world_mats)
    world_mat4[:, 3, 3] = 1.0
    ids = np.arange(n_frames)
    info = {
        "dset_name": "synthetic",
        "scene_name": "pulsating_sphere",
        "n_frames": n_frames,
        "wh": [w, h],
        "world_mat": world_mat4,
        "scale_mat": np.eye(4),
        "color": color_paths,
        "depth": depth_paths,
        "depth_type": "depth",
        "mask": mask_paths,
        "mask_type": "mask",
        "depth_norm_scale": depth_norm_scale,
        "bounds": np.stack(bounds),
        "bbox_minmax": np.stack(bboxes),
        "list_train": ids[ids % 4 != 3],
        "list_test": ids[ids % 4 == 3],
    }
    pkl_path = osp.join(out_dir, "info.pkl")
    with open(pkl_path, "wb") as f:
        pickle.dump(info, f)
    return pkl_path
