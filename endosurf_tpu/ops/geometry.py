"""Ray geometry: camera ray generation and ray/sphere intersection.

Replaces the reference's precomputed [n_frames, H, W, 9] ray tensor
(/root/reference/src/dataset/dataset.py:87-96,216-235) with on-the-fly ray
generation from camera intrinsics/poses — on TPU it is far cheaper to spend a
handful of FLOPs per sampled pixel inside the jitted step than to keep ~750MB
of redundant ray data resident in HBM.

Ray layout contract (kept from the reference, dataset.py:88-96): a ray is 9
floats [o_x,o_y,o_z, d_x,d_y,d_z, near, far, t] with d normalized to unit
length. Renderers divide d by its z-component so that distances along the ray
are camera-z depths (endosurf.py:66).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def rays_from_pixels(
    px: jnp.ndarray,
    py: jnp.ndarray,
    intrinsic_inv: jnp.ndarray,
    pose: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate world-space rays for pixel coordinates.

    Args:
      px, py: [...,] pixel x (column) and y (row) coordinates (float).
      intrinsic_inv: [3, 3] inverse camera intrinsic matrix.
      pose: [4, 4] camera-to-world transform.

    Returns:
      (rays_o, rays_d): each [..., 3]; rays_d unit-normalized
      (matches /root/reference/src/dataset/dataset.py:228-232).
    """
    p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # [..., 3]
    # precision="highest": camera geometry must be exact f32 (direction norms
    # feed depth conventions); these einsums are negligible FLOPs.
    d_cam = jnp.einsum("ij,...j->...i", intrinsic_inv, p, precision="highest")
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    rays_d = jnp.einsum("ij,...j->...i", pose[:3, :3], d_cam,
                        precision="highest")
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d


def ray_sphere_intersection(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    radius: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Analytic intersection of rays with an origin-centered sphere.

    Same math as the reference (/root/reference/src/renderer/utils.py:194-210):
    project the origin onto the ray to find the chord midpoint, then offset by
    the half-chord length. ``near`` clamps at 0 (behind-camera intersections).

    Args:
      rays_o, rays_d: [..., 3]. Directions need not be unit length.
      radius: sphere radius.

    Returns:
      (near, far, hit): each [..., 1]; ``hit`` is a bool mask for rays whose
      line intersects the sphere.
    """
    d_dot_d = jnp.sum(rays_d * rays_d, axis=-1)
    mid = -jnp.sum(rays_d * rays_o, axis=-1) / d_dot_d
    p = rays_o + mid[..., None] * rays_d
    tmp = radius * radius - jnp.sum(p * p, axis=-1)
    hit = tmp > 0.0
    half_chord = jnp.sqrt(jnp.clip(tmp, 0.0, None)) / jnp.sqrt(d_dot_d)
    near = jnp.clip(mid - half_chord, 0.0, None)
    far = mid + half_chord
    return near[..., None], far[..., None], hit[..., None]
