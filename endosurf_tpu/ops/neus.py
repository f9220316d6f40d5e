"""NeuS-style SDF -> opacity math.

Pure-jnp building blocks for the SDF volume renderer. Numerics follow the
reference renderer exactly so trained models are metric-compatible:
  * section-endpoint alpha: /root/reference/src/renderer/endosurf.py:171-188
  * exclusive-cumprod compositing weights: endosurf.py:193
  * SDF-guided importance-sampling weights: endosurf.py:221-266

Everything here is elementwise + scan-free cumprod over the (small, static)
sample axis, so XLA fuses it into the surrounding kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def annealed_iter_cos(true_cos: jnp.ndarray, cos_anneal_ratio: jnp.ndarray) -> jnp.ndarray:
    """Annealed non-positive cosine between view dir and SDF gradient.

    Keeps the cosine "not dead" early in training (endosurf.py:173-176):
    relu(-c/2+0.5) interpolates toward relu(-c) as the ratio goes 0 -> 1.
    """
    return -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )


def neus_alpha(
    sdf: jnp.ndarray,
    iter_cos: jnp.ndarray,
    dists: jnp.ndarray,
    inv_s: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample opacity from SDF section estimates.

    alpha = clip((Phi(prev) - Phi(next) + 1e-6) / (Phi(prev) + 1e-6), 0, 1)
    with Phi = sigmoid(. * inv_s) and prev/next the estimated SDF at the
    section endpoints (endosurf.py:179-188).

    Args:
      sdf: [..., S] SDF at section midpoints.
      iter_cos: [..., S] non-positive annealed cosine (gradient . view dir).
      dists: [..., S] section lengths.
      inv_s: scalar or broadcastable sharpness (1/s).

    Returns: (alpha [..., S], prev_cdf [..., S]).
    """
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-6) / (prev_cdf + 1e-6), 0.0, 1.0)
    return alpha, prev_cdf


def exclusive_cumprod_weights(alpha: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Volume-rendering weights w_i = alpha_i * prod_{j<i} (1 - alpha_j + eps).

    Matches endosurf.py:193 (eps=1e-7) and endonerf.py:182 (eps=1e-10).
    """
    trans = jnp.cumprod(1.0 - alpha + eps, axis=-1)
    # Exclusive shift: transmittance before the first sample is 1.
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    return alpha * trans


def upsample_weights_from_sdf(
    z_vals: jnp.ndarray,
    sdf: jnp.ndarray,
    radius: jnp.ndarray,
    inv_s: float,
) -> jnp.ndarray:
    """Importance weights for SDF-guided ray upsampling at a fixed sharpness.

    Uses the min(cos, prev_cos) robustification from the reference
    (endosurf.py:236-254): taking the more negative of the current/previous
    finite-difference slopes avoids missing thin zero crossings.

    Args:
      z_vals: [R, S] current sample depths (ascending).
      sdf: [R, S] SDF at those samples.
      radius: [R, S] distance of each sample point from the origin (used for
        the inside-unit-sphere gate, endosurf.py:228-229).
      inv_s: fixed sharpness for this upsample round (64 * 2^i).

    Returns: weights [R, S-1] for :func:`endosurf_tpu.ops.pdf.sample_pdf`.
    """
    prev_sdf, next_sdf = sdf[..., :-1], sdf[..., 1:]
    prev_z, next_z = z_vals[..., :-1], z_vals[..., 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-6)
    prev_cos = jnp.concatenate(
        [jnp.zeros_like(cos_val[..., :1]), cos_val[..., :-1]], axis=-1)
    cos_val = jnp.minimum(cos_val, prev_cos)
    inside = (radius[..., :-1] < 1.0) | (radius[..., 1:] < 1.0)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside.astype(cos_val.dtype)

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-6) / (prev_cdf + 1e-6)
    return exclusive_cumprod_weights(alpha)


def merge_sorted_z(
    z_vals: jnp.ndarray,
    new_z: jnp.ndarray,
    sdf: jnp.ndarray,
    new_sdf: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Concatenate and co-sort (z, sdf) sample sets along the sample axis.

    Fixed-shape equivalent of the reference's cat_z_vals gather
    (endosurf.py:268-287).
    """
    z_cat = jnp.concatenate([z_vals, new_z], axis=-1)
    sdf_cat = jnp.concatenate([sdf, new_sdf], axis=-1)
    order = jnp.argsort(z_cat, axis=-1)
    z_sorted = jnp.take_along_axis(z_cat, order, axis=-1)
    sdf_sorted = jnp.take_along_axis(sdf_cat, order, axis=-1)
    return z_sorted, sdf_sorted
