"""Training losses.

EndoSurf's six-term objective (/root/reference/src/trainer/trainer_endosurf.py
:106-162): masked-L1 color, masked-L1 depth gated by the valid depth region,
SDF + angle error at ground-truth depth points, Eikonal error, and the
surface-neighbour normal-consistency regularizer. EndoNeRF's two-term
objective (trainer_endonerf.py:96-139): masked MSE color + masked Huber depth.

All reductions are masked sums over fixed-shape tensors, so the same code runs
replicated or with the ray axis sharded across a device mesh (the global sums
become XLA psums automatically).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def masked_l1(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum |err * mask| / (sum mask + eps) — reference L1 pattern."""
    return jnp.sum(jnp.abs(err * mask)) / (jnp.sum(mask) + 1e-10)


def masked_mse(err: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((err * mask) ** 2) / (jnp.sum(mask) + 1e-10)


def masked_huber(err: jnp.ndarray, mask: jnp.ndarray,
                 delta: float = 0.2) -> jnp.ndarray:
    """Masked Huber matching torch F.huber_loss(reduction='sum')/mask_sum."""
    e = err * mask
    abs_e = jnp.abs(e)
    quad = 0.5 * e ** 2
    lin = delta * (abs_e - 0.5 * delta)
    return jnp.sum(jnp.where(abs_e <= delta, quad, lin)) / (jnp.sum(mask) + 1e-10)


def masked_psnr(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray
                ) -> jnp.ndarray:
    """Masked PSNR (reference trainer/utils.py:340-353)."""
    mask_sum = jnp.sum(mask) + 1e-10
    mse = jnp.sum((a - b) ** 2 * mask) / (mask_sum * 3.0)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def endosurf_loss_terms(
    render_out: Dict[str, jnp.ndarray],
    sdf_err: jnp.ndarray,
    angle_err: jnp.ndarray,
    valid_depth_region: jnp.ndarray,
    surf_neig_err: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
    weights: Dict[str, float],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combine the six EndoSurf loss terms (trainer_endosurf.py:129-162)."""
    color_mask = batch["color_mask"]
    mask = batch["mask"]

    color_loss = masked_l1(render_out["color_map"] - batch["color"], color_mask)
    depth_loss = masked_l1(render_out["depth_map"] - batch["depth"],
                           valid_depth_region * mask)
    eikonal_loss = render_out["gradient_o_error"]

    total = (color_loss * weights["color_loss_weight"]
             + depth_loss * weights["depth_loss_weight"]
             + sdf_err * weights["sdf_loss_weight"]
             + angle_err * weights["angle_loss_weight"]
             + eikonal_loss * weights["eikonal_loss_weight"]
             + surf_neig_err * weights["surf_neig_loss_weight"])

    metrics = {
        "loss_color": color_loss,
        "loss_depth": depth_loss,
        "loss_sdf": sdf_err,
        "loss_angle": angle_err,
        "loss_eikonal": eikonal_loss,
        "loss_surf_neig": surf_neig_err,
        "loss_total": total,
        "psnr_color": masked_psnr(render_out["color_map"], batch["color"],
                                  color_mask),
        "s_val": jnp.mean(render_out["s_val"]),
        "cdf": (jnp.sum(render_out["cdf"][:, :1] * mask)
                / (jnp.sum(mask) + 1e-10)),
        "weight_max": (jnp.sum(render_out["weight_max"] * mask)
                       / (jnp.sum(mask) + 1e-10)),
    }
    return total, metrics


def endonerf_loss_terms(
    render_out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    weights: Dict[str, float],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """EndoNeRF: masked MSE color + Huber(0.2) depth (trainer_endonerf.py:96-139)."""
    color_mask = batch["color_mask"]
    mask = batch["mask"]
    color_loss = masked_mse(render_out["color_map"] - batch["color"], color_mask)
    depth_loss = masked_huber(render_out["depth_map"] - batch["depth"], mask)
    total = (color_loss * weights["color_loss_weight"]
             + depth_loss * weights["depth_loss_weight"])
    metrics = {
        "loss_color": color_loss,
        "loss_depth": depth_loss,
        "loss_total": total,
        "psnr_color": masked_psnr(render_out["color_map"], batch["color"],
                                  color_mask),
    }
    return total, metrics
