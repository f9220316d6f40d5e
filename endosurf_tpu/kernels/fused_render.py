"""Pallas TPU inference megakernel: the ENTIRE EndoSurf render pipeline —
stratified init, 4 SDF-guided upsample rounds, the full field evaluation
(deform + Jacobian + SDF + gradient + color), and NeuS compositing — as ONE
kernel dispatch per ray block.

This is the serving path (--mode test/demo and in-training eval renders,
reference trainer_endosurf.py:205-283, endosurf.py:60-213): forward-only, so
no residuals constrain VMEM and the whole per-ray state (z lists, per-sample
sdf/rgb/normal/cos lanes) lives on-chip from the first stratified sample to
the composited pixel. Nothing wider than the packed per-ray output ever
touches HBM.

Construction reuses the proven in-kernel pieces:

  * upsampling rounds + lane-layout helpers: kernels/fused_sampler.py
    (bitonic merges and prefix scans on exact pltpu.roll lane shifts,
    chunked in-kernel SDF sweeps);
  * the full field evaluation: kernels/fused_train.py's ``forward_math`` —
    the same hand-laid lane-aligned math the training megakernel runs
    (stacked Jacobian tangents, in-forward SDF adjoint, split-skip color
    MLP), here traced forward-only inside the kernel;
  * compositing: the NeuS alpha/weights math of ops/neus.py (reference
    endosurf.py:171-198) in lane form, transmittance as a Hillis-Steele
    prefix product.

Sample layout: rays on sublanes, samples on lanes ([R_block, 128] tiles).
The final (n0 + n_importance) <= 64 midpoints are evaluated EVAL_GROUP
sample-lanes at a time via one lax.fori_loop — one MLP-eval instance in the
Mosaic program (the unrolled form is a compile-time hazard, see the march
kernel note in fused_sampler.py) with [EVAL_GROUP * R_block, .] matmuls that
keep the MXU fed.

Precision: the upsample rounds run at the SAMPLING precision (bf16 MXU feeds
in the shipping mode — they only pick z locations, models/endosurf.py), the
final field evaluation + composite at the MAIN precision, exactly like the
XLA path's sampling_precision_scope split.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from endosurf_tpu.kernels import fused_train as ft
from endosurf_tpu.kernels.fused_sampler import (
    BIG,
    EVAL_CHUNK,
    LANES,
    _cols_to_lanes,
    _const_specs,
    _eval_lanes,
    _lane_extract,
    _matrix_operands,
    _pad_rows,
    _prefix_prod,
    _ray_buffers,
    _shl,
    _unpack_matrices,
    _upsample_round,
)
from endosurf_tpu.kernels.fused_sdf import build_sdf_eval_operands
from endosurf_tpu.models.fields import EndoSurfSpec

import os as _os

from endosurf_tpu.kernels.fused_sampler import _validate_block_r

BLOCK_R = _validate_block_r(
    _os.environ.get("ESN_RENDER_BLOCK_R", 256))  # rays per grid step
EVAL_GROUP = 8       # sample lanes per in-kernel full-field eval pass

# Cap threaded into the most recent dispatch (see fused_sampler).
LAST_BLOCK_R_CAP = None

_MODE = "auto"       # auto | on | off (set_render_kernel_mode)
_MIN_RAYS = 256


def set_render_kernel_mode(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "on", "off")
    _MODE = mode


def set_block_r(block_r: int) -> None:
    """Override the ray-block size (validated; clears jit caches so
    enclosing-jit traces can't shadow the new value — see
    fused_sampler.set_block_r)."""
    global BLOCK_R
    BLOCK_R = _validate_block_r(block_r)
    jax.clear_caches()


def render_shape_supported(n_samples: int, n_importance: int,
                           n_rounds: int) -> bool:
    """Same lane-budget contract as the upsample kernel, plus the final
    sample count must split into whole EVAL_GROUP chunks."""
    from endosurf_tpu.kernels.fused_sampler import upsample_shape_supported
    if not upsample_shape_supported(n_samples, n_importance, n_rounds):
        return False
    return (n_samples + n_importance) % EVAL_GROUP == 0


def render_kernel_available(n_rays: int) -> bool:
    from endosurf_tpu.kernels.fused_sampler import kernel_gate
    return kernel_gate(_MODE, n_rays, _MIN_RAYS)


def render_mesh(n_rays: int):
    """Mesh to shard_map the render kernel over, or None (same contract as
    fused_sampler.sampler_mesh: params replicated, rays sharded, no
    collectives — rendering is per-ray independent)."""
    from endosurf_tpu.kernels.fused_sampler import kernel_mesh
    return kernel_mesh(_MODE, n_rays, _MIN_RAYS)


# ---------------------------------------------------------------------------
# kernel body
# ---------------------------------------------------------------------------

def _render_kernel(spec, cfg, n_deform, sampling_dtype, counts, eff_def,
                   o3_ref, d3_ref, dp_ref, nf_ref, rc_ref, scal_ref, *refs):
    """One ray block: init z -> upsample rounds -> field eval -> composite.

    Output lanes (out_ref [R, 128]): 0-2 rgb, 3 depth, 4-6 weighted normal,
    7 acc (weight sum), 8 weight_max; rest zero.
    """
    n0, k_new, n_rounds, sample_dist = cfg
    n_sdf_const, n_sdf_layer, n_sel, n_eff, n_mat = counts
    n_final = n0 + k_new * n_rounds

    out_ref = refs[-1]
    pos = 0
    sdf_consts = tuple(r[...] for r in refs[pos:pos + n_sdf_const])
    pos += n_sdf_const
    flat = refs[pos:pos + n_sdf_layer]
    sdf_layers = [(flat[2 * i][...], flat[2 * i + 1][...])
                  for i in range(n_sdf_layer // 2)]
    pos += n_sdf_layer
    sel_names = ("S_d", "k_d", "S_s", "k_s", "S_p", "k_p", "S_r", "k_r")
    sel = {k: refs[pos + i][...] for i, k in enumerate(sel_names)}
    pos += n_sel
    eff_leaves = [r[...] for r in refs[pos:pos + n_eff]]
    pos += n_eff
    misc = _unpack_matrices([r[...] for r in refs[pos:pos + n_mat]])
    iota = misc[0:1, :]

    eff = jax.tree_util.tree_unflatten(eff_def, eff_leaves)

    o3 = o3_ref[...]
    d3 = d3_ref[...]
    dp = dp_ref[...]
    nf = nf_ref[...]
    rc = rc_ref[...]
    scal = scal_ref[...]
    near = _lane_extract(nf, iota, 0)
    far = _lane_extract(nf, iota, 1)
    anneal = _lane_extract(scal, iota, 0)
    s_inv = _lane_extract(scal, iota, 1)
    a = _lane_extract(rc, iota, 0)
    b = _lane_extract(rc, iota, 1)
    c = _lane_extract(rc, iota, 2)

    # --- stratified init (deterministic eval path, endosurf.py:78-82) -----
    frac = iota / float(n0 - 1)
    z = jnp.where(iota < float(n0), near * (1.0 - frac) + far * frac, BIG)

    # --- initial SDF sweep + upsample rounds (sampling precision) ---------
    def _sweep_chunk(ci, sdf_acc):
        base = ci * EVAL_CHUNK
        z_cols = [_lane_extract(z, iota, base + j)
                  for j in range(EVAL_CHUNK)]
        sdf_cols = _eval_lanes(spec, n_deform, sampling_dtype, sdf_consts,
                               sdf_layers, o3, d3, z_cols)
        for j, col in enumerate(sdf_cols):
            sdf_acc = jnp.where(iota == base + j, col, sdf_acc)
        return sdf_acc

    sdf = jax.lax.fori_loop(0, n0 // EVAL_CHUNK, _sweep_chunk,
                            jnp.zeros_like(z))
    if n0 % EVAL_CHUNK:
        lanes = list(range(n0 - n0 % EVAL_CHUNK, n0))
        z_cols = [_lane_extract(z, iota, s) for s in lanes]
        sdf_cols = _eval_lanes(spec, n_deform, sampling_dtype, sdf_consts,
                               sdf_layers, o3, d3, z_cols)
        sdf = _cols_to_lanes(sdf_cols, lanes, iota, sdf)

    for i in range(n_rounds):
        z, sdf = _upsample_round(
            spec, n_deform, sampling_dtype, sdf_consts, sdf_layers,
            misc, o3, d3, a, b, c,
            z, sdf, n0 + i * k_new, k_new, 64.0 * 2 ** i,
            need_new_sdf=(i + 1 < n_rounds))

    # --- section midpoints (render_core, endosurf.py:134-160) -------------
    on = iota < float(n_final)
    z_next = _shl(z, 1, iota)
    dists = jnp.where(iota < float(n_final - 1), z_next - z, sample_dist)
    dists = jnp.where(on, dists, 0.0)
    mid = jnp.where(on, z + dists * 0.5, 0.0)

    # --- full field eval at the midpoints (main precision) ----------------
    # EVAL_GROUP sample lanes per pass; ONE fori_loop instance holds the
    # whole deform+Jacobian+SDF+adjoint+color chain (forward_math).
    r_blk = o3.shape[0]
    zeros = jnp.zeros_like(z)

    def _field_chunk(ci, carry):
        sdf_l, r_l, g_l, b_l, nx_l, ny_l, nz_l, cos_l = carry
        base = ci * EVAL_GROUP
        z_cols = [_lane_extract(mid, iota, base + j)
                  for j in range(EVAL_GROUP)]
        z3 = jnp.stack(z_cols, axis=0)                    # [C, R, 1]
        xt = (o3[None, :, :] + z3 * d3[None, :, :]).reshape(
            EVAL_GROUP * r_blk, LANES)
        dp_t = jnp.broadcast_to(
            dp[None, :, :], (EVAL_GROUP, r_blk, LANES)).reshape(
            EVAL_GROUP * r_blk, LANES)
        out = ft.forward_math(spec, eff, sel, xt, dp_t)
        tc = jnp.sum(dp_t * out["grad_o"], axis=-1, keepdims=True)

        def col3(x):                                       # [CR, k] -> cols
            return x.reshape(EVAL_GROUP, r_blk, -1)

        sdf3 = col3(out["sdf"])
        col = col3(out["color"][:, :3])
        grd = col3(out["grad_o"][:, :3])
        tc3 = col3(tc)
        for j in range(EVAL_GROUP):
            lane = base + j
            sdf_l = jnp.where(iota == lane, sdf3[j][:, :1], sdf_l)
            r_l = jnp.where(iota == lane, col[j][:, 0:1], r_l)
            g_l = jnp.where(iota == lane, col[j][:, 1:2], g_l)
            b_l = jnp.where(iota == lane, col[j][:, 2:3], b_l)
            nx_l = jnp.where(iota == lane, grd[j][:, 0:1], nx_l)
            ny_l = jnp.where(iota == lane, grd[j][:, 1:2], ny_l)
            nz_l = jnp.where(iota == lane, grd[j][:, 2:3], nz_l)
            cos_l = jnp.where(iota == lane, tc3[j][:, :1], cos_l)
        return (sdf_l, r_l, g_l, b_l, nx_l, ny_l, nz_l, cos_l)

    sdf_l, r_l, g_l, b_l, nx_l, ny_l, nz_l, cos_l = jax.lax.fori_loop(
        0, n_final // EVAL_GROUP, _field_chunk, (zeros,) * 8)

    # --- NeuS composite (ops/neus.py; endosurf.py:171-198) ----------------
    iter_cos = -(jnp.maximum(-cos_l * 0.5 + 0.5, 0.0) * (1.0 - anneal)
                 + jnp.maximum(-cos_l, 0.0) * anneal)
    est_next = sdf_l + iter_cos * dists * 0.5
    est_prev = sdf_l - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * s_inv)
    next_cdf = jax.nn.sigmoid(est_next * s_inv)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-6) / (prev_cdf + 1e-6),
                     0.0, 1.0)
    alpha = jnp.where(on, alpha, 0.0)
    trans = _prefix_prod(jnp.where(on, 1.0 - alpha + 1e-7, 1.0), iota)
    trans_excl = jnp.where(iota >= 1, pltpu.roll(trans, 1, 1), 1.0)
    w = alpha * trans_excl

    def wsum(x):
        return jnp.sum(w * x, axis=-1, keepdims=True)

    cols = [wsum(r_l), wsum(g_l), wsum(b_l), wsum(mid),
            wsum(nx_l), wsum(ny_l), wsum(nz_l),
            jnp.sum(w, axis=-1, keepdims=True),
            jnp.max(w, axis=-1, keepdims=True)]
    out_ref[...] = _cols_to_lanes(cols, list(range(len(cols))), iota,
                                  jnp.zeros_like(z))


def fused_render_rays(spec: EndoSurfSpec, params: Dict[str, Any],
                      rays: jnp.ndarray, iter_step: jnp.ndarray,
                      n_samples: int, n_importance: int, n_rounds: int,
                      anneal_end: float,
                      sampling_dtype=jnp.float32,
                      main_dtype=jnp.float32,
                      main_precision: Optional[str] = "highest",
                      interpret: bool = False) -> Dict[str, jnp.ndarray]:
    """Whole-pipeline forward render of a ray batch in one Pallas dispatch.

    Drop-in for the eval/demo consumers of models/endosurf.py::render_rays
    (key=None): returns {"color_map" [R,3], "depth_map" [R,1],
    "normal_map" [R,3], "acc_map" [R,1], "weight_max" [R,1]} — normal_map is
    the weights-weighted observed-space gradient sum that
    evaluation/render_eval.py otherwise assembles from weights+gradients_o.

    Non-jit wrapper: reads BLOCK_R at call time and threads it into the
    jitted impl as a static (round-3 ADVICE staleness fix)."""
    global LAST_BLOCK_R_CAP
    LAST_BLOCK_R_CAP = BLOCK_R
    return _fused_render_rays(spec, params, rays, iter_step, n_samples,
                              n_importance, n_rounds, anneal_end, BLOCK_R,
                              sampling_dtype, main_dtype, main_precision,
                              interpret)


@functools.partial(jax.jit, static_argnames=(
    "spec", "n_samples", "n_importance", "n_rounds", "anneal_end",
    "block_r_cap", "sampling_dtype", "main_dtype", "main_precision",
    "interpret"))
def _fused_render_rays(spec: EndoSurfSpec, params: Dict[str, Any],
                       rays: jnp.ndarray, iter_step: jnp.ndarray,
                       n_samples: int, n_importance: int, n_rounds: int,
                       anneal_end: float, block_r_cap: int,
                       sampling_dtype=jnp.float32,
                       main_dtype=jnp.float32,
                       main_precision: Optional[str] = "highest",
                       interpret: bool = False) -> Dict[str, jnp.ndarray]:
    from endosurf_tpu.models.endosurf import _split_rays, cos_anneal_ratio
    from endosurf_tpu.models.fields import inv_s
    from endosurf_tpu.ops.geometry import ray_sphere_intersection

    assert render_shape_supported(n_samples, n_importance, n_rounds)
    n = rays.shape[0]
    n_final = n_samples + n_importance
    sample_dist = 2.0 / n_samples

    rays_o, rays_d, rays_d_z, t = _split_rays(rays)
    near, far, _ = ray_sphere_intersection(rays_o, rays_d)
    anneal = cos_anneal_ratio(iter_step, anneal_end)
    s_inv_v = inv_s(params)

    block_r = min(block_r_cap, max(8, 1 << (n - 1).bit_length()))
    n_total = ((n + block_r - 1) // block_r) * block_r

    o3, d3, rc = _ray_buffers(rays_o.astype(jnp.float32),
                              rays_d_z.astype(jnp.float32),
                              t.astype(jnp.float32))
    dp = jnp.concatenate(
        [rays_d.astype(jnp.float32),
         jnp.zeros((n, LANES - 3), jnp.float32)], axis=-1)
    nf = jnp.concatenate(
        [near.astype(jnp.float32), far.astype(jnp.float32),
         jnp.zeros((n, LANES - 2), jnp.float32)], axis=-1)
    # Padding rays are all-zero: z init collapses to 0, the field eval stays
    # finite, and the padded outputs are sliced away.
    o3, d3, dp, nf, rc = (_pad_rows(x, n_total)
                          for x in (o3, d3, dp, nf, rc))
    scal = jnp.concatenate(
        [jnp.reshape(anneal.astype(jnp.float32), (1, 1)),
         jnp.reshape(s_inv_v.astype(jnp.float32), (1, 1)),
         jnp.zeros((1, LANES - 2), jnp.float32)], axis=-1)

    # Sampling-path operands (upsample rounds; bf16 feeds in shipping mode).
    sdf_consts, sdf_layers, n_deform = build_sdf_eval_operands(
        spec, params, sampling_dtype)
    # Main-path operands: selectors + effective weights for forward_math.
    # set_compute_mode is a trace-time side effect; the jit cache is keyed
    # by (main_dtype, main_precision) statics, so each mode traces its own
    # program (same pattern as fields._sync_megakernel_precision).
    # Mosaic has no HIGH dot precision (NotImplementedError at lowering);
    # inside the kernel "high" is promoted to "highest" — a strict accuracy
    # superset of the bf16x3 passes the XLA path would run.
    if main_precision == "high":
        main_precision = "highest"
    prev_mode = (ft._COMPUTE_DTYPE, ft._PRECISION)
    ft.set_compute_mode(main_dtype, main_precision)
    try:
        sel_np = ft.selectors(spec)
        sel_arrays = [jnp.asarray(sel_np[k]) for k in
                      ("S_d", "k_d", "S_s", "k_s", "S_p", "k_p",
                       "S_r", "k_r")]
        eff = ft.prepare_effective(spec, params)
        eff_leaves, eff_def = jax.tree_util.tree_flatten(
            jax.tree_util.tree_map(
                lambda a_: a_[None, :] if a_.ndim == 1 else a_, eff))
        mats = _matrix_operands()

        counts = (len(sdf_consts), len(sdf_layers), len(sel_arrays),
                  len(eff_leaves), len(mats))
        grid = (n_total // block_r,)
        row_spec = pl.BlockSpec((block_r, LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        scal_spec = pl.BlockSpec((1, LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs = ([row_spec] * 5 + [scal_spec]
                    + _const_specs(sdf_consts + sdf_layers + sel_arrays
                                   + eff_leaves + mats))
        out = pl.pallas_call(
            functools.partial(
                _render_kernel, spec,
                (n_samples, n_importance // n_rounds, n_rounds,
                 sample_dist),
                n_deform, sampling_dtype, counts, eff_def),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_r, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_total, LANES), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(o3, d3, dp, nf, rc, scal,
          *sdf_consts, *sdf_layers, *sel_arrays, *eff_leaves, *mats)
    finally:
        ft.set_compute_mode(*prev_mode)

    return {
        "color_map": out[:n, 0:3],
        "depth_map": out[:n, 3:4],
        "normal_map": out[:n, 4:7],
        "acc_map": out[:n, 7:8],
        "weight_max": out[:n, 8:9],
    }
