"""Pallas TPU sampler megakernels: whole-loop SDF-guided upsampling and
sphere-trace ray marching, each as ONE kernel dispatch per ray batch.

Motivation (VALIDATION.md step attribution): the sampling stages cost
~14 ms of the ~30 ms flagship train step — 4 upsample rounds (8.1 ms) and
the 128-step ray march + secant (~6 ms) — and about half of the serving
(eval render) path. Their SDF evaluations already ride the fused Pallas
evaluator (kernels/fused_sdf.py), but every round still crosses the
kernel/XLA boundary for the glue math (NeuS importance weights, inverse-CDF
draws, sorted merges, argmin/secant logic), all of it lane-unfriendly
small-tensor work. These kernels run the ENTIRE loop in VMEM:

  * fused_upsample_z — replaces models/endosurf.py::upsample_z
    (reference endosurf.py:85-110, 221-287): n_rounds x (SDF eval at new
    samples -> importance weights -> deterministic inverse-CDF draws ->
    sorted merge), emitting the final sorted z_vals.
  * fused_ray_march — replaces models/endosurf.py::ray_march
    (reference endosurf.py:344-449): 128-sample SDF scan, first
    +- crossing selection, and 8 secant refinements, emitting
    (depth, valid).

Layout: rays live on the SUBLANE axis, samples on the LANE axis (one
[R_block, 128] tile per quantity). TPU-hostile ops are reformulated:

  * cumsum/cumprod   -> Hillis-Steele prefix scans (7 shift-add/multiply
                        stages on exact pltpu.roll lane shifts)
  * lane shifts      -> pltpu.roll (exact; matmuls with constant shift
                        matrices quantized values to bf16 — see
                        _unpack_matrices)
  * searchsorted     -> masked compare + lane-reduce (ops/pdf.py already
                        uses this form; here it stays in VMEM)
  * gather           -> one-hot lane mask + lane-reduce
  * sorted merge     -> 6-stage bitonic MERGE network: the running z list
                        is ascending with +BIG sentinels on top, the k new
                        samples are written REVERSED into the top lanes
                        (ascending ++ BIG ++ descending == bitonic), then
                        compare-exchange stages d = 32..1 sort 64 lanes.
                        sdf values ride along via the exchange decisions.

The per-sample SDF evaluations reuse kernels/fused_sdf.py's in-kernel
evaluator: sample columns are lifted to a [C, R, 128] (x, t) buffer by a
rank-3 broadcast (x = o + z * d_z), the leading dims merge into sublanes
(relayout-free), and the chain runs as [C*R, 128] @ [128, 256] matmuls.

Tie-breaking note: merge_sorted_z (argsort, stable) and the bitonic
network order EQUAL z values differently; both keep (z, sdf) pairs
consistent, so downstream section math only differs on measure-zero
inputs.

Both kernels are forward-only by design — every consumer runs under
stop_gradient (models/endosurf.py render_rays / surface_neighbour_error).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from endosurf_tpu.kernels.fused_sdf import (
    build_sdf_eval_operands,
    eval_sdf_inline,
)
from endosurf_tpu.models.fields import EndoSurfSpec

import os as _os

def _validate_block_r(block_r: int) -> int:
    """Mosaic f32 tiling wants (block_r, 128) blocks with block_r a
    positive multiple of 8; catch bad values here instead of deep inside
    a Pallas lowering error."""
    block_r = int(block_r)
    assert block_r >= 8 and block_r % 8 == 0, (
        f"block_r must be a positive multiple of 8, got {block_r}")
    return block_r


# Rays per grid step. The train megakernels won at larger blocks
# (fused_train_pallas 256->1024 cut the step 26.6->23.3 ms); sweepable
# here via env or set_block_r so a one-process step-level A/B can decide
# (isolated kernel timings on the tunnel are unreliable — CLAUDE.md).
BLOCK_R = _validate_block_r(_os.environ.get("ESN_SAMPLER_BLOCK_R", 256))
EVAL_CHUNK = 8         # sample lanes evaluated per in-kernel MLP pass
BIG = 1.0e9            # +inf stand-in for unfilled sample lanes
LANES = 128

# Cap threaded into the most recent kernel dispatch (a jit STATIC, so the
# executed program is guaranteed compiled with it) — lets tests assert the
# override really took effect instead of passing vacuously on a stale trace.
LAST_BLOCK_R_CAP = None

_MODE = "auto"         # auto | on | off (set_sampler_kernel_mode)
# The march kernel keeps its own gate (it briefly shipped opt-in when its
# unrolled form cost Mosaic 40+ min of compile per program; the fori_loop
# form compiles in ~15 s and beats the XLA stage 4.0 vs 4.6 ms —
# logs/r3_bench_sampler_v2.log — so "auto" engages it again).
_MARCH_MODE = "auto"   # auto | on | off (set_march_kernel_mode)
_MIN_RAYS = 256


def set_sampler_kernel_mode(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "on", "off")
    _MODE = mode


def set_block_r(block_r: int) -> None:
    """Override the ray-block size.

    block_r is threaded into the kernel entry points as a jit-static
    argument by thin non-jit wrappers that read the module global at CALL
    time, so direct calls always honor the setter. Calls nested inside an
    ENCLOSING jit bake the value in at the enclosing trace — clear_caches()
    purges those so a sweep (tools/sweep_blocks_r3c.py) really re-times
    each setting instead of replaying the first trace (round-3 ADVICE)."""
    global BLOCK_R
    BLOCK_R = _validate_block_r(block_r)
    jax.clear_caches()


def set_march_kernel_mode(mode: str) -> None:
    global _MARCH_MODE
    assert mode in ("auto", "on", "off")
    _MARCH_MODE = mode


def _march_enabled() -> bool:
    if _MARCH_MODE == "off":
        return False
    return True


def march_kernel_available(n_rays: int) -> bool:
    return _march_enabled() and sampler_kernel_available(n_rays)


def march_sampler_mesh(n_rays: int):
    return sampler_mesh(n_rays) if _march_enabled() else None


def upsample_shape_supported(n0: int, n_importance: int,
                             n_rounds: int) -> bool:
    """The in-kernel merge covers <= 64 samples with <= 8 new per round."""
    if n_rounds <= 0 or n_importance % n_rounds != 0:
        return False
    k = n_importance // n_rounds
    return 0 < k <= 8 and n0 + n_importance <= 64


def kernel_gate(mode: str, n_rays: int, min_rays: int) -> bool:
    """Shared single-device dispatch gate for the per-ray Pallas kernels
    (sampler, march, whole-pipeline render): engage on TPU backends at
    >= min_rays, 'on' forces (tests/interpret), mesh runs are bounced to
    the shard_map path (pallas_call has no GSPMD partitioning rule)."""
    if mode == "off":
        return False
    from endosurf_tpu.parallel.mesh import mesh_active
    if mesh_active():
        return False
    if mode == "on":
        return True
    if n_rays < min_rays:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def kernel_mesh(mode: str, n_rays: int, min_rays: int):
    """Mesh to shard_map a per-ray kernel over, or None.

    Same contract as fields._megakernel_mesh: params replicated, rays
    sharded on axis 0 (the kernels are per-ray independent — no
    collectives). Requires an even split; per-device shards must still
    clear the kernel gate unless the mode is forced 'on' (tests)."""
    if mode == "off":
        return None
    from endosurf_tpu.parallel.mesh import current_mesh, mesh_active
    if not mesh_active():
        return None
    mesh = current_mesh()
    if mesh is None or n_rays % mesh.size != 0:
        return None
    if mode == "on":
        return mesh
    if n_rays // mesh.size < min_rays:
        return None
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:
        return None
    return mesh


def sampler_kernel_available(n_rays: int) -> bool:
    return kernel_gate(_MODE, n_rays, _MIN_RAYS)


def sampler_mesh(n_rays: int):
    return kernel_mesh(_MODE, n_rays, _MIN_RAYS)


# ---------------------------------------------------------------------------
# constant operands
# ---------------------------------------------------------------------------

_BITONIC_DS = (32, 16, 8, 4, 2, 1)        # 64-lane merge window stages
_SHL_DS = (64,) + _BITONIC_DS             # packed shifts (128-lane merge adds d=64)
_SCAN_DS = (1, 2, 4, 8, 16, 32, 64)


@functools.lru_cache(maxsize=None)
def _np_consts() -> Dict[str, np.ndarray]:
    n = LANES
    iota = np.arange(n, dtype=np.float32)[None, :]
    lin = (iota / (n - 1)).astype(np.float32)
    arange_rev = np.arange(n, 0, -1, dtype=np.float32)[None, :]
    misc = [iota, lin, arange_rev]
    for d in _SHL_DS[::-1]:                      # rows 3.. d=1,2,..,64
        misc.append(((np.arange(n) % (2 * d)) < d).astype(np.float32)[None])
    return {"misc": np.concatenate(misc, axis=0)}          # [10, 128]


def _matrix_operands() -> List[jnp.ndarray]:
    return [jnp.asarray(_np_consts()["misc"])]


def _unpack_matrices(vals: Sequence[jnp.ndarray]):
    """Kept for call-site symmetry: the lane machinery now runs on exact
    ``pltpu.roll`` shifts instead of matmuls with constant shift/triangular
    matrices. The matmul form quantized the shifted VALUES: Mosaic's default
    dot precision is one bf16 pass (~0.4% relative rounding) — catastrophic
    for tightly-spaced depth samples (neighbouring z collapse to equal,
    section widths cancel to noise, per-lane-rounded prefix sums go
    non-monotonic; observed as the fine-resample kernel extrapolating draws
    far outside the bin range, logs/tpu_resample_diag.log), and requesting
    HIGHEST made the biggest kernel fail to compile. Rolls are exact, need
    no MXU passes, and drop ~1 MB of constant operands."""
    return vals[0]


def _shl(x: jnp.ndarray, d: int, iota: jnp.ndarray) -> jnp.ndarray:
    """y[:, j] = x[:, j + d] (zeros shifted in). Exact."""
    return jnp.where(iota < float(LANES - d),
                     pltpu.roll(x, LANES - d, 1), 0.0)


def _shr(x: jnp.ndarray, d: int, iota: jnp.ndarray) -> jnp.ndarray:
    """y[:, j] = x[:, j - d] (zeros shifted in). Exact."""
    return jnp.where(iota >= float(d), pltpu.roll(x, d, 1), 0.0)


# ---------------------------------------------------------------------------
# in-kernel helpers (operate on loaded VMEM values)
# ---------------------------------------------------------------------------

def _lane_extract(x: jnp.ndarray, iota: jnp.ndarray, k) -> jnp.ndarray:
    """[R, 128] -> [R, 1]: value at lane k (k: python int or [R, 1])."""
    return jnp.sum(jnp.where(iota == k, x, 0.0), axis=-1, keepdims=True)


def _eval_lanes(spec, n_deform, compute_dtype, consts, layers,
                o3, d3, z_cols: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """SDF at per-ray depths. z_cols: C x [R, 1] -> C x [R, 1] sdf columns.

    Builds the (x, t) buffer by rank-3 broadcast (x = o + z * d_z; lane 3
    carries t via o3 and d3's zero lane), merges [C, R, 128] -> [C*R, 128]
    (relayout-free leading-dim fold), and runs one fused MLP chain.
    """
    cc = len(z_cols)
    r = o3.shape[0]
    z3 = jnp.stack(z_cols, axis=0)                      # [C, R, 1]
    xt3 = o3[None, :, :] + z3 * d3[None, :, :]          # [C, R, 128]
    xt = xt3.reshape(cc * r, LANES)
    sdf = eval_sdf_inline(spec, n_deform, compute_dtype, xt, consts, layers)
    sdf3 = sdf.reshape(cc, r, 1)
    return [sdf3[i] for i in range(cc)]


def _cols_to_lanes(cols: List[jnp.ndarray], lanes: Sequence[int],
                   iota: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Write [R, 1] columns into the given lanes of ``base`` [R, 128]."""
    out = base
    for col, lane in zip(cols, lanes):
        out = jnp.where(iota == lane, col, out)
    return out


def _prefix_prod(x: jnp.ndarray, iota) -> jnp.ndarray:
    """Inclusive prefix product along lanes (Hillis-Steele, 7 steps)."""
    p = x
    for d in _SCAN_DS:
        pd = jnp.where(iota >= float(d), pltpu.roll(p, d, 1), 1.0)
        p = p * pd
    return p


def _prefix_sum_excl(x: jnp.ndarray, iota) -> jnp.ndarray:
    """EXCLUSIVE prefix sum along lanes: y[j] = sum_{k < j} x[k]."""
    p = x
    for d in _SCAN_DS:
        p = p + jnp.where(iota >= float(d), pltpu.roll(p, d, 1), 0.0)
    return _shr(p, 1, iota)


def _roll_partner(x, d, fh):
    """Bitonic compare-exchange partner: lane j+d on the first half, j-d on
    the second. No masking needed — within a 2d block the selected partner
    never crosses the 128-lane boundary, so wrap values are never chosen."""
    return jnp.where(fh, pltpu.roll(x, LANES - d, 1), pltpu.roll(x, d, 1))


def _bitonic_merge_64(z, sdf, misc):
    """Sort lanes 0..63 of ``z`` (and co-move ``sdf``) given the bitonic
    precondition (ascending reals ++ BIG ++ descending new). Stages run on
    all 128 lanes; the upper constant-BIG block is invariant."""
    for d in _BITONIC_DS:
        fh = misc[3 + int(math.log2(d)):4 + int(math.log2(d)), :] == 1.0
        partner = _roll_partner(z, d, fh)
        # Exchange decision as f32 0/1 (Mosaic rejects selects BETWEEN i1
        # vectors): first half takes the smaller partner, second the larger.
        took = jnp.where(fh, (partner < z).astype(z.dtype),
                         (partner > z).astype(z.dtype)) > 0.5
        if sdf is not None:
            sdf = jnp.where(took, _roll_partner(sdf, d, fh), sdf)
        z = jnp.where(took, partner, z)
    return z, sdf


def _bitonic_merge_128(z, misc):
    """Sort all 128 lanes of ``z`` given the bitonic precondition
    (64 ascending ++ 64 descending): compare-exchange stages d = 64..1."""
    for d in _SHL_DS:
        fh = misc[3 + int(math.log2(d)):4 + int(math.log2(d)), :] == 1.0
        partner = _roll_partner(z, d, fh)
        took = jnp.where(fh, (partner < z).astype(z.dtype),
                         (partner > z).astype(z.dtype)) > 0.5
        z = jnp.where(took, partner, z)
    return z


# ---------------------------------------------------------------------------
# upsample kernel
# ---------------------------------------------------------------------------

def _upsample_round(spec, n_deform, compute_dtype, consts, layers,
                    misc, o3, d3, a, b, c,
                    z, sdf, s_cur: int, k_new: int, inv_s: float,
                    need_new_sdf: bool):
    iota = misc[0:1, :]
    valid_pair = iota < float(s_cur - 1)

    # radius at each sample: |o + z d|^2 = a + 2 b z + c z^2 (per-ray a,b,c)
    radius = jnp.sqrt(jnp.maximum(a + 2.0 * b * z + c * z * z, 0.0))

    z_next = _shl(z, 1, iota)
    sdf_next = _shl(sdf, 1, iota)
    rad_next = _shl(radius, 1, iota)

    # upsample_weights_from_sdf (ops/neus.py; reference endosurf.py:221-266)
    mid_sdf = 0.5 * (sdf + sdf_next)
    cos_val = (sdf_next - sdf) / (z_next - z + 1e-6)
    prev_cos = _shr(jnp.where(valid_pair, cos_val, 0.0), 1, iota)
    cos_val = jnp.minimum(cos_val, prev_cos)
    inside = (radius < 1.0) | (rad_next < 1.0)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside.astype(z.dtype)
    dist = z_next - z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-6) / (prev_cdf + 1e-6)
    alpha = jnp.where(valid_pair, alpha, 0.0)
    trans = _prefix_prod(jnp.where(valid_pair, 1.0 - alpha + 1e-7, 1.0),
                         iota)
    trans_excl = jnp.where(iota >= 1, pltpu.roll(trans, 1, 1), 1.0)
    weights = alpha * trans_excl

    # sample_pdf, deterministic midpoint u (ops/pdf.py; key=None path)
    w = jnp.where(valid_pair, weights + 1e-5, 0.0)
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = _prefix_sum_excl(pdf, iota)
    on_bins = iota < float(s_cur)
    cdf_s = jnp.where(on_bins, cdf, 2.0)           # sentinel > any u
    new_z_cols: List[jnp.ndarray] = []
    for j in range(k_new):
        u = (j + 0.5) / k_new
        inds = jnp.sum((cdf_s <= u).astype(z.dtype), axis=-1, keepdims=True)
        below = jnp.maximum(inds - 1.0, 0.0)
        above = jnp.minimum(inds, float(s_cur - 1))
        cdf_b = _lane_extract(cdf, iota, below)
        cdf_a = _lane_extract(cdf, iota, above)
        z_b = _lane_extract(z, iota, below)
        z_a = _lane_extract(z, iota, above)
        denom = cdf_a - cdf_b
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        tt = (u - cdf_b) / denom
        new_z_cols.append(z_b + tt * (z_a - z_b))

    if need_new_sdf:
        new_sdf_cols = _eval_lanes(spec, n_deform, compute_dtype, consts,
                                   layers, o3, d3, new_z_cols)
    else:
        new_sdf_cols = None

    # Bitonic placement: reversed new samples into the top lanes 56..63 of
    # the 64-lane merge window (always BIG there since s_cur <= 56).
    lanes = [63 - j for j in range(k_new)]
    z = _cols_to_lanes(new_z_cols, lanes, iota, z)
    if need_new_sdf:
        sdf = _cols_to_lanes(new_sdf_cols, lanes, iota, sdf)
        z, sdf = _bitonic_merge_64(z, sdf, misc)
    else:
        z, _ = _bitonic_merge_64(z, None, misc)
    return z, sdf


def _upsample_kernel(spec, rspec_tuple, n_deform, compute_dtype,
                     o3_ref, d3_ref, rc_ref, z0_ref, *refs):
    n0, k_new, n_rounds, emit_sdf = rspec_tuple
    n_out = 2 if emit_sdf else 1
    out_ref = refs[-n_out]
    consts = tuple(r[...] for r in refs[:4])
    n_mat = 1
    flat = refs[4:-(n_out + n_mat)]
    layers = [(flat[2 * i][...], flat[2 * i + 1][...])
              for i in range(len(flat) // 2)]
    misc = _unpack_matrices(
        [r[...] for r in refs[-(n_out + n_mat):-n_out]])
    iota = misc[0:1, :]

    o3 = o3_ref[...]
    d3 = d3_ref[...]
    rc = rc_ref[...]
    z = z0_ref[...]
    a = _lane_extract(rc, iota, 0)
    b = _lane_extract(rc, iota, 1)
    c = _lane_extract(rc, iota, 2)

    # Initial SDF at the n0 stratified samples, EVAL_CHUNK lanes at a time.
    # Full chunks run as ONE fori_loop MLP-eval instance (compile cost —
    # see the march-kernel note); a short remainder chunk stays unrolled.
    def _sweep_chunk(ci, sdf_acc):
        base = ci * EVAL_CHUNK
        z_cols = [_lane_extract(z, iota, base + j)
                  for j in range(EVAL_CHUNK)]
        sdf_cols = _eval_lanes(spec, n_deform, compute_dtype, consts,
                               layers, o3, d3, z_cols)
        for j, col in enumerate(sdf_cols):
            sdf_acc = jnp.where(iota == base + j, col, sdf_acc)
        return sdf_acc

    sdf = jax.lax.fori_loop(0, n0 // EVAL_CHUNK, _sweep_chunk,
                            jnp.zeros_like(z))
    if n0 % EVAL_CHUNK:
        lanes = list(range(n0 - n0 % EVAL_CHUNK, n0))
        z_cols = [_lane_extract(z, iota, s) for s in lanes]
        sdf_cols = _eval_lanes(spec, n_deform, compute_dtype, consts,
                               layers, o3, d3, z_cols)
        sdf = _cols_to_lanes(sdf_cols, lanes, iota, sdf)

    for i in range(n_rounds):
        # The last round's new samples need their SDF only when the caller
        # wants the per-sample SDF emitted (the march-reuse consumer);
        # otherwise skip that eval exactly as before.
        need_new_sdf = (i + 1 < n_rounds) or emit_sdf
        z, sdf = _upsample_round(
            spec, n_deform, compute_dtype, consts, layers,
            misc, o3, d3, a, b, c,
            z, sdf, n0 + i * k_new, k_new, 64.0 * 2 ** i,
            need_new_sdf=need_new_sdf)
    out_ref[...] = z
    if emit_sdf:
        refs[-1][...] = sdf


def _ray_buffers(rays_o, rays_d_z, t):
    """[R, 128] (o, t) / (d_z, 0) / radius-coefficient buffers."""
    n = rays_o.shape[0]
    zeros = jnp.zeros((n, LANES - 4), rays_o.dtype)
    o3 = jnp.concatenate([rays_o, t, zeros], axis=-1)
    d3 = jnp.concatenate(
        [rays_d_z, jnp.zeros((n, 1), rays_o.dtype), zeros], axis=-1)
    rc = jnp.concatenate(
        [jnp.sum(rays_o * rays_o, -1, keepdims=True),
         jnp.sum(rays_o * rays_d_z, -1, keepdims=True),
         jnp.sum(rays_d_z * rays_d_z, -1, keepdims=True),
         jnp.zeros((n, LANES - 3), rays_o.dtype)], axis=-1)
    return o3, d3, rc


def _pad_rows(x: jnp.ndarray, n_total: int) -> jnp.ndarray:
    pad = n_total - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _const_specs(arrays):
    return [pl.BlockSpec(a.shape,
                         (lambda i: (0, 0)) if a.ndim == 2 else
                         (lambda i: (0,)),
                         memory_space=pltpu.VMEM) for a in arrays]


def fused_upsample_z(spec: EndoSurfSpec, params: Dict[str, Any],
                     rays_o: jnp.ndarray, rays_d_z: jnp.ndarray,
                     t: jnp.ndarray, z_vals: jnp.ndarray,
                     n_importance: int, n_rounds: int,
                     compute_dtype=jnp.float32,
                     interpret: bool = False,
                     return_sdf: bool = False) -> jnp.ndarray:
    """Whole-loop replacement for models/endosurf.py::upsample_z.

    Args:
      rays_o / rays_d_z: [R, 3]; t: [R, 1]; z_vals: [R, n0] stratified
        (ascending). Returns z [R, n0 + n_importance] sorted ascending;
        with ``return_sdf`` a (z, sdf) pair — the kernel already tracks the
        per-sample SDF lane-aligned through its bitonic merges, so emitting
        it costs only the last round's k_new-column eval (the march-reuse
        consumer: surface localization on already-paid-for samples).

    Non-jit wrapper: reads BLOCK_R at call time and threads it into the
    jitted impl as a static so set_block_r is never shadowed by a stale
    trace (round-3 ADVICE item)."""
    global LAST_BLOCK_R_CAP
    LAST_BLOCK_R_CAP = BLOCK_R
    return _fused_upsample_z(spec, params, rays_o, rays_d_z, t, z_vals,
                             n_importance, n_rounds, BLOCK_R,
                             compute_dtype, interpret, return_sdf)


@functools.partial(jax.jit, static_argnames=(
    "spec", "n_importance", "n_rounds", "block_r_cap", "compute_dtype",
    "interpret", "return_sdf"))
def _fused_upsample_z(spec: EndoSurfSpec, params: Dict[str, Any],
                      rays_o: jnp.ndarray, rays_d_z: jnp.ndarray,
                      t: jnp.ndarray, z_vals: jnp.ndarray,
                      n_importance: int, n_rounds: int, block_r_cap: int,
                      compute_dtype=jnp.float32,
                      interpret: bool = False,
                      return_sdf: bool = False) -> jnp.ndarray:
    n = rays_o.shape[0]
    n0 = z_vals.shape[1]
    assert upsample_shape_supported(n0, n_importance, n_rounds), (
        n0, n_importance, n_rounds)
    k_new = n_importance // n_rounds

    block_r = min(block_r_cap, max(8, 1 << (n - 1).bit_length()))
    n_total = ((n + block_r - 1) // block_r) * block_r

    o3, d3, rc = _ray_buffers(rays_o.astype(jnp.float32),
                              rays_d_z.astype(jnp.float32),
                              t.astype(jnp.float32))
    z0 = jnp.concatenate(
        [z_vals.astype(jnp.float32),
         jnp.full((n, LANES - n0), BIG, jnp.float32)], axis=-1)
    o3, d3, rc, z0 = (_pad_rows(x, n_total) for x in (o3, d3, rc, z0))

    const_arrays, layer_arrays, n_deform = build_sdf_eval_operands(
        spec, params, compute_dtype)
    mats = _matrix_operands()

    grid = (n_total // block_r,)
    row_spec = pl.BlockSpec((block_r, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([row_spec] * 4
                + _const_specs(const_arrays + layer_arrays + mats))
    out_spec = pl.BlockSpec((block_r, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_total, LANES), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_upsample_kernel, spec,
                          (n0, k_new, n_rounds, return_sdf),
                          n_deform, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec] if return_sdf else out_spec,
        out_shape=[out_shape, out_shape] if return_sdf else out_shape,
        interpret=interpret,
    )(o3, d3, rc, z0, *const_arrays, *layer_arrays, *mats)
    if return_sdf:
        z_out, sdf_out = out
        return (z_out[:n, :n0 + n_importance],
                sdf_out[:n, :n0 + n_importance])
    return out[:n, :n0 + n_importance]


# ---------------------------------------------------------------------------
# ray-march kernel
# ---------------------------------------------------------------------------

def _march_kernel(spec, cfg, n_deform, compute_dtype,
                  o3_ref, d3_ref, nf_ref, *refs):
    n_steps, n_secant, tau = cfg
    depth_ref, valid_ref = refs[-2], refs[-1]
    consts = tuple(r[...] for r in refs[:4])
    n_mat = 1
    flat = refs[4:-(2 + n_mat)]
    layers = [(flat[2 * i][...], flat[2 * i + 1][...])
              for i in range(len(flat) // 2)]
    misc = _unpack_matrices([r[...] for r in refs[-(2 + n_mat):-2]])
    iota = misc[0:1, :]
    lin = misc[1:2, :]
    arange_rev = misc[2:3, :]

    o3 = o3_ref[...]
    d3 = d3_ref[...]
    nf = nf_ref[...]
    near = _lane_extract(nf, iota, 0)
    far = _lane_extract(nf, iota, 1)

    # d_prop: n_steps linspace(near, far) on lanes (n_steps == LANES)
    z = near * (1.0 - lin) + far * lin

    # The sweep and secant loops run as lax.fori_loop so the kernel program
    # holds TWO MLP-eval instances instead of 24 unrolled ones — the
    # unrolled form gave Mosaic a 40+ min compile per enclosing program.
    def _sweep_chunk(c, sdf_acc):
        base = c * EVAL_CHUNK
        z_cols = [_lane_extract(z, iota, base + j)
                  for j in range(EVAL_CHUNK)]
        sdf_cols = _eval_lanes(spec, n_deform, compute_dtype, consts,
                               layers, o3, d3, z_cols)
        for j, col in enumerate(sdf_cols):
            sdf_acc = jnp.where(iota == base + j, col, sdf_acc)
        return sdf_acc

    sdf = jax.lax.fori_loop(0, n_steps // EVAL_CHUNK, _sweep_chunk,
                            jnp.zeros_like(z))

    # First +- crossing (reference endosurf.py:352-380; models/endosurf.py
    # ray_march): cost = sign(val_i * val_{i+1}) * arange(S..1), argmin.
    val = -(sdf - tau)
    first_free = _lane_extract(val, iota, 0) < 0.0
    val_next = _shl(val, 1, iota)
    prod = val * val_next
    sign = jnp.where(prod > 0, 1.0, jnp.where(prod < 0, -1.0, 0.0))
    sign = jnp.where(iota == float(n_steps - 1), 1.0, sign)
    cost = sign * arange_rev
    cost_min = jnp.min(cost, axis=-1, keepdims=True)
    idx = jnp.min(jnp.where(cost == cost_min, iota, float(LANES)),
                  axis=-1, keepdims=True)
    val_at = _lane_extract(val, iota, idx)
    idx_hi = jnp.minimum(idx + 1.0, float(n_steps - 1))
    d_low = _lane_extract(z, iota, idx)
    d_high = _lane_extract(z, iota, idx_hi)
    f_low = val_at
    f_high = _lane_extract(val, iota, idx_hi)
    valid = (cost_min < 0.0) & (val_at < 0.0) & first_free

    d_pred = -f_low * (d_high - d_low) / (f_high - f_low + 1e-12) + d_low

    def _secant_iter(_i, carry):
        d_low, f_low, d_high, f_high, d_pred = carry
        xt = o3 + d_pred * d3
        f_mid = -(eval_sdf_inline(spec, n_deform, compute_dtype, xt,
                                  consts, layers) - tau)
        low = f_mid < 0.0
        d_low = jnp.where(low, d_pred, d_low)
        f_low = jnp.where(low, f_mid, f_low)
        d_high = jnp.where(low, d_high, d_pred)
        f_high = jnp.where(low, f_high, f_mid)
        d_pred = (-f_low * (d_high - d_low) / (f_high - f_low + 1e-12)
                  + d_low)
        return (d_low, f_low, d_high, f_high, d_pred)

    d_low, f_low, d_high, f_high, d_pred = jax.lax.fori_loop(
        0, n_secant, _secant_iter,
        (d_low, f_low, d_high, f_high, d_pred))

    depth_ref[...] = jnp.where(valid, d_pred, 0.5 * (near + far))
    valid_ref[...] = valid.astype(jnp.float32)


def fused_ray_march(spec: EndoSurfSpec, params: Dict[str, Any],
                    rays_o: jnp.ndarray, rays_d_z: jnp.ndarray,
                    t: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray,
                    tau: float = 0.0, n_steps: int = 128, n_secant: int = 8,
                    compute_dtype=jnp.float32,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whole-loop replacement for models/endosurf.py::ray_march.

    near/far: [R, 1] from ops.geometry.ray_sphere_intersection (the caller
    computes them exactly as the jnp path does).
    Returns (depth [R, 1] f32, valid [R, 1] bool).

    Non-jit wrapper: reads BLOCK_R at call time (see fused_upsample_z)."""
    global LAST_BLOCK_R_CAP
    LAST_BLOCK_R_CAP = BLOCK_R
    return _fused_ray_march(spec, params, rays_o, rays_d_z, t, near, far,
                            tau, n_steps, n_secant, BLOCK_R,
                            compute_dtype, interpret)


@functools.partial(jax.jit, static_argnames=(
    "spec", "n_steps", "n_secant", "tau", "block_r_cap", "compute_dtype",
    "interpret"))
def _fused_ray_march(spec: EndoSurfSpec, params: Dict[str, Any],
                     rays_o: jnp.ndarray, rays_d_z: jnp.ndarray,
                     t: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray,
                     tau: float, n_steps: int, n_secant: int,
                     block_r_cap: int,
                     compute_dtype=jnp.float32,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    assert n_steps == LANES, "march kernel assumes 128 sample lanes"
    n = rays_o.shape[0]
    block_r = min(block_r_cap, max(8, 1 << (n - 1).bit_length()))
    n_total = ((n + block_r - 1) // block_r) * block_r

    o3, d3, _rc = _ray_buffers(rays_o.astype(jnp.float32),
                               rays_d_z.astype(jnp.float32),
                               t.astype(jnp.float32))
    nf = jnp.concatenate(
        [near.astype(jnp.float32), far.astype(jnp.float32),
         jnp.zeros((n, LANES - 2), jnp.float32)], axis=-1)
    # Padding rays are all-zero (o=d=0, near=far=0): every kernel op on
    # them stays finite and their outputs are sliced away.
    o3, d3, nf = (_pad_rows(x, n_total) for x in (o3, d3, nf))

    const_arrays, layer_arrays, n_deform = build_sdf_eval_operands(
        spec, params, compute_dtype)
    mats = _matrix_operands()

    grid = (n_total // block_r,)
    row_spec = pl.BlockSpec((block_r, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    in_specs = ([row_spec] * 3
                + _const_specs(const_arrays + layer_arrays + mats))
    col_spec = pl.BlockSpec((block_r, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    depth, valid = pl.pallas_call(
        functools.partial(_march_kernel, spec,
                          (n_steps, n_secant, float(tau)),
                          n_deform, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=(col_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((n_total, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_total, 1), jnp.float32)),
        interpret=interpret,
    )(o3, d3, nf, *const_arrays, *layer_arrays, *mats)
    return depth[:n], valid[:n] > 0.5


# ---------------------------------------------------------------------------
# EndoNeRF fine-resample kernel (coarse weights -> inverse-CDF -> merge-sort)
# ---------------------------------------------------------------------------

def fine_resample_shape_supported(n_samples: int, n_importance: int) -> bool:
    """64 coarse lanes + 64 draws fill the 128-lane merge exactly."""
    return n_samples == 64 and n_importance == 64


def _fine_resample_math(z, sig, dn, misc, n0: int, n_new: int):
    """Lane-form DNeRF importance resampling on loaded VMEM values
    (models/endonerf.py render_rays; reference endonerf.py:82-104):

      coarse weights (1 - exp(-sigma*dist) compositing, eps 1e-10)
      -> midpoint bins -> deterministic inverse-CDF draws (det=perturb
      quirk: u_j = (j+0.5)/64) -> 128-lane bitonic merge of old + new z.

    Shared by the standalone fine-resample kernel and the EndoNeRF
    whole-pipeline render kernel (fused_render_dnerf.py).

    Args: z [R, 128] (lanes 0..n0-1 sorted coarse z, BIG above), sig
    [R, 128] (coarse sigma, post noise+relu), dn [R, 1] (|rays_d|).
    Returns: z_all [R, 128] sorted ascending.
    """
    iota = misc[0:1, :]
    on = iota < float(n0)
    z_next = _shl(z, 1, iota)
    # raw2outputs: dists tail 1e10, scaled by |rays_d| (endonerf.py:168-182)
    dists = jnp.where(iota < float(n0 - 1), z_next - z, 1.0e10) * dn
    alpha = jnp.where(on, 1.0 - jnp.exp(-sig * dists), 0.0)
    trans = _prefix_prod(jnp.where(on, 1.0 - alpha + 1e-10, 1.0), iota)
    trans_excl = jnp.where(iota >= 1, pltpu.roll(trans, 1, 1), 1.0)
    w = alpha * trans_excl

    # sample_pdf(bins=z_mid [63], weights=w[1..62]) — ops/pdf.py semantics.
    z_mid = jnp.where(iota < float(n0 - 1), 0.5 * (z + z_next), BIG)
    w_sec = _shl(w, 1, iota)                            # lane k = w[k+1]
    w_sec = jnp.where(iota < float(n0 - 2), w_sec + 1e-5, 0.0)
    pdf = w_sec / jnp.sum(w_sec, axis=-1, keepdims=True)
    cdf = _prefix_sum_excl(pdf, iota)
    n_bins = n0 - 1
    cdf_s = jnp.where(iota < float(n_bins), cdf, 2.0)   # sentinel > any u

    def _draw(j, z_acc):
        u = (j + 0.5) / n_new
        inds = jnp.sum((cdf_s <= u).astype(z.dtype), axis=-1, keepdims=True)
        below = jnp.maximum(inds - 1.0, 0.0)
        above = jnp.minimum(inds, float(n_bins - 1))
        cdf_b = _lane_extract(cdf, iota, below)
        cdf_a = _lane_extract(cdf, iota, above)
        z_b = _lane_extract(z_mid, iota, below)
        z_a = _lane_extract(z_mid, iota, above)
        denom = cdf_a - cdf_b
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        tt = (u - cdf_b) / denom
        new_z = z_b + tt * (z_a - z_b)
        # Draws ascend with j; writing to lane 127-j leaves lanes 64..127
        # DESCENDING: ascending ++ descending == bitonic over 128 lanes.
        return jnp.where(iota == float(2 * LANES // 2 - 1) - j, new_z, z_acc)

    z = jax.lax.fori_loop(0, n_new, _draw, z)
    return _bitonic_merge_128(z, misc)


def _fine_resample_kernel(cfg, z_ref, sig_ref, dn_ref, *refs):
    """One ray block of the DNeRF importance resampling (see
    :func:`_fine_resample_math`). Inputs: z [R, 128], sig [R, 128],
    dn [R, 128] (|rays_d| lane 0). Output: z_all [R, 128] sorted."""
    n0, n_new = cfg
    out_ref = refs[-1]
    misc = _unpack_matrices([r[...] for r in refs[:-1]])
    iota = misc[0:1, :]
    dn = _lane_extract(dn_ref[...], iota, 0)
    out_ref[...] = _fine_resample_math(z_ref[...], sig_ref[...], dn, misc,
                                       n0, n_new)


def fused_fine_resample(z_vals: jnp.ndarray, sigma_c: jnp.ndarray,
                        d_norm: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Whole-loop replacement for the DNeRF importance-resampling glue
    (raw2outputs weights + sample_pdf + concat + sort — the 9.15 ms
    "pdf_glue" piece of the EndoNeRF step attribution, logs/
    r3_profile_endonerf.log) as ONE dispatch per ray block.

    Args:
      z_vals: [R, 64] sorted coarse depths.
      sigma_c: [R, 64] coarse density AFTER train-noise + relu.
      d_norm: [R, 1] |rays_d| (the reference scales dists by it).
    Returns: z_all [R, 128] sorted ascending (old 64 merged with 64
      deterministic inverse-CDF draws).

    Non-jit wrapper: reads BLOCK_R at call time (see fused_upsample_z)."""
    global LAST_BLOCK_R_CAP
    LAST_BLOCK_R_CAP = BLOCK_R
    return _fused_fine_resample(z_vals, sigma_c, d_norm, BLOCK_R, interpret)


@functools.partial(jax.jit, static_argnames=("block_r_cap", "interpret"))
def _fused_fine_resample(z_vals: jnp.ndarray, sigma_c: jnp.ndarray,
                         d_norm: jnp.ndarray, block_r_cap: int,
                         interpret: bool = False) -> jnp.ndarray:
    n, n0 = z_vals.shape
    assert fine_resample_shape_supported(n0, LANES - n0), (n0,)
    block_r = min(block_r_cap, max(8, 1 << (n - 1).bit_length()))
    n_total = ((n + block_r - 1) // block_r) * block_r

    z = jnp.concatenate(
        [z_vals.astype(jnp.float32),
         jnp.full((n, LANES - n0), BIG, jnp.float32)], axis=-1)
    sig = jnp.concatenate(
        [sigma_c.astype(jnp.float32),
         jnp.zeros((n, LANES - n0), jnp.float32)], axis=-1)
    dn = jnp.concatenate(
        [d_norm.astype(jnp.float32),
         jnp.zeros((n, LANES - 1), jnp.float32)], axis=-1)
    z, sig, dn = (_pad_rows(x, n_total) for x in (z, sig, dn))

    mats = _matrix_operands()
    grid = (n_total // block_r,)
    row_spec = pl.BlockSpec((block_r, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fine_resample_kernel, (n0, LANES - n0)),
        grid=grid,
        in_specs=[row_spec] * 3 + _const_specs(mats),
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_total, LANES), jnp.float32),
        interpret=interpret,
    )(z, sig, dn, *mats)
    return out[:n]
