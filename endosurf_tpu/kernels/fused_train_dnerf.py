"""Fused fwd+bwd training megakernel for the EndoNeRF (D-NeRF) field chain.

The EndoNeRF fine pass — deform MLP + density MLP + color MLP at 128
samples/ray on 2048 rays (reference inner core
/root/reference/src/renderer/endonerf.py:95-120, 338-370) — is the gradient
path of the baseline vertical's train step. Like the EndoSurf render core
(kernels/fused_train.py), XLA's autodiff stores every 256-wide activation to
HBM between forward and backward, which puts the step on the HBM-bandwidth
roofline (logs/r3_profile_endonerf.log).

Same cure, simpler disease: the chain is FIRST-order (no Jacobian tangents,
no internal adjoint), so the evaluation splits into three ``jax.custom_vjp``
segments whose backwards RECOMPUTE their forward inside a Pallas kernel and
pull cotangents with in-kernel ``jax.vjp``:

    x_c               = seg_deform(eff_d, xt)                 # warp
    (raw_sigma, feat) = seg_density(eff_s, head, featw, x_c)
    rgb               = seg_color(eff_c, d_pad, feat)         # sigmoid inside

Density noise + relu stay OUTSIDE the segments in differentiable jnp, exactly
where models/endonerf.py::field_eval applies them (endonerf.py:367-370).

Contract: x, d, t receive NO cotangents — they are data rays and
stop-gradient'd sample locations (models/endonerf.py:286-340); the segment
bwds return zeros/nothing for them. x_c (deform output) DOES carry a real
cotangent through seg_density.

Layout conventions shared with fused_train.py: 3-vectors ride padded
[B, 128] lane buffers (x lanes 0-2, t lane 3; d in lanes 0-2), frequency
encodings are matmul-formulated selectors, and skip layers are split into
h-block + per-section encoding blocks. The D-NeRF nets differ from
EndoSurf's in exactly three ways, all reproduced here: no weight norm
(plain w/b Linears), skip concat UNSCALED (skip_scale=1.0,
endonerf.py:347-352 vs EndoSurf's 1/sqrt(2)), and relu hidden activations
throughout.

The Pallas execution path reuses kernels/fused_train_pallas.py's generic
block runner (weights VMEM-resident across the grid, param-grads accumulated
in the output block); the jnp path below is the numerical oracle
(tests/test_fused_train_dnerf.py) and the CPU/small-batch fallback.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from endosurf_tpu.kernels import fused_train as ft
from endosurf_tpu.kernels.fused_sdf import encode_selector
from endosurf_tpu.ops.encoding import freq_encode_dim

LANES = ft.LANES

# Block sizes (rows per grid step). The D-NeRF segments are much leaner than
# EndoSurf's (no tangent stack, no adjoint, no second-order residuals), so
# far larger blocks fit VMEM — and unlike EndoSurf's flat sweep, blocks are
# decisive here: at 256/128 the step LOSES to XLA (37.4 vs 35.9 ms), at
# 1024/512 it wins (30.7 ms) and at 2048/1024 it wins more (29.4 ms, +23%;
# logs/dnerf_mk_probe*.log). Env overrides for tuning sweeps.
import os as _os

DN_BLOCK_FWD = int(_os.environ.get("ESN_DNMK_BLOCK_FWD", 2048))
DN_BLOCK_BWD = int(_os.environ.get("ESN_DNMK_BLOCK_BWD", 1024))


# ---------------------------------------------------------------------------
# selectors + effective weights
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def selectors_dnerf(spec) -> Dict[str, np.ndarray]:
    """Constant selector matrices/kind masks for the three D-NeRF encodings,
    rows lifted to the [B, 128] lane layout (numpy: compile-time constants).
    """
    def lift(S: np.ndarray) -> np.ndarray:
        full = np.zeros((LANES, S.shape[1]), np.float32)
        full[:S.shape[0]] = S
        return full

    d_in = (freq_encode_dim(3, spec.pos_deform_freqs)
            + freq_encode_dim(1, spec.time_deform_freqs))
    s_in = freq_encode_dim(3, spec.pos_density_freqs)
    r_in = freq_encode_dim(3, spec.dir_color_freqs)
    S_d, k_d = encode_selector(
        (3, 1), (spec.pos_deform_freqs, spec.time_deform_freqs),
        ft._round_up(d_in))
    S_s, k_s = encode_selector((3,), (spec.pos_density_freqs,),
                               ft._round_up(s_in))
    S_r, k_r = encode_selector((3,), (spec.dir_color_freqs,),
                               ft._round_up(r_in))
    return {
        "S_d": lift(S_d), "k_d": k_d[None, :],
        "S_s": lift(S_s), "k_s": k_s[None, :],
        "S_r": lift(S_r), "k_r": k_r[None, :],
    }


def prepare_effective_dnerf(spec, params: Dict[str, Any]) -> Dict[str, Any]:
    """Differentiable: plain (w, b) pytree -> padded split-skip pytree.

    Mirrors fused_train.prepare_effective for the nerf-style layout: hidden
    widths are uniform (no idr column lifting needed), the density output
    layer splits into sigma head [H, 1] + geo-feature block [H, F]
    (endonerf.py:355-365), and the deform/color last layers lift to 128
    output lanes.
    """
    d_in = (freq_encode_dim(3, spec.pos_deform_freqs)
            + freq_encode_dim(1, spec.time_deform_freqs))
    s_in = freq_encode_dim(3, spec.pos_density_freqs)
    r_in = freq_encode_dim(3, spec.dir_color_freqs)
    eff: Dict[str, Any] = {}

    def build(name, skips, sec_splits, sec_pads):
        raw = [ft._denorm(l) for l in params[name]["layers"]]
        out: List[Dict[str, Any]] = []
        for l, (w, b) in enumerate(raw):
            if l == 0:
                parts = ft._split_rows(w, sec_splits)
                out.append({
                    "wsec": [ft._pad_rows(p, pp)
                             for p, pp in zip(parts, sec_pads)],
                    "b": b})
            elif l in skips:
                # nerf-style skip input is concat(h, enc) (endonerf.py:352):
                # h rows first, encoding sections last.
                wh = w[:w.shape[0] - sum(sec_splits)]
                parts = ft._split_rows(w[w.shape[0] - sum(sec_splits):],
                                       sec_splits)
                out.append({
                    "wh": wh,
                    "wsec": [ft._pad_rows(p, pp)
                             for p, pp in zip(parts, sec_pads)],
                    "b": b})
            else:
                out.append({"w": w, "b": b})
        return out

    if spec.use_deform:
        eff["deform"] = build("deform", spec.deform_layers[2],
                              (d_in,), (ft._round_up(d_in),))
        last = eff["deform"][-1]
        last["w"] = ft._pad_cols(last["w"], LANES)
        last["b"] = ft._pad_vec(last["b"], LANES)

    eff["density"] = build("density", spec.density_layers[2],
                           (s_in,), (ft._round_up(s_in),))
    w_last, b_last = eff["density"][-1]["w"], eff["density"][-1]["b"]
    eff["density"] = eff["density"][:-1]
    eff["sigma_head"] = {"w": w_last[:, :1], "b": b_last[:1]}
    eff["geo_feat"] = {"w": w_last[:, 1:], "b": b_last[1:]}

    eff["color"] = build("color", spec.color_layers[2],
                         (r_in, spec.geo_feat_dim),
                         (ft._round_up(r_in), spec.geo_feat_dim))
    last = eff["color"][-1]
    last["w"] = ft._pad_cols(last["w"], LANES)
    last["b"] = ft._pad_vec(last["b"], LANES)
    return eff


# ---------------------------------------------------------------------------
# segment math (pure arrays; jnp oracle AND in-kernel trace)
# ---------------------------------------------------------------------------

def _mlp_fwd_nerf(layers, secs):
    """Split-skip MLP: relu hidden layers, LINEAR last layer, UNSCALED skip
    (endonerf.py:338-352). Matmul precision/dtype ride fused_train's
    compute-mode globals (set by fields._sync_megakernel_precision)."""
    n = len(layers)
    h = None
    for l, lay in enumerate(layers):
        if "wh" in lay:                      # skip layer
            z = ft._dot(h, lay["wh"])
            for s_, w_ in zip(secs, lay["wsec"]):
                z = z + ft._dot(s_, w_)
            z = z + lay["b"]
        elif "wsec" in lay:                  # first layer
            z = ft._dot(secs[0], lay["wsec"][0])
            for s_, w_ in zip(secs[1:], lay["wsec"][1:]):
                z = z + ft._dot(s_, w_)
            z = z + lay["b"]
        else:
            z = ft._dot(h, lay["w"]) + lay["b"]
        h = ft._relu(z) if l != n - 1 else z
    return h


def seg_deform_math(eff_d, consts, xt):
    """xt [B,128] -> x_c [B,128] (x+dx in lanes 0-2; lane 3 keeps t, which
    the density selector never reads)."""
    v = ft._dot(xt, jnp.asarray(consts["S_d"]))
    e = ft._enc(v, jnp.asarray(consts["k_d"]))
    return xt + _mlp_fwd_nerf(eff_d, [e])


def seg_density_math(eff_s, head, featw, consts, x_c):
    """x_c [B,128] -> (raw_sigma [B,1], feat [B,F]).

    eff_s holds the hidden chain (reference layers 0..n-2, ALL relu'd); the
    output layer is the split sigma-head/feature pair. raw_sigma is
    pre-noise/pre-relu — field_eval applies both outside the segment.
    """
    v = ft._dot(x_c, jnp.asarray(consts["S_s"]))
    e = ft._enc(v, jnp.asarray(consts["k_s"]))
    h_last = ft._relu(_mlp_fwd_nerf(eff_s, [e]))
    raw_sigma = ft._dot(h_last, head["w"]) + head["b"]
    feat = ft._dot(h_last, featw["w"]) + featw["b"]
    return raw_sigma, feat


def seg_color_math(eff_c, consts, d_pad, feat):
    """(d_pad [B,128], feat [B,F]) -> rgb [B,128] (sigmoid, lanes 0-2 real)."""
    v = ft._dot(d_pad, jnp.asarray(consts["S_r"]))
    e_r = ft._enc(v, jnp.asarray(consts["k_r"]))
    z = _mlp_fwd_nerf(eff_c, [e_r, feat])
    return jax.nn.sigmoid(z)


def forward_math(spec, eff, consts, xt, d_pad):
    """Monolithic composition (oracle/testing convenience)."""
    x_c = (seg_deform_math(eff["deform"], consts, xt)
           if spec.use_deform else xt)
    raw_sigma, feat = seg_density_math(eff["density"], eff["sigma_head"],
                                       eff["geo_feat"], consts, x_c)
    rgb = seg_color_math(eff["color"], consts, d_pad, feat)
    return {"rgb": rgb, "raw_sigma": raw_sigma}


# ---------------------------------------------------------------------------
# Pallas segment kernels (generic block runner from fused_train_pallas)
# ---------------------------------------------------------------------------

def _pl():
    from endosurf_tpu.kernels import fused_train_pallas as ftp
    return ftp


def _deform_fwd_pl(consts, eff_d, xt):
    ftp = _pl()
    res = {"w": ftp._to2d(eff_d), "c": ftp._np_consts(consts)}

    def fn(r, xt_blk):
        return [seg_deform_math(r["w"], r["c"], xt_blk)], None

    tpl = [jax.ShapeDtypeStruct((xt.shape[0], LANES), jnp.float32)]
    outs, _ = ftp._seg_pallas(fn, res, [xt], tpl, None, DN_BLOCK_FWD)
    return outs[0]


def _deform_bwd_pl(consts, eff_d, xt, ct):
    ftp = _pl()
    eff2 = ftp._to2d(eff_d)
    res = {"w": eff2, "c": ftp._np_consts(consts)}

    def fn(r, xt_blk, ct_blk):
        def f(wt):
            return seg_deform_math(wt, r["c"], xt_blk)
        _, pull = jax.vjp(f, r["w"])
        (dw,) = pull(ct_blk)
        return [], dw

    _, dacc = ftp._seg_pallas(fn, res, [xt, ct], [], ftp._sds_like(eff2),
                              DN_BLOCK_BWD)
    return ftp._from2d(dacc, eff_d)


def _density_fwd_pl(consts, eff_s, head, featw, x_c):
    ftp = _pl()
    res = {"w": {"eff": ftp._to2d(eff_s), "head": ftp._to2d(head),
                 "feat": ftp._to2d(featw)},
           "c": ftp._np_consts(consts)}
    n = x_c.shape[0]
    feat_dim = featw["w"].shape[1]

    def fn(r, xc_blk):
        w = r["w"]
        raw, feat = seg_density_math(w["eff"], w["head"], w["feat"],
                                     r["c"], xc_blk)
        return [raw, feat], None

    tpl = [jax.ShapeDtypeStruct((n, 1), jnp.float32),
           jax.ShapeDtypeStruct((n, feat_dim), jnp.float32)]
    outs, _ = ftp._seg_pallas(fn, res, [x_c], tpl, None, DN_BLOCK_FWD)
    return outs[0], outs[1]


def _density_bwd_pl(consts, eff_s, head, featw, x_c, ct):
    ftp = _pl()
    ct_raw, ct_feat = ct
    w2 = {"eff": ftp._to2d(eff_s), "head": ftp._to2d(head),
          "feat": ftp._to2d(featw)}
    res = {"w": w2, "c": ftp._np_consts(consts)}

    def fn(r, xc_blk, craw, cfeat):
        def f(wt, xc):
            return seg_density_math(wt["eff"], wt["head"], wt["feat"],
                                    r["c"], xc)
        _, pull = jax.vjp(f, r["w"], xc_blk)
        dw, dxc = pull((craw, cfeat))
        return [dxc], dw

    tpl = [jax.ShapeDtypeStruct((x_c.shape[0], LANES), jnp.float32)]
    outs, dacc = ftp._seg_pallas(fn, res, [x_c, ct_raw, ct_feat], tpl,
                                 ftp._sds_like(w2), DN_BLOCK_BWD)
    return (ftp._from2d(dacc["eff"], eff_s), ftp._from2d(dacc["head"], head),
            ftp._from2d(dacc["feat"], featw), outs[0])


def _color_fwd_pl(consts, eff_c, d_pad, feat):
    ftp = _pl()
    res = {"w": ftp._to2d(eff_c), "c": ftp._np_consts(consts)}

    def fn(r, dp_blk, ft_blk):
        return [seg_color_math(r["w"], r["c"], dp_blk, ft_blk)], None

    tpl = [jax.ShapeDtypeStruct((d_pad.shape[0], LANES), jnp.float32)]
    outs, _ = ftp._seg_pallas(fn, res, [d_pad, feat], tpl, None,
                              DN_BLOCK_FWD)
    return outs[0]


def _color_bwd_pl(consts, eff_c, d_pad, feat, ct):
    ftp = _pl()
    eff2 = ftp._to2d(eff_c)
    res = {"w": eff2, "c": ftp._np_consts(consts)}

    def fn(r, dp_blk, ft_blk, ct_blk):
        # d_pad is data (dead cotangent): differentiate weights + feat only.
        def f(wt, ftv):
            return seg_color_math(wt, r["c"], dp_blk, ftv)
        _, pull = jax.vjp(f, r["w"], ft_blk)
        dw, dft = pull(ct_blk)
        return [dft], dw

    tpl = [jax.ShapeDtypeStruct((feat.shape[0], feat.shape[1]), jnp.float32)]
    outs, dacc = ftp._seg_pallas(fn, res, [d_pad, feat, ct], tpl,
                                 ftp._sds_like(eff2), DN_BLOCK_BWD)
    return ftp._from2d(dacc, eff_c), outs[0]


# ---------------------------------------------------------------------------
# dispatch gate (mode contract mirrors fields.set_megakernel_mode)
# ---------------------------------------------------------------------------

_MODE = "auto"       # auto | on | off


def set_dnerf_megakernel_mode(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "on", "off")
    _MODE = mode


def dnerf_megakernel_serves(n_points: int) -> bool:
    if _MODE == "off":
        return False
    if _MODE == "on":
        return True
    return ft._use_kernel(n_points)


def dnerf_megakernel_mesh(n_points: int):
    """Mesh to shard_map the megakernel over, or None (pallas_call has no
    GSPMD rule — same contract as fields._megakernel_mesh)."""
    if _MODE == "off":
        return None
    from endosurf_tpu.parallel.mesh import current_mesh, mesh_active
    if not (mesh_active() and ft._KERNEL_ENABLED):
        return None
    mesh = current_mesh()
    if mesh is None or n_points % mesh.size != 0:
        return None
    if _MODE == "on":
        # Forced mode honors the mesh path on any backend (CPU tests run
        # the shard_map body with interpreted kernels) — same contract as
        # fused_sampler.kernel_mesh.
        return mesh
    if n_points // mesh.size < ft._MIN_POINTS:
        return None
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:
        return None
    return mesh


# ---------------------------------------------------------------------------
# custom_vjp segments + public entry
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _build_segments(spec, force: bool = False):
    """Per-spec custom_vjp segment functions. ``force=True`` pins the Pallas
    path (shard_map bodies, where the per-shard gate must not re-decide)."""
    consts = selectors_dnerf(spec)

    def kern(n: int) -> bool:
        return force or (_MODE != "off" and ft._use_kernel(n))

    # --- deform ---------------------------------------------------------
    @jax.custom_vjp
    def seg_deform(eff_d, xt):
        return _deform_impl(eff_d, xt)

    def _deform_impl(eff_d, xt):
        if kern(xt.shape[0]):
            return _deform_fwd_pl(consts, eff_d, xt)
        return seg_deform_math(eff_d, consts, xt)

    def seg_deform_fwd(eff_d, xt):
        return _deform_impl(eff_d, xt), (eff_d, xt)

    def seg_deform_bwd(res, ct):
        eff_d, xt = res
        if kern(xt.shape[0]):
            d_eff = _deform_bwd_pl(consts, eff_d, xt, ct)
        else:
            _, pull = jax.vjp(
                lambda e: seg_deform_math(e, consts, xt), eff_d)
            (d_eff,) = pull(ct)
        return d_eff, jnp.zeros_like(xt)

    seg_deform.defvjp(seg_deform_fwd, seg_deform_bwd)

    # --- density --------------------------------------------------------
    @jax.custom_vjp
    def seg_density(eff_s, head, featw, x_c):
        return _density_impl(eff_s, head, featw, x_c)

    def _density_impl(eff_s, head, featw, x_c):
        if kern(x_c.shape[0]):
            return _density_fwd_pl(consts, eff_s, head, featw, x_c)
        return seg_density_math(eff_s, head, featw, consts, x_c)

    def seg_density_fwd(eff_s, head, featw, x_c):
        return _density_impl(eff_s, head, featw, x_c), \
            (eff_s, head, featw, x_c)

    def seg_density_bwd(res, ct):
        eff_s, head, featw, x_c = res
        if kern(x_c.shape[0]):
            return _density_bwd_pl(consts, eff_s, head, featw, x_c, ct)
        _, pull = jax.vjp(
            lambda e, hd, fw, xc: seg_density_math(e, hd, fw, consts, xc),
            eff_s, head, featw, x_c)
        return pull(ct)

    seg_density.defvjp(seg_density_fwd, seg_density_bwd)

    # --- color ----------------------------------------------------------
    @jax.custom_vjp
    def seg_color(eff_c, d_pad, feat):
        return _color_impl(eff_c, d_pad, feat)

    def _color_impl(eff_c, d_pad, feat):
        if kern(d_pad.shape[0]):
            return _color_fwd_pl(consts, eff_c, d_pad, feat)
        return seg_color_math(eff_c, consts, d_pad, feat)

    def seg_color_fwd(eff_c, d_pad, feat):
        return _color_impl(eff_c, d_pad, feat), (eff_c, d_pad, feat)

    def seg_color_bwd(res, ct):
        eff_c, d_pad, feat = res
        if kern(d_pad.shape[0]):
            d_eff, dft = _color_bwd_pl(consts, eff_c, d_pad, feat, ct)
        else:
            _, pull = jax.vjp(
                lambda e, ftv: seg_color_math(e, consts, d_pad, ftv),
                eff_c, feat)
            d_eff, dft = pull(ct)
        return d_eff, jnp.zeros_like(d_pad), dft

    seg_color.defvjp(seg_color_fwd, seg_color_bwd)

    return seg_deform, seg_density, seg_color


def megakernel_field_raw(spec, params: Dict[str, Any], x: jnp.ndarray,
                         d: jnp.ndarray, t: jnp.ndarray,
                         force_kernel: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused D-NeRF field evaluation with hand-structured fwd+bwd.

    x [N,3], d [N,3], t [N,1] -> (rgb [N,3] post-sigmoid, raw_sigma [N]
    pre-noise/pre-relu). x/d/t receive no cotangents (data rays /
    stop-gradient'd sample locations). Weight-norm-free denormalization,
    padding, and skip splits happen in differentiable jnp outside the
    custom_vjp boundary, so (w, b) parameter gradients fall out of the
    chain rule automatically.
    """
    seg_deform, seg_density, seg_color = _build_segments(spec, force_kernel)
    eff = prepare_effective_dnerf(spec, params)
    xt = ft.pad_lanes(x, t)
    d_pad = ft.pad_lanes(d)
    x_c = seg_deform(eff["deform"], xt) if spec.use_deform else xt
    raw_sigma, feat = seg_density(eff["density"], eff["sigma_head"],
                                  eff["geo_feat"], x_c)
    rgb = seg_color(eff["color"], d_pad, feat)
    return rgb[:, :3], raw_sigma[:, 0]
