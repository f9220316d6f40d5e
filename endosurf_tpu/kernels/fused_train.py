"""Fused fwd+bwd training megakernel for the EndoSurf render core.

The flagship train step is HBM-bandwidth-bound: XLA's autodiff of
``fields.fused_point_eval`` (deform MLP + 3 Jacobian tangent passes + SDF MLP
+ one internal SDF vjp + color MLP, reference inner core
/root/reference/src/renderer/endosurf.py:134-213) stores every 256-wide
activation to HBM between forward and backward — 20.7 GB/step at the 65k-point
flagship batch, ~100% of the chip's bandwidth roofline (VALIDATION.md).

This module re-expresses that evaluation as explicit batched matmuls on
lane-aligned layouts, split into THREE ``jax.custom_vjp`` segments glued by
cheap elementwise jnp (which XLA autodiffs normally):

    (x_c, jrows)          = seg_deform(eff_d, xt)           # + 3 Jac tangents
    (sdf, feat, grad_c)   = seg_sdf(eff_s, x_c)             # + internal vjp
    (grad_o, d_c)         = coupling(jrows, grad_c, d)      # plain jnp
    color                 = seg_color(eff_c, x_c, grad_c, d_c, feat)

Each segment's backward RECOMPUTES its forward from the saved small inputs
and pulls cotangents with ``jax.vjp`` over the same math — including the
second-order terms (softplus'' through the internal SDF adjoint, relu-gate
a.e.-zero terms through the Jacobian tangents) which autodiff derives from
the hand-laid forward. Segment boundaries ([B, 128/256] tensors) are the only
activations that ever touch HBM; the 256-wide layer interiors live once per
pass. Two execution paths share the math functions verbatim:

  * pure-jnp (the numerical oracle, and the CPU/test path), validated against
    jax autodiff of the original ``fields.fused_point_eval``;
  * Pallas TPU kernels running the same functions on VMEM-resident blocks
    (weights resident across the grid, param-grads accumulated in VMEM).

Contract: x, d, t receive NO cotangents. In the training graph they are data
rays and stop-gradient'd sample locations (models/endosurf.py:176-185), so
their cotangents are dead; the segment bwds return zeros for them.

Weight-norm denormalization, padding, and the skip-layer row splits happen
OUTSIDE the custom_vjp boundary in differentiable jnp (``prepare_effective``),
so (v, g, b) parameter gradients fall out of the chain rule automatically.

Layout conventions (shared by the jnp oracle and the kernels):
  * 3-vectors ride padded [B, 128] lane layouts: x in lanes 0-2, t in lane 3
    ("xt"), d / grad_c / grad_o / dx / d_c in lanes 0-2, zeros elsewhere.
  * frequency encodings are matmul-formulated (see kernels/fused_sdf.py):
    v = xt @ S (a constant selector matrix carrying the 2^f scales), then
    e = g(v) with g in {id, sin, cos} per column.
  * skip layers never concatenate: the skip weight is split into an
    h-block and per-section encoding blocks, z = s*(h @ Wh + sum_i sec_i @
    Wsec_i) + b, which is algebraically identical to the reference's
    concat-then-matmul (endosurf.py:732-737, 778-783) and keeps every
    contraction dimension lane-aligned.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from endosurf_tpu.kernels.fused_sdf import encode_selector
from endosurf_tpu.models.fields import EndoSurfSpec
from endosurf_tpu.ops.encoding import freq_encode_dim

LANES = 128
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _round_up(n: int, m: int = LANES) -> int:
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# static layout
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MKLayout:
    """Static (spec-derived) layout: selector shapes, layer structure."""
    deform_in: int          # true deform encoding width (pre-pad)
    sdf_in: int
    color_pos_in: int
    color_dir_in: int
    feat_dim: int
    n_deform: int
    n_sdf: int
    n_color: int
    deform_skips: Tuple[int, ...]
    sdf_skips: Tuple[int, ...]
    color_skips: Tuple[int, ...]
    hidden: int


def layout_from_spec(spec: EndoSurfSpec) -> MKLayout:
    d_in = (freq_encode_dim(3, spec.deform_pos_freqs)
            + freq_encode_dim(1, spec.deform_time_freqs))
    return MKLayout(
        deform_in=d_in,
        sdf_in=freq_encode_dim(3, spec.sdf_pos_freqs),
        color_pos_in=freq_encode_dim(3, spec.color_pos_freqs),
        color_dir_in=freq_encode_dim(3, spec.color_dir_freqs),
        feat_dim=spec.color_feat_dim,
        n_deform=spec.deform.n_layers,
        n_sdf=spec.sdf.n_layers,
        n_color=spec.color.n_layers,
        deform_skips=spec.deform.skips,
        sdf_skips=spec.sdf.skips,
        color_skips=spec.color.skips,
        hidden=spec.sdf.hidden_dim,
    )


@functools.lru_cache(maxsize=8)
def selectors(spec: EndoSurfSpec) -> Dict[str, np.ndarray]:
    """Constant selector matrices/kind masks, rows lifted to the xt layout.

    Every selector consumes a [B, 128] padded vector (x lanes 0-2, t lane 3)
    and produces a [B, round128(enc_dim)] pre-encoding; rows past the real
    inputs are zero. Returned as NUMPY constants so they bind to whatever
    backend traces them (they become compile-time constants under jit).
    """
    def lift(S: np.ndarray) -> np.ndarray:
        full = np.zeros((LANES, S.shape[1]), np.float32)
        full[:S.shape[0]] = S
        return full

    lay = layout_from_spec(spec)
    S_d, k_d = encode_selector(
        (3, 1), (spec.deform_pos_freqs, spec.deform_time_freqs),
        _round_up(lay.deform_in))
    S_s, k_s = encode_selector((3,), (spec.sdf_pos_freqs,),
                               _round_up(lay.sdf_in))
    S_p, k_p = encode_selector((3,), (spec.color_pos_freqs,),
                               _round_up(lay.color_pos_in))
    S_r, k_r = encode_selector((3,), (spec.color_dir_freqs,),
                               _round_up(lay.color_dir_in))
    return {
        "S_d": lift(S_d), "k_d": k_d[None, :],
        "S_s": lift(S_s), "k_s": k_s[None, :],
        "S_p": lift(S_p), "k_p": k_p[None, :],
        "S_r": lift(S_r), "k_r": k_r[None, :],
    }


# ---------------------------------------------------------------------------
# effective (denormalized + padded + split) weights
# ---------------------------------------------------------------------------

def _denorm(layer: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if "v" in layer:
        v = layer["v"]
        scale = layer["g"] / (jnp.linalg.norm(v, axis=0) + 1e-12)
        return v * scale[None, :], layer["b"]
    return layer["w"], layer["b"]


def _pad_rows(w: jnp.ndarray, rows: int) -> jnp.ndarray:
    if w.shape[0] == rows:
        return w
    return jnp.concatenate(
        [w, jnp.zeros((rows - w.shape[0], w.shape[1]), w.dtype)], axis=0)


def _pad_cols(w: jnp.ndarray, cols: int) -> jnp.ndarray:
    if w.shape[1] == cols:
        return w
    return jnp.concatenate(
        [w, jnp.zeros((w.shape[0], cols - w.shape[1]), w.dtype)], axis=1)


def _pad_vec(b: jnp.ndarray, n: int) -> jnp.ndarray:
    if b.shape[0] == n:
        return b
    return jnp.concatenate([b, jnp.zeros((n - b.shape[0],), b.dtype)])


def prepare_effective(spec: EndoSurfSpec, params: Dict[str, Any]
                      ) -> Dict[str, Any]:
    """Differentiable: (v, g, b) pytree -> padded effective-weight pytree.

    Layer dicts (all weights [in, out]):
      {"wsec": [..]}                 first layer (consumes encodings/sections)
      {"w"}                          plain hidden layer
      {"wh", "wsec": [..]}           skip layer (split concat)
    Deform/color last layers are lifted to 128 output lanes (zero columns
    past the real outputs) so 3-vector results stay in the lane layout.
    The SDF last layer is split into a head [H, 1] and feature block [H, F].
    """
    lay = layout_from_spec(spec)
    eff: Dict[str, Any] = {}

    def build(name, hidden, skips, sec_splits, sec_pads):
        """sec_splits: true row widths of the encoding sections;
        sec_pads: padded row widths; hidden: the net's own h-block width."""
        raw = [_denorm(l) for l in params[name]["layers"]]
        out: List[Dict[str, Any]] = []
        for l, (w, b) in enumerate(raw):
            if l == 0:
                parts = _split_rows(w, sec_splits)
                out.append({
                    "wsec": [_pad_rows(p, pp)
                             for p, pp in zip(parts, sec_pads)],
                    "b": b})
            elif l in skips:
                wh, rest = w[:w.shape[0] - sum(sec_splits)], \
                    w[w.shape[0] - sum(sec_splits):]
                parts = _split_rows(rest, sec_splits)
                out.append({
                    "wh": _pad_rows(wh, hidden),
                    "wsec": [_pad_rows(p, pp)
                             for p, pp in zip(parts, sec_pads)],
                    "b": b})
            else:
                out.append({"w": w, "b": b})
        return out

    if spec.use_deform:
        d_pad = _round_up(lay.deform_in)
        eff["deform"] = build("deform_network", spec.deform.hidden_dim,
                              lay.deform_skips, (lay.deform_in,), (d_pad,))
        # idr pre-skip layers output (hidden - in) true columns; lift every
        # hidden deform layer to a uniform hidden width with zero columns
        # (relu(0) = 0 and the consuming layer's zero rows keep them inert).
        Hd = spec.deform.hidden_dim
        for l in range(lay.n_deform - 1):
            ld = eff["deform"][l]
            for key in ("w", "wh"):
                if key in ld:
                    ld[key] = _pad_cols(ld[key], Hd)
            if "wsec" in ld:
                ld["wsec"] = [_pad_cols(p, Hd) for p in ld["wsec"]]
            ld["b"] = _pad_vec(ld["b"], Hd)
        # lift deform output (3 lanes) to the xt layout
        last = eff["deform"][-1]
        last["w"] = _pad_cols(last["w"], LANES)
        last["b"] = _pad_vec(last["b"], LANES)

    s_pad = _round_up(lay.sdf_in)
    eff["sdf"] = build("sdf_network", spec.sdf.hidden_dim, lay.sdf_skips,
                       (lay.sdf_in,), (s_pad,))
    # split the SDF output layer into head + features
    w_last, b_last = eff["sdf"][-1]["w"], eff["sdf"][-1]["b"]
    eff["sdf"] = eff["sdf"][:-1]
    eff["sdf_head"] = {"w": w_last[:, :1], "b": b_last[:1]}
    eff["sdf_feat"] = {"w": w_last[:, 1:], "b": b_last[1:]}

    p_pad, r_pad = _round_up(lay.color_pos_in), _round_up(lay.color_dir_in)
    c_splits = (lay.color_pos_in, 3, lay.color_dir_in, lay.feat_dim)
    c_pads = (p_pad, LANES, r_pad, lay.feat_dim)
    eff["color"] = build("color_network", spec.color.hidden_dim,
                         lay.color_skips, c_splits, c_pads)
    last = eff["color"][-1]
    last["w"] = _pad_cols(last["w"], LANES)
    last["b"] = _pad_vec(last["b"], LANES)
    return eff


def _split_rows(w: jnp.ndarray, widths: Sequence[int]) -> List[jnp.ndarray]:
    parts, ofs = [], 0
    for wd in widths:
        parts.append(w[ofs:ofs + wd])
        ofs += wd
    assert ofs == w.shape[0], (ofs, w.shape)
    return parts


# ---------------------------------------------------------------------------
# shared math: encodings / activations
# ---------------------------------------------------------------------------

def _enc(v, kind):
    """g(v): id / sin / cos by column kind."""
    return jnp.where(kind == 0, v, jnp.where(kind == 1, jnp.sin(v),
                                             jnp.cos(v)))


def _enc_d1(v, kind):
    """g'(v): 1 / cos / -sin."""
    return jnp.where(kind == 0, jnp.ones_like(v),
                     jnp.where(kind == 1, jnp.cos(v), -jnp.sin(v)))


def _relu(z):
    return jnp.maximum(z, 0.0)


def _relu_d1(z):
    return (z > 0.0).astype(z.dtype)


def _sp100(z):
    return jax.nn.softplus(z * 100.0) / 100.0


def _sp100_d1(z):
    return jax.nn.sigmoid(z * 100.0)


_ACT = {"relu": _relu, "sp100": _sp100}


def _dot(a, b):
    """MXU matmul: operands in compute dtype, f32 accumulation."""
    dt = _COMPUTE_DTYPE
    return jnp.dot(a.astype(dt), b.astype(dt),
                   preferred_element_type=jnp.float32,
                   precision=_PRECISION)


# compute-dtype knob (mirrors ops.mlp precision modes for the kernel path):
#   float32 + "highest"  = strict parity (oracle tests)
#   bfloat16 + None      = shipping throughput mode (MXU bf16, f32 accum)
_COMPUTE_DTYPE = jnp.float32
_PRECISION: Optional[str] = "highest"


def set_compute_mode(dtype, precision) -> None:
    global _COMPUTE_DTYPE, _PRECISION
    _COMPUTE_DTYPE = dtype
    _PRECISION = precision


# ---------------------------------------------------------------------------
# segment math (pure arrays; used by the jnp oracle AND the Pallas kernels)
# ---------------------------------------------------------------------------

def _mlp_fwd(layers, secs, act_name):
    """Run a split-skip MLP. Returns (out, zs): zs[l] the pre-activation."""
    act = _ACT[act_name]
    n = len(layers)
    h = None
    zs = []
    for l, lay in enumerate(layers):
        if "wh" in lay:                      # skip layer
            z = _dot(h, lay["wh"])
            for s_, w_ in zip(secs, lay["wsec"]):
                z = z + _dot(s_, w_)
            z = z * _INV_SQRT2 + lay["b"]
        elif "wsec" in lay:                  # first layer
            z = _dot(secs[0], lay["wsec"][0])
            for s_, w_ in zip(secs[1:], lay["wsec"][1:]):
                z = z + _dot(s_, w_)
            z = z + lay["b"]
        else:
            z = _dot(h, lay["w"]) + lay["b"]
        zs.append(z)
        h = act(z) if l != n - 1 else z
    return h, zs


def _tangent_fwd(layers, seed, gates):
    """Deform-Jacobian tangent pass: same chain, no biases, relu gates from
    the primal, seed re-injected at skips. Returns the output tangent."""
    u = None
    for l, lay in enumerate(layers):
        if "wh" in lay:
            m = (_dot(u, lay["wh"])
                 + _dot(seed, lay["wsec"][0])) * _INV_SQRT2
        elif "wsec" in lay:
            m = _dot(seed, lay["wsec"][0])
        else:
            m = _dot(u, lay["w"])
        u = m * gates[l] if l != len(layers) - 1 else m
    return u


def _sdf_adjoint(layers, head_w, gates):
    """Internal SDF vjp: cotangent of sdf w.r.t. the encoding section.

    Walks the sdf hidden chain in reverse with the head column as seed.
    Returns aE, the cotangent on e_s. Autodiff of this function yields the
    second-order softplus'' terms in the segment backward.
    """
    n = len(layers)
    B = gates[0].shape[0]
    # head_w.T (a [1, H] reshape), NOT head_w[:, 0][None, :]: the 1-D [H]
    # intermediate's vjp is a rank-1 reduction Mosaic cannot lay out
    # ("unsupported output implicit dimension"); the transpose keeps every
    # tensor in the differentiated graph >= 2-D.
    a = jnp.broadcast_to(head_w.T, (B, head_w.shape[0]))
    aE = None
    for l in range(n - 1, -1, -1):
        a = a * gates[l]                     # through act of z_l
        lay = layers[l]
        if "wh" in lay:
            contrib = _dot(a, lay["wsec"][0].T) * _INV_SQRT2
            aE = contrib if aE is None else aE + contrib
            a = _dot(a, lay["wh"].T) * _INV_SQRT2
        elif "wsec" in lay:
            contrib = _dot(a, lay["wsec"][0].T)
            aE = contrib if aE is None else aE + contrib
        else:
            a = _dot(a, lay["w"].T)
    return aE


def _lane(v, k):
    """[B, L] -> [B, 1] slice of lane k (broadcastable scalar per row)."""
    return v[:, k:k + 1]


def _onehot_lane(k: int, n: int = LANES, dtype=jnp.float32):
    """[1, n] one-hot lane row, built with 2-D iota (TPU-kernel safe)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return (idx == k).astype(dtype)


def seg_deform_math(eff_d, consts, xt):
    """xt [B,128] -> (x_c [B,128], jrows: 3 x [B,128] Jacobian rows).

    jrows[k] = d x_c / d x_k  (identity lane + deform tangent through the
    frequency encoding's analytic derivative).
    """
    S_d = jnp.asarray(consts["S_d"])
    k_d = jnp.asarray(consts["k_d"])
    v_d = _dot(xt, S_d)
    e_d = _enc(v_d, k_d)
    dx, d_zs = _mlp_fwd(eff_d, [e_d], "relu")
    gates = [_relu_d1(z) for z in d_zs[:-1]] + [None]
    x_c = xt + dx

    g1_d = _enc_d1(v_d, k_d)
    # One stacked tangent pass for all 3 Jacobian rows: seeds concatenated
    # on the batch axis ([3B, E]) ride the same weight matmuls with 3x the
    # rows — identical math to three separate passes, ~3x better MXU
    # utilization and 1/3 the instruction count.
    B = xt.shape[0]
    seeds = jnp.concatenate([S_d[k][None, :] * g1_d for k in range(3)], 0)
    gates3 = [None if g is None else jnp.concatenate([g] * 3, 0)
              for g in gates]
    u3 = _tangent_fwd(eff_d, seeds, gates3)
    jrows = [_onehot_lane(k, u3.shape[1], u3.dtype) + u3[k * B:(k + 1) * B]
             for k in range(3)]
    return x_c, jrows


def seg_sdf_math(eff_s, head, featw, consts, x_c):
    """x_c [B,128] -> (sdf [B,1], feat [B,F], grad_c [B,128]).

    grad_c = d sdf / d x_c via the in-forward adjoint pass (lanes 0-2 real).
    """
    S_s = jnp.asarray(consts["S_s"])
    k_s = jnp.asarray(consts["k_s"])
    v_s = _dot(x_c, S_s)
    e_s = _enc(v_s, k_s)
    # eff_s holds the reference net's layers 0..n-2 (ALL softplus100-
    # activated); the output layer is the split head/feat pair.
    _, s_zs = _mlp_fwd(eff_s, [e_s], "sp100")
    h_last = _sp100(s_zs[-1])
    sdf = _dot(h_last, head["w"]) + head["b"]
    feat = _dot(h_last, featw["w"]) + featw["b"]

    gates = [_sp100_d1(z) for z in s_zs]
    aE = _sdf_adjoint(eff_s, head["w"], gates)
    g1_s = _enc_d1(v_s, k_s)
    grad_c = _dot(aE * g1_s, S_s.T)
    return sdf, feat, grad_c


def coupling_math(jrows, grad_c, d_pad):
    """(grad_o, d_c): observed-space gradient + canonical view direction.

    Plain differentiable jnp — tiny elementwise work left to XLA autodiff.
    grad_o[k] = <jrows[k], grad_c> (J^T grad_c); d_c = J d / ||J d||.
    """
    grad_o = sum(
        _onehot_lane(k, grad_c.shape[1], grad_c.dtype)
        * jnp.sum(jrows[k] * grad_c, axis=-1, keepdims=True)
        for k in range(3))
    r = sum(_lane(d_pad, k) * jrows[k] for k in range(3))
    n_r = jnp.sqrt(jnp.sum(r * r, axis=-1, keepdims=True))
    d_c = r / (n_r + 1e-10)
    return grad_o, d_c


def seg_color_math(eff_c, consts, x_c, grad_c, d_c, feat):
    """-> color [B,128] (sigmoid rgb in lanes 0-2)."""
    S_p = jnp.asarray(consts["S_p"])
    k_p = jnp.asarray(consts["k_p"])
    S_r = jnp.asarray(consts["S_r"])
    k_r = jnp.asarray(consts["k_r"])
    e_p = _enc(_dot(x_c, S_p), k_p)
    e_r = _enc(_dot(d_c, S_r), k_r)
    z8c, _ = _mlp_fwd(eff_c, [e_p, grad_c, e_r, feat], "relu")
    return jax.nn.sigmoid(z8c)


def forward_math(spec, eff, consts, xt, d_pad):
    """Monolithic composition (oracle/testing convenience)."""
    if spec.use_deform:
        x_c, jrows = seg_deform_math(eff["deform"], consts, xt)
    else:
        x_c = xt
        jrows = [jnp.broadcast_to(_onehot_lane(k, LANES, xt.dtype),
                                  xt.shape) for k in range(3)]
    sdf, feat, grad_c = seg_sdf_math(eff["sdf"], eff["sdf_head"],
                                     eff["sdf_feat"], consts, x_c)
    grad_o, d_c = coupling_math(jrows, grad_c, d_pad)
    color = seg_color_math(eff["color"], consts, x_c, grad_c, d_c, feat)
    return {"sdf": sdf, "color": color, "grad_o": grad_o, "grad_c": grad_c}


# ---------------------------------------------------------------------------
# custom_vjp segments (jnp path; the Pallas path plugs into the same rules)
# ---------------------------------------------------------------------------

# Kernel dispatch gate, mirroring fused_sdf: Pallas serves large TPU batches,
# jnp everywhere else (CPU tests, tiny batches, non-TPU backends).
_KERNEL_ENABLED = True
_MIN_POINTS = 4096
_FORCE_KERNEL = False   # tests: route through Pallas (interpret on CPU)


def set_kernel_enabled(enabled: bool) -> None:
    global _KERNEL_ENABLED
    _KERNEL_ENABLED = bool(enabled)


def set_force_kernel(force: bool) -> None:
    global _FORCE_KERNEL
    _FORCE_KERNEL = bool(force)


def _use_kernel(n_points: int) -> bool:
    if _FORCE_KERNEL:
        return True
    if not _KERNEL_ENABLED or n_points < _MIN_POINTS:
        return False
    # No GSPMD rule for pallas_call: under a device mesh the partitioner
    # would replicate the batch around the kernel (parallel/mesh.py note);
    # the XLA path shards correctly, so it serves mesh runs.
    from endosurf_tpu.parallel.mesh import mesh_active
    if mesh_active():
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@functools.lru_cache(maxsize=16)
def _build_segments(spec: EndoSurfSpec, force: bool = False):
    """Per-spec custom_vjp segment functions (consts closed over as numpy).

    ``force=True`` builds segments that unconditionally run the Pallas
    kernels — used by the shard_map dispatch (fields.fused_point_eval),
    where the per-device shard should hit the kernel even though the
    global mesh_active() gate would otherwise bounce it.
    """
    consts = selectors(spec)

    def kern(n: int) -> bool:
        return force or _use_kernel(n)

    # --- deform ---------------------------------------------------------
    @jax.custom_vjp
    def seg_deform(eff_d, xt):
        return _seg_deform_impl(eff_d, xt)

    def _seg_deform_impl(eff_d, xt):
        if kern(xt.shape[0]):
            from endosurf_tpu.kernels import fused_train_pallas as ftp
            return ftp.deform_fwd(spec, consts, eff_d, xt)
        return seg_deform_math(eff_d, consts, xt)

    def seg_deform_fwd(eff_d, xt):
        out = _seg_deform_impl(eff_d, xt)
        return out, (eff_d, xt)

    def seg_deform_bwd(res, ct):
        eff_d, xt = res
        if kern(xt.shape[0]):
            from endosurf_tpu.kernels import fused_train_pallas as ftp
            d_eff = ftp.deform_bwd(spec, consts, eff_d, xt, ct)
        else:
            _, pull = jax.vjp(
                lambda e: seg_deform_math(e, consts, xt), eff_d)
            (d_eff,) = pull(ct)
        return d_eff, jnp.zeros_like(xt)

    seg_deform.defvjp(seg_deform_fwd, seg_deform_bwd)

    # --- sdf ------------------------------------------------------------
    @jax.custom_vjp
    def seg_sdf(eff_s, head, featw, x_c):
        return _seg_sdf_impl(eff_s, head, featw, x_c)

    def _seg_sdf_impl(eff_s, head, featw, x_c):
        if kern(x_c.shape[0]):
            from endosurf_tpu.kernels import fused_train_pallas as ftp
            return ftp.sdf_fwd(spec, consts, eff_s, head, featw, x_c)
        return seg_sdf_math(eff_s, head, featw, consts, x_c)

    def seg_sdf_fwd(eff_s, head, featw, x_c):
        out = _seg_sdf_impl(eff_s, head, featw, x_c)
        return out, (eff_s, head, featw, x_c)

    def seg_sdf_bwd(res, ct):
        eff_s, head, featw, x_c = res
        if kern(x_c.shape[0]):
            from endosurf_tpu.kernels import fused_train_pallas as ftp
            return ftp.sdf_bwd(spec, consts, eff_s, head, featw, x_c, ct)
        _, pull = jax.vjp(
            lambda e, hd, fw, xc: seg_sdf_math(e, hd, fw, consts, xc),
            eff_s, head, featw, x_c)
        return pull(ct)

    seg_sdf.defvjp(seg_sdf_fwd, seg_sdf_bwd)

    # --- color ----------------------------------------------------------
    @jax.custom_vjp
    def seg_color(eff_c, x_c, grad_c, d_c, feat):
        return _seg_color_impl(eff_c, x_c, grad_c, d_c, feat)

    def _seg_color_impl(eff_c, x_c, grad_c, d_c, feat):
        if kern(x_c.shape[0]):
            from endosurf_tpu.kernels import fused_train_pallas as ftp
            return ftp.color_fwd(spec, consts, eff_c, x_c, grad_c, d_c, feat)
        return seg_color_math(eff_c, consts, x_c, grad_c, d_c, feat)

    def seg_color_fwd(eff_c, x_c, grad_c, d_c, feat):
        out = _seg_color_impl(eff_c, x_c, grad_c, d_c, feat)
        return out, (eff_c, x_c, grad_c, d_c, feat)

    def seg_color_bwd(res, ct):
        eff_c, x_c, grad_c, d_c, feat = res
        if kern(x_c.shape[0]):
            from endosurf_tpu.kernels import fused_train_pallas as ftp
            return ftp.color_bwd(spec, consts, eff_c, x_c, grad_c, d_c,
                                 feat, ct)
        _, pull = jax.vjp(
            lambda e, xc, gc, dc, ft: seg_color_math(e, consts, xc, gc,
                                                     dc, ft),
            eff_c, x_c, grad_c, d_c, feat)
        return pull(ct)

    seg_color.defvjp(seg_color_fwd, seg_color_bwd)

    return seg_deform, seg_sdf, seg_color


# ---------------------------------------------------------------------------
# public entry: drop-in for fields.fused_point_eval
# ---------------------------------------------------------------------------

def pad_lanes(a: jnp.ndarray, extra: Optional[jnp.ndarray] = None
              ) -> jnp.ndarray:
    """[N, 3] (+ optional [N, 1]) -> [N, 128] lane layout."""
    parts = [a] + ([extra] if extra is not None else [])
    width = sum(p.shape[-1] for p in parts)
    parts.append(jnp.zeros((a.shape[0], LANES - width), a.dtype))
    return jnp.concatenate(parts, axis=-1)


def megakernel_point_eval(spec: EndoSurfSpec, params: Dict[str, Any],
                          x: jnp.ndarray, d: jnp.ndarray, t: jnp.ndarray,
                          force_kernel: bool = False
                          ) -> Dict[str, jnp.ndarray]:
    """Fused field evaluation with hand-structured fwd+bwd.

    Same contract as fields.fused_point_eval: x [N,3], d [N,3], t [N,1] ->
    {sdf [N], color [N,3], grad_o [N,3], grad_c [N,3]}. x/d/t receive no
    cotangents (data rays / stop-gradient'd sample locations).
    ``force_kernel`` pins every segment to the Pallas path (shard_map
    bodies, where the global gate must not re-decide per shard).
    """
    seg_deform, seg_sdf, seg_color = _build_segments(spec, force_kernel)
    eff = prepare_effective(spec, params)
    xt = pad_lanes(x, t)
    d_pad = pad_lanes(d)

    if spec.use_deform:
        x_c, jrows = seg_deform(eff["deform"], xt)
    else:
        x_c = xt
        jrows = [jnp.broadcast_to(_onehot_lane(k, LANES, xt.dtype), xt.shape)
                 for k in range(3)]
    sdf, feat, grad_c = seg_sdf(eff["sdf"], eff["sdf_head"],
                                eff["sdf_feat"], x_c)
    grad_o, d_c = coupling_math(jrows, grad_c, d_pad)
    color = seg_color(eff["color"], x_c, grad_c, d_c, feat)
    return {
        "sdf": sdf[:, 0],
        "color": color[:, :3],
        "grad_o": grad_o[:, :3],
        "grad_c": grad_c[:, :3],
    }
