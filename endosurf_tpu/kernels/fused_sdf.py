"""Pallas TPU kernel: fused observed-space SDF query.

Fuses the entire forward chain

    freq-encode(x, t) -> deform MLP (9x256) -> x_c = x + dx
    -> freq-encode(x_c) -> SDF MLP (9x256) -> sdf

into one kernel that keeps every intermediate activation in VMEM. The XLA
baseline writes each 256-wide activation to HBM between layers (~134 MB per
layer at the ray-march workload); the fused kernel removes that round-trip
for the forward-only consumers of this query — the 128-step sphere-tracing
ray march (models/endosurf.py ray_march), the SDF-guided upsampling rounds,
and dense grid extraction.

Frequency encoding inside the kernel is *matmul-formulated*: a [B, 3] point
block would otherwise need ~13 sin/cos ops on 3-lane arrays (each padded to
the 128-lane VPU width, i.e. ~98% wasted lanes) plus lane-concatenations,
which is what made the first version of this kernel lose to XLA. Instead a
constant selector matrix S [in, P] scatters scaled copies of the inputs into
a lane-aligned [B, P] buffer with ONE small matmul, and the sin/cos are two
full-width VPU passes gated by a per-column kind mask:

    v = x @ S              # column j holds x[d(j)] * 2^f(j)
    e = kind==id ? v : (kind==sin ? sin(v) : cos(v))

Column order matches ops.encoding.freq_encode exactly; padded columns hit
zero weight rows in the (padded) first/skip layers, so outputs are identical.

Weight-norm denormalization (W = v * g/||v||) happens once per call outside
the kernel (parameters are ~2M floats; negligible), so the kernel consumes
plain (W, b) layers. Weights for both MLPs total ~4.8MB f32 and stay resident
in VMEM across the whole grid.

The kernel is forward-only by design (its consumers run under
stop_gradient); differentiable paths keep using the jnp implementation.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from endosurf_tpu.models.fields import EndoSurfSpec

BLOCK_N = 1024  # points per grid step (1024 and 2048 measure equal; smaller
                # block keeps VMEM headroom for the resident weights)

# Auto-dispatch gate for the sampling hot paths (ray march / upsampling):
# the kernel wins on real TPU hardware at large point counts and is bypassed
# everywhere else (CPU tests, tiny secant batches).
_ENABLED = True
_MIN_POINTS = 8192


def set_fused_sdf_enabled(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = bool(enabled)


def fused_sdf_available(n_points: int) -> bool:
    """Should the fused kernel serve a sampling-path SDF query of this size?"""
    if not _ENABLED or n_points < _MIN_POINTS:
        return False
    # Mesh runs use the XLA path: pallas_call has no GSPMD partitioning
    # rule, so the partitioner would replicate the batch around the kernel
    # (parallel/mesh.py note).
    from endosurf_tpu.parallel.mesh import mesh_active
    if mesh_active():
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _effective_layers(mlp_params: Dict[str, Any]) -> List[Tuple]:
    """Weight-norm (v, g, b) -> plain (W, b)."""
    out = []
    for layer in mlp_params["layers"]:
        if "v" in layer:
            v = layer["v"]
            scale = layer["g"] / (jnp.linalg.norm(v, axis=0) + 1e-12)
            out.append((v * scale[None, :], layer["b"]))
        else:
            out.append((layer["w"], layer["b"]))
    return out


def _round_up(n: int, m: int = 128) -> int:
    return ((n + m - 1) // m) * m


def encode_selector(dims: Tuple[int, ...], freqs: Tuple[int, ...],
                    pad_to: int) -> Tuple[np.ndarray, np.ndarray]:
    """Selector matrix + kind mask for a concatenated frequency encoding.

    For each input group g (e.g. pos with 3 dims / 6 freqs, time with 1 dim /
    6 freqs) emit columns [x | sin(2^0 x), cos(2^0 x), sin(2^1 x), ...] in
    ops.encoding.freq_encode order, groups concatenated, zero-padded to
    ``pad_to`` lanes.

    Returns (S [sum(dims), pad_to] f32, kind [pad_to] i32) with kind 0=id,
    1=sin, 2=cos; padded columns have kind 0 and a zero S column.
    """
    total_in = sum(dims)
    cols_S: List[np.ndarray] = []
    kinds: List[int] = []
    offset = 0
    for d, nf in zip(dims, freqs):
        def col(dim_idx, scale):
            c = np.zeros((total_in,), np.float32)
            c[offset + dim_idx] = scale
            return c
        for i in range(d):
            cols_S.append(col(i, 1.0))
            kinds.append(0)
        for f in range(nf):
            for kind in (1, 2):
                for i in range(d):
                    cols_S.append(col(i, float(2.0 ** f)))
                    kinds.append(kind)
        offset += d
    n_cols = len(cols_S)
    assert n_cols <= pad_to, (n_cols, pad_to)
    S = np.stack(cols_S, axis=1)
    if n_cols < pad_to:
        S = np.concatenate(
            [S, np.zeros((total_in, pad_to - n_cols), np.float32)], axis=1)
        kinds += [0] * (pad_to - n_cols)
    return S, np.asarray(kinds, np.int32)


def _apply_encoding(v: jnp.ndarray, kind_row: jnp.ndarray) -> jnp.ndarray:
    """v [B, P] pre-scaled inputs -> encoded values by column kind."""
    s = jnp.sin(v)
    c = jnp.cos(v)
    return jnp.where(kind_row == 0, v, jnp.where(kind_row == 1, s, c))


def _mlp_precision(compute_dtype):
    """Dot precision matching the compute dtype: bf16 operands run one MXU
    pass (exact for the operands given), but f32 operands under Mosaic's
    DEFAULT precision are silently truncated to one bf16 pass — the f32
    (strict-parity) kernel mode must request HIGHEST to actually be f32."""
    return (None if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _run_mlp(h, x_enc, layers, skips, activation, skip_scale, compute_dtype):
    n_layers = len(layers)
    prec = _mlp_precision(compute_dtype)
    for l in range(n_layers):
        if l in skips:
            h = jnp.concatenate([h, x_enc], axis=-1) * skip_scale
        w, b = layers[l]
        # MXU feeds in compute_dtype (bf16 for throughput mode; weights are
        # pre-cast outside the kernel), always accumulating in f32;
        # nonlinearities run in f32 on the VPU.
        h = jnp.dot(h.astype(compute_dtype), w,
                    preferred_element_type=jnp.float32, precision=prec) + b
        if l != n_layers - 1:
            if activation == "relu":
                h = jnp.maximum(h, 0.0)
            else:  # softplus100
                h = jax.nn.softplus(h * 100.0) / 100.0
    return h


def chain_from_spec(spec) -> Tuple:
    """Static two-net chain config for :func:`eval_chain_inline`.

    Works for both field families: EndoSurfSpec (deform relu/1/sqrt2 ->
    SDF softplus100/1/sqrt2) and DNeRFSpec (deform relu/1.0 -> density
    relu/1.0 — no weight norm, unscaled skips, endonerf.py:320-352).
    Returns (use_first, skips1, act1, scale1, skips2, act2, scale2).
    """
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    if hasattr(spec, "sdf"):            # EndoSurfSpec
        return (spec.use_deform, tuple(spec.deform.skips), "relu",
                inv_sqrt2, tuple(spec.sdf.skips), "softplus100", inv_sqrt2)
    return (spec.use_deform, tuple(spec.deform_layers[2]), "relu", 1.0,
            tuple(spec.density_layers[2]), "relu", 1.0)


def eval_chain_inline(chain: Tuple, n_first: int, compute_dtype,
                      xt: jnp.ndarray, consts, layers) -> jnp.ndarray:
    """In-kernel fused two-net chain (warp MLP -> field MLP head) on loaded
    VMEM values.

    Shared by the fused SDF/density kernels and the sampler/render
    megakernels, which build their own [B, 128] (x, t) buffers in-kernel
    and call this per chunk.

    Args:
      chain: static config from :func:`chain_from_spec`.
      xt: [B, 128] values with (x0, x1, x2, t) in lanes 0..3.
      consts: (s_first, kind_first [1, P], s_second, kind_second [1, P]).
      layers: list of (w, b) values, first-net layers first (n_first).
    Returns: head value [B, 1] f32 (sdf, or raw pre-relu density).
    """
    use_first, skips1, act1, scale1, skips2, act2, scale2 = chain
    s_first, kind_first, s_second, kind_second = consts
    first_layers = layers[:n_first]
    second_layers = layers[n_first:]
    # Selector dots carry raw coordinates into the frequency encoding; in
    # the f32 (strict-parity) mode they must be full precision (see
    # _mlp_precision — Mosaic's DEFAULT truncates f32 dots to one bf16
    # pass). In the bf16 throughput mode one pass is the intended rounding.
    prec = _mlp_precision(compute_dtype)

    if use_first:
        v = jnp.dot(xt, s_first, preferred_element_type=jnp.float32,
                    precision=prec)
        enc = _apply_encoding(v, kind_first[:1, :])
        dx = _run_mlp(enc, enc, first_layers, skips1, act1,
                      scale1, compute_dtype)
        # x_c = x + dx, kept in the same padded [B, 128] (x, t) layout; the
        # dx block is [B, pad(3)] with zero weight columns past lane 2, and
        # the field selector ignores the t lane.
        x_c_pad = xt + dx
    else:
        x_c_pad = xt

    v_c = jnp.dot(x_c_pad, s_second, preferred_element_type=jnp.float32,
                  precision=prec)
    enc_c = _apply_encoding(v_c, kind_second[:1, :])
    h = _run_mlp(enc_c, enc_c, second_layers, skips2, act2,
                 scale2, compute_dtype)
    return h[:, :1]


def eval_sdf_inline(spec: EndoSurfSpec, n_deform: int, compute_dtype,
                    xt: jnp.ndarray, consts, layers) -> jnp.ndarray:
    """EndoSurf wrapper kept for the sampler/render megakernels."""
    return eval_chain_inline(chain_from_spec(spec), n_deform, compute_dtype,
                             xt, consts, layers)


def _kernel(chain: Tuple, n_first: int, compute_dtype, xt_ref, *refs):
    out_ref = refs[-1]
    consts = tuple(r[...] for r in refs[:4])
    flat = refs[4:-1]
    layers = [(flat[2 * i][...], flat[2 * i + 1][...])
              for i in range(len(flat) // 2)]
    out_ref[...] = eval_chain_inline(chain, n_first, compute_dtype,
                                     xt_ref[...], consts, layers)


def build_sdf_eval_operands(spec: EndoSurfSpec, params: Dict[str, Any],
                            compute_dtype):
    """Selector/kind constants + padded effective layers for the fused eval.

    Returns (const_arrays [4 jnp arrays], layer_arrays [flat w/b list],
    n_deform). Shared by fused_sdf_observed and the sampler megakernels.
    """
    from endosurf_tpu.ops.encoding import freq_encode_dim

    def pad_layers(layers, in_dim, skips):
        """Insert zero weight rows so encoded-input widths hit 128 multiples.

        Layer 0 consumes the (padded) encoding directly; skip layers consume
        concat([h, enc_pad]) whose tail is the encoding — appending zero rows
        keeps the product identical (concat order: endosurf.py:778-783).
        """
        extra = _round_up(in_dim) - in_dim
        out = []
        for l, (w, b) in enumerate(layers):
            if extra and (l == 0 or l in skips):
                w = jnp.concatenate(
                    [w, jnp.zeros((extra, w.shape[1]), w.dtype)], axis=0)
            out.append((w.astype(compute_dtype), b))
        return out

    # Selector/kind constants. Selectors consume the [*, 128] (x, t) layout,
    # so their row dim is 128 (rows past (x,t) are zero).
    def lift_rows(S: np.ndarray) -> jnp.ndarray:
        full = np.zeros((128, S.shape[1]), np.float32)
        full[:S.shape[0]] = S
        return jnp.asarray(full)

    layer_arrays: List[jnp.ndarray] = []
    n_deform = 0
    if spec.use_deform:
        d_in = (freq_encode_dim(3, spec.deform_pos_freqs)
                + freq_encode_dim(1, spec.deform_time_freqs))
        S_d, kind_d = encode_selector(
            (3, 1), (spec.deform_pos_freqs, spec.deform_time_freqs),
            _round_up(d_in))
        deform = pad_layers(_effective_layers(params["deform_network"]),
                            d_in, spec.deform.skips)
        # The deform output (3 lanes) is added back onto the padded (x, t)
        # input, so lift its last layer to all 128 lanes with zero columns
        # past lane 2 (t and padding must pass through unchanged).
        w_last, b_last = deform[-1]
        w_full = jnp.zeros((w_last.shape[0], 128), w_last.dtype)
        b_full = jnp.zeros((128,), b_last.dtype)
        deform[-1] = (w_full.at[:, :3].set(w_last),
                      b_full.at[:3].set(b_last))
        n_deform = len(deform)
        for w, b in deform:
            layer_arrays += [w, b]
    else:
        S_d = np.zeros((4, 128), np.float32)
        kind_d = np.zeros((128,), np.int32)
    sdf_in = freq_encode_dim(3, spec.sdf_pos_freqs)
    S_s, kind_s = encode_selector((3,), (spec.sdf_pos_freqs,),
                                  _round_up(sdf_in))
    for w, b in pad_layers(_effective_layers(params["sdf_network"]),
                           sdf_in, spec.sdf.skips):
        layer_arrays += [w, b]

    const_arrays = [lift_rows(S_d), jnp.asarray(kind_d)[None, :],
                    lift_rows(S_s), jnp.asarray(kind_s)[None, :]]
    return const_arrays, layer_arrays, n_deform


def build_density_eval_operands(spec, params: Dict[str, Any],
                                compute_dtype):
    """DNeRF analog of :func:`build_sdf_eval_operands`: selector/kind
    constants + padded layers for the deform -> density chain, with the
    density output layer reduced to its sigma head column (the sampling
    consumers never need the 256-d feature). ``spec`` is a DNeRFSpec
    (models/endonerf.py; reference endonerf.py:320-352)."""
    from endosurf_tpu.ops.encoding import freq_encode_dim

    def pad_layers(layers, in_dim, skips):
        extra = _round_up(in_dim) - in_dim
        out = []
        for l, (w, b) in enumerate(layers):
            if extra and (l == 0 or l in skips):
                w = jnp.concatenate(
                    [w, jnp.zeros((extra, w.shape[1]), w.dtype)], axis=0)
            out.append((w.astype(compute_dtype), b))
        return out

    def lift_rows(S: np.ndarray) -> jnp.ndarray:
        full = np.zeros((128, S.shape[1]), np.float32)
        full[:S.shape[0]] = S
        return jnp.asarray(full)

    layer_arrays: List[jnp.ndarray] = []
    n_first = 0
    if spec.use_deform:
        d_in = (freq_encode_dim(3, spec.pos_deform_freqs)
                + freq_encode_dim(1, spec.time_deform_freqs))
        S_d, kind_d = encode_selector(
            (3, 1), (spec.pos_deform_freqs, spec.time_deform_freqs),
            _round_up(d_in))
        deform = pad_layers(_effective_layers(params["deform"]),
                            d_in, spec.deform_layers[2])
        w_last, b_last = deform[-1]
        w_full = jnp.zeros((w_last.shape[0], 128), w_last.dtype)
        b_full = jnp.zeros((128,), b_last.dtype)
        deform[-1] = (w_full.at[:, :3].set(w_last),
                      b_full.at[:3].set(b_last))
        n_first = len(deform)
        for w, b in deform:
            layer_arrays += [w, b]
    else:
        S_d = np.zeros((4, 128), np.float32)
        kind_d = np.zeros((128,), np.int32)
    den_in = freq_encode_dim(3, spec.pos_density_freqs)
    S_s, kind_s = encode_selector((3,), (spec.pos_density_freqs,),
                                  _round_up(den_in))
    density = pad_layers(_effective_layers(params["density"]),
                         den_in, spec.density_layers[2])
    w_last, b_last = density[-1]
    density[-1] = (w_last[:, :1], b_last[:1])     # sigma head only
    for w, b in density:
        layer_arrays += [w, b]

    const_arrays = [lift_rows(S_d), jnp.asarray(kind_d)[None, :],
                    lift_rows(S_s), jnp.asarray(kind_s)[None, :]]
    return const_arrays, layer_arrays, n_first


def _head_query(chain: Tuple, const_arrays, layer_arrays, n_first: int,
                x: jnp.ndarray, t: jnp.ndarray, compute_dtype,
                interpret: bool) -> jnp.ndarray:
    """Shared pallas_call wrapper for the per-point head queries."""
    n = x.shape[0]
    block_n = min(BLOCK_N, _round_up(n, 128))
    n_pad = (-n) % block_n
    # One lane-aligned [N, 128] input carrying (x0, x1, x2, t, 0...).
    xt = jnp.concatenate(
        [x, t, jnp.zeros((n, 124), x.dtype)], axis=-1)
    if n_pad:
        xt = jnp.concatenate([xt, jnp.zeros((n_pad, 128), xt.dtype)], 0)
    n_total = xt.shape[0]

    grid = (n_total // block_n,)
    in_specs = [
        pl.BlockSpec((block_n, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    # Constants + all weights/biases: full arrays resident in VMEM for every
    # grid step (constant index maps -> fetched once).
    for arr in const_arrays + layer_arrays:
        in_specs.append(pl.BlockSpec(
            arr.shape,
            (lambda i: (0, 0)) if arr.ndim == 2 else (lambda i: (0,)),
            memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, chain, n_first, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_total, 1), jnp.float32),
        interpret=interpret,
    )(xt, *const_arrays, *layer_arrays)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("spec", "compute_dtype"))
def fused_sdf_observed(spec: EndoSurfSpec, params: Dict[str, Any],
                       x: jnp.ndarray, t: jnp.ndarray,
                       compute_dtype=jnp.float32) -> jnp.ndarray:
    """Drop-in forward-only replacement for fields.sdf_observed.

    Args:
      x: [N, 3] observed points; t: [N, 1] times. N is padded internally to a
        multiple of BLOCK_N.
    Returns: sdf [N, 1].
    """
    const_arrays, layer_arrays, n_deform = build_sdf_eval_operands(
        spec, params, compute_dtype)
    return _head_query(chain_from_spec(spec), const_arrays, layer_arrays,
                       n_deform, x, t, compute_dtype, interpret=False)


@functools.partial(jax.jit, static_argnames=("spec", "compute_dtype",
                                             "interpret"))
def fused_density_raw(spec, params: Dict[str, Any],
                      x: jnp.ndarray, t: jnp.ndarray,
                      compute_dtype=jnp.float32,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused forward-only DNeRF density query: RAW pre-relu sigma [N, 1].

    Serves the stop-gradient sampling consumers of the EndoNeRF vertical —
    the coarse importance pass (models/endonerf.py render_rays; the caller
    adds the train-time Gaussian noise and the relu, both elementwise) and
    dense grid extraction (density_observed callers apply relu as needed).
    """
    const_arrays, layer_arrays, n_first = build_density_eval_operands(
        spec, params, compute_dtype)
    return _head_query(chain_from_spec(spec), const_arrays, layer_arrays,
                       n_first, x, t, compute_dtype, interpret=interpret)
