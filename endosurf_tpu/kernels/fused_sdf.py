"""Pallas TPU kernel: fused observed-space SDF query.

Fuses the entire forward chain

    freq-encode(x, t) -> deform MLP (9x256) -> x_c = x + dx
    -> freq-encode(x_c) -> SDF MLP (9x256) -> sdf

into one kernel that keeps every intermediate activation in VMEM. The XLA
baseline writes each 256-wide activation to HBM between layers; for the
forward-only consumers of this query — the 128-step sphere-tracing ray march
(models/endosurf.py ray_march), the SDF-guided upsampling rounds, and dense
grid extraction — the fused kernel removes that round-trip entirely.

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from endosurf_tpu.models.fields import EndoSurfSpec

BLOCK_N = 512  # points per grid step; activations: 512x349 f32 ~ 0.7MB


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


def _freq_encode_inline(x, n_freqs, pad_to: int = 0):
    """Reimplementation of ops.encoding.freq_encode usable inside the kernel
    (identical interleave order), optionally zero-padded to an MXU-friendly
    lane multiple (padded lanes hit zero weight rows, so outputs match)."""
    parts = [x]
    for f in range(n_freqs):
        scaled = x * (2.0 ** f)
        parts.append(jnp.sin(scaled))
        parts.append(jnp.cos(scaled))
    # Match [x, sin_f0, cos_f0, sin_f1, ...] per-block concatenation of the
    # batched encoder: encoder emits [x | interleaved (sin,cos) x freq] where
    # each chunk spans all D dims.
    enc = jnp.concatenate(parts, axis=-1)
    if pad_to and enc.shape[-1] < pad_to:
        enc = jnp.concatenate([
            enc, jnp.zeros((*enc.shape[:-1], pad_to - enc.shape[-1]),
                           enc.dtype)], axis=-1)
    return enc


def _run_mlp(h, x_enc, layers, skips, activation, skip_scale, compute_dtype):
    n_layers = len(layers)
    for l in range(n_layers):
        if l in skips:
            h = jnp.concatenate([h, x_enc], axis=-1) * skip_scale
        w, b = layers[l]
        # MXU feeds in compute_dtype (bf16 for throughput mode; weights are
        # pre-cast outside the kernel), always accumulating in f32;
        # nonlinearities run in f32 on the VPU.
        h = jnp.dot(h.astype(compute_dtype), w,
                    preferred_element_type=jnp.float32) + b
        if l != n_layers - 1:
            if activation == "relu":
                h = jnp.maximum(h, 0.0)
            else:  # softplus100
                h = jax.nn.softplus(h * 100.0) / 100.0
    return h


def _kernel(spec: EndoSurfSpec, n_deform: int, compute_dtype, x_ref, t_ref,
            *refs):
    out_ref = refs[-1]
    flat = refs[:-1]
    weights = [(flat[2 * i], flat[2 * i + 1]) for i in range(len(flat) // 2)]
    deform_layers = [(w[...], b[...]) for w, b in weights[:n_deform]]
    sdf_layers = [(w[...], b[...]) for w, b in weights[n_deform:]]

    x = x_ref[...]
    t = t_ref[...]
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    if spec.use_deform:
        from endosurf_tpu.ops.encoding import freq_encode_dim
        d_in = (freq_encode_dim(3, spec.deform_pos_freqs)
                + freq_encode_dim(1, spec.deform_time_freqs))
        enc = jnp.concatenate([
            _freq_encode_inline(x, spec.deform_pos_freqs),
            _freq_encode_inline(t, spec.deform_time_freqs)], axis=-1)
        # Zero-pad the encoding to a 128 lane multiple; weight rows for the
        # padded lanes are zero (see fused_sdf_observed), so outputs match.
        pad = _round_up(d_in) - d_in
        if pad:
            enc = jnp.concatenate(
                [enc, jnp.zeros((enc.shape[0], pad), enc.dtype)], axis=-1)
        dx = _run_mlp(enc, enc, deform_layers, spec.deform.skips, "relu",
                      inv_sqrt2, compute_dtype)
        x_c = x + dx
    else:
        x_c = x

    enc_c = _freq_encode_inline(x_c, spec.sdf_pos_freqs,
                                pad_to=_round_up(
                                    3 * (1 + 2 * spec.sdf_pos_freqs)))
    h = _run_mlp(enc_c, enc_c, sdf_layers, spec.sdf.skips, "softplus100",
                 inv_sqrt2, compute_dtype)
    out_ref[...] = h[:, :1]


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
    n = x.shape[0]
    n_pad = (-n) % BLOCK_N
    if n_pad:
        x = jnp.concatenate([x, jnp.zeros((n_pad, 3), x.dtype)], 0)
        t = jnp.concatenate([t, jnp.zeros((n_pad, 1), t.dtype)], 0)
    n_total = x.shape[0]

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

    layer_arrays: List[jnp.ndarray] = []
    n_deform = 0
    if spec.use_deform:
        d_in = (freq_encode_dim(3, spec.deform_pos_freqs)
                + freq_encode_dim(1, spec.deform_time_freqs))
        deform = pad_layers(_effective_layers(params["deform_network"]),
                            d_in, spec.deform.skips)
        n_deform = len(deform)
        for w, b in deform:
            layer_arrays += [w, b]
    sdf_in = freq_encode_dim(3, spec.sdf_pos_freqs)
    for w, b in pad_layers(_effective_layers(params["sdf_network"]),
                           sdf_in, spec.sdf.skips):
        layer_arrays += [w, b]

    grid = (n_total // BLOCK_N,)
    in_specs = [
        pl.BlockSpec((BLOCK_N, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    # All weights/biases: full arrays resident in VMEM for every grid step.
    for arr in layer_arrays:
        in_specs.append(pl.BlockSpec(
            arr.shape, (lambda i: (0, 0)) if arr.ndim == 2 else (lambda i: (0,)),
            memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, spec, n_deform, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLOCK_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_total, 1), jnp.float32),
    )(x, t, *layer_arrays)
    return out[:n]
