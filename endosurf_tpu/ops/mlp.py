"""Weight-normalized skip MLPs with SAL/IDR geometric initialization.

Functional (pytree params + pure apply) re-implementation of the reference's
MLP builders (/root/reference/src/renderer/utils.py:11-111). Initialization is
distribution-identical to the reference:

  * default layers: PyTorch ``nn.Linear`` init — weight and bias both
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
  * geometric init (SAL): last layer weight ~ N(+-sqrt(pi)/sqrt(fan_in), 1e-4)
    with constant bias, first layer zeroing the frequency-encoded tail, skip
    layers zeroing the re-injected encoding block,
  * weight norm: params stored as direction ``v`` and magnitude ``g`` with
    ``g`` initialized to the per-output-unit norm of ``v`` (matching
    ``nn.utils.weight_norm`` at wrap time).

Weights are stored [in, out] so the hot path is a plain ``x @ W`` that XLA
tiles directly onto the MXU; the weight-norm renormalization is O(in*out) per
step and fuses with the parameter load.

Two layer-size layouts exist, as in the reference:
  * "nerf" (utils.py:11-60): a skip layer's input is hidden+in (concat grows).
  * "idr"  (utils.py:63-111): the layer before a skip shrinks to hidden-in so
    the concat lands back on hidden.
Both share the same forward rule: h = concat([h, x_enc])/sqrt(2) before each
skip layer (endosurf.py:732-737, 778-783).
"""

from __future__ import annotations

import contextlib
import math
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# Matmul precision for field MLPs. "highest" = true float32 accumulation
# (needed for SDF-gradient parity tests and eikonal stability); flip to
# "default" (bf16 MXU passes) or "high" (bf16x3) for throughput experiments.
_MATMUL_PRECISION: str = "highest"

# Optional override for *sampling-only* field evaluations (importance
# upsampling, sphere-traced ray marching): these run under stop_gradient and
# only pick sample locations, so they tolerate bf16 regardless of the main
# precision. None = inherit the main precision.
_SAMPLING_PRECISION: Optional[str] = None

# Optional storage dtype for the field-MLP compute path. The flagship
# fwd+bwd is HBM-bandwidth-bound on saved activations (VALIDATION.md:
# 20.7 GB/step). When set to bf16, the whole MLP interior runs narrow:
# encoded inputs, effective weights, biases, pre- and post-activation
# tensors are all bf16, so every residual the backward pass re-reads is
# half-width (the TPU MXU still accumulates bf16 matmuls in f32
# internally). The final layer output is cast back to the caller's dtype
# so renderer/loss math stays f32. NOTE: a mere post-activation
# ``astype`` does NOT work — JAX promotes bf16 @ f32 back to f32 before
# the dot and XLA stores the wide tensor; measured bytes-accessed was
# bit-identical (tools/scratch_act_bytes.py). Both dot operands must be
# narrow for anything narrow to be stored.
_ACTIVATION_DTYPE = None


def set_activation_dtype(dtype: Optional[str]) -> None:
    """None | "bfloat16" — storage dtype for the field-MLP interior."""
    global _ACTIVATION_DTYPE
    assert dtype in (None, "bfloat16", "float32")
    _ACTIVATION_DTYPE = jnp.bfloat16 if dtype == "bfloat16" else None


def set_matmul_precision(precision: str) -> None:
    global _MATMUL_PRECISION
    assert precision in ("default", "high", "highest")
    _MATMUL_PRECISION = precision


def get_matmul_precision() -> str:
    return _MATMUL_PRECISION


def set_sampling_precision(precision: Optional[str]) -> None:
    global _SAMPLING_PRECISION
    assert precision in (None, "default", "high", "highest")
    _SAMPLING_PRECISION = precision


def get_sampling_precision() -> Optional[str]:
    return _SAMPLING_PRECISION


@contextlib.contextmanager
def matmul_precision_scope(precision: Optional[str]):
    """Trace-time precision override for a code region (None = no-op)."""
    global _MATMUL_PRECISION
    if precision is None:
        yield
        return
    old = _MATMUL_PRECISION
    set_matmul_precision(precision)
    try:
        yield
    finally:
        _MATMUL_PRECISION = old


@contextlib.contextmanager
def sampling_precision_scope():
    """Apply the sampling-precision override (if any) to a traced region."""
    with matmul_precision_scope(_SAMPLING_PRECISION):
        yield


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with beta=100 (reference SDF activation, endosurf.py:771)."""
    return jax.nn.softplus(x * 100.0) / 100.0


ACTIVATIONS: Dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "relu": jax.nn.relu,
    "softplus100": softplus100,
}


def _layer_dims(
    n_layers: int,
    hidden_dim: int,
    in_dim: int,
    out_dim: int,
    skips: Sequence[int],
    style: str,
) -> List[tuple]:
    dims = []
    for l in range(n_layers):
        if style == "nerf":
            d0 = in_dim if l == 0 else (hidden_dim + in_dim if l in skips else hidden_dim)
            d1 = out_dim if l == n_layers - 1 else hidden_dim
        elif style == "idr":
            d0 = in_dim if l == 0 else hidden_dim
            if l == n_layers - 1:
                d1 = out_dim
            elif (l + 1) in skips:
                d1 = hidden_dim - in_dim
                if d1 <= 0:
                    raise ValueError(
                        f"idr-style skip MLP needs hidden_dim > encoded "
                        f"in_dim (got hidden={hidden_dim}, in={in_dim})")
            else:
                d1 = hidden_dim
        else:
            raise ValueError(f"unknown mlp style {style!r}")
        dims.append((d0, d1))
    return dims


def _torch_default_linear(key: jax.Array, d0: int, d1: int, dtype) -> tuple:
    """PyTorch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d0)
    w = jax.random.uniform(kw, (d0, d1), dtype, -bound, bound)
    b = jax.random.uniform(kb, (d1,), dtype, -bound, bound)
    return w, b


def _geometric_linear(
    key: jax.Array,
    l: int,
    n_layers: int,
    d0: int,
    d1: int,
    in_dim: int,
    skips: Sequence[int],
    bias_val: float,
    inside_outside: bool,
    dtype,
) -> tuple:
    """SAL geometric init for one layer (utils.py:38-56). Weight is [d0, d1]."""
    if l == n_layers - 1:
        mean = math.sqrt(math.pi) / math.sqrt(d0)
        if inside_outside:
            mean, b_const = -mean, bias_val
        else:
            b_const = -bias_val
        w = mean + 0.0001 * jax.random.normal(key, (d0, d1), dtype)
        b = jnp.full((d1,), b_const, dtype)
    elif l == 0:
        std = math.sqrt(2.0) / math.sqrt(d1)
        w = std * jax.random.normal(key, (d0, d1), dtype)
        # Zero the frequency-encoded tail: only raw xyz feeds layer 0.
        w = w.at[3:, :].set(0.0)
        b = jnp.zeros((d1,), dtype)
    elif l in skips:
        std = math.sqrt(2.0) / math.sqrt(d1)
        w = std * jax.random.normal(key, (d0, d1), dtype)
        # Zero the re-injected encoding block (all but raw xyz of the concat).
        w = w.at[-(in_dim - 3):, :].set(0.0)
        b = jnp.zeros((d1,), dtype)
    else:
        std = math.sqrt(2.0) / math.sqrt(d1)
        w = std * jax.random.normal(key, (d0, d1), dtype)
        b = jnp.zeros((d1,), dtype)
    return w, b


def init_skip_mlp(
    key: jax.Array,
    n_layers: int,
    hidden_dim: int,
    in_dim: int,
    out_dim: int,
    skips: Sequence[int] = (),
    style: str = "nerf",
    geometric_init: bool = False,
    geometric_init_bias: float = 0.8,
    inside_outside: bool = False,
    weight_norm: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Initialize a skip MLP parameter pytree."""
    dims = _layer_dims(n_layers, hidden_dim, in_dim, out_dim, skips, style)
    keys = jax.random.split(key, n_layers)
    layers = []
    for l, ((d0, d1), k) in enumerate(zip(dims, keys)):
        if geometric_init:
            w, b = _geometric_linear(
                k, l, n_layers, d0, d1, in_dim, skips,
                geometric_init_bias, inside_outside, dtype)
        else:
            w, b = _torch_default_linear(k, d0, d1, dtype)
        if weight_norm:
            g = jnp.linalg.norm(w, axis=0)  # per-output-unit magnitude
            layers.append({"v": w, "g": g, "b": b})
        else:
            layers.append({"w": w, "b": b})
    return {"layers": layers}


def linear_apply(layer: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply one (possibly weight-normalized) linear layer.

    The weight-norm renormalization always runs in f32 (it is per-step,
    point-independent work that XLA hoists out of the batched loop); the
    effective weight is then cast to the incoming activation dtype so a
    bf16 storage mode stays bf16 end-to-end through the dot.
    """
    prec = _MATMUL_PRECISION
    if "v" in layer:
        v = layer["v"]
        scale = layer["g"] / (jnp.linalg.norm(v, axis=0) + 1e-12)
        w = v * scale[None, :]
    else:
        w = layer["w"]
    b = layer["b"]
    if x.dtype != w.dtype:
        w = w.astype(x.dtype)
        b = b.astype(x.dtype)
    return jnp.dot(x, w, precision=prec) + b


def skip_mlp_apply(
    params: Params,
    x_enc: jnp.ndarray,
    skips: Sequence[int] = (),
    activation: str = "relu",
    skip_scale: float = 1.0 / math.sqrt(2.0),
) -> jnp.ndarray:
    """Run a skip MLP on encoded input (no output activation).

    Skip rule matches the reference forward passes (endosurf.py:732-737,
    778-783, 835-840): before each skip layer the running features are
    concatenated with the encoded input and scaled by ``skip_scale``
    (1/sqrt(2) for EndoSurf nets; the DNeRF baseline concatenates unscaled,
    endonerf.py:347-352 — pass skip_scale=1.0).
    """
    act = ACTIVATIONS[activation]
    layers = params["layers"]
    n_layers = len(layers)
    sd = _ACTIVATION_DTYPE
    out_dtype = x_enc.dtype
    if sd is not None:
        # Narrow the whole MLP interior (see _ACTIVATION_DTYPE note): the
        # encoded input, every dot operand, and every saved residual run
        # at the storage dtype; only the final output is widened back.
        x_enc = x_enc.astype(sd)
    h = x_enc
    for l, layer in enumerate(layers):
        if l in skips:
            h = jnp.concatenate([h, x_enc], axis=-1) * skip_scale
        h = linear_apply(layer, h)
        if l != n_layers - 1:
            h = act(h)
    return h.astype(out_dtype) if sd is not None else h
