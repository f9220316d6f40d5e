"""Positional (frequency) encoding.

Matches the encoding family of the reference (/root/reference/src/renderer/
encoder.py:16-54): identity passthrough or NeRF-style log-spaced sin/cos
frequency encoding with the raw input prepended. Frequency interleave order is
[sin(x*2^0), cos(x*2^0), sin(x*2^1), ...] per octave, matching the reference's
per-frequency (sin, cos) loop so downstream geometric inits that zero "the
encoded tail" line up exactly.

TPU notes: the encoding is a pure elementwise map; XLA fuses it into the first
matmul of the consuming MLP. Frequencies are baked as compile-time constants.
"""

from __future__ import annotations

import jax.numpy as jnp


def freq_encode_dim(input_dim: int, n_freqs: int, include_input: bool = True) -> int:
    """Output dimension of :func:`freq_encode`."""
    out = input_dim if include_input else 0
    return out + input_dim * n_freqs * 2


def freq_encode(x: jnp.ndarray, n_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """Log-spaced sin/cos frequency encoding.

    Args:
      x: [..., D] input in roughly [-1, 1].
      n_freqs: number of octaves; frequencies are 2^0 .. 2^(n_freqs-1).
      include_input: prepend the raw input.

    Returns: [..., D * (include_input + 2*n_freqs)]
    """
    if n_freqs == 0:
        return x
    parts = [x] if include_input else []
    # One fused (..., n_freqs, D) computation keeps the op count constant
    # regardless of octave count; XLA folds the broadcast multiply.
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)  # [F]
    scaled = x[..., None, :] * freqs[:, None]  # [..., F, D]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # Interleave per-frequency (sin_f, cos_f) blocks: [..., F, 2, D] -> flat.
    inter = jnp.stack([sin, cos], axis=-2)
    flat = inter.reshape(*x.shape[:-1], n_freqs * 2 * x.shape[-1])
    parts.append(flat)
    return jnp.concatenate(parts, axis=-1)
