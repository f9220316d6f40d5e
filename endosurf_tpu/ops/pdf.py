"""Inverse-CDF (importance) sampling utilities.

Functional equivalents of the reference's ``sample_pdf``
(/root/reference/src/renderer/utils.py:160-191) and the mask-guided pixel
sampler (/root/reference/src/dataset/dataset.py:237-258), designed for TPU:
fixed shapes, no data-dependent control flow, and searchsorted expressed as a
broadcast-compare-reduce (the bin counts here are tiny, so an O(S*B) vectorized
compare beats gather-heavy binary search on the VPU).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _searchsorted_right(sorted_seq: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(..., right=True)``.

    Args:
      sorted_seq: [..., B] ascending along the last axis.
      values: [..., S] query values (same leading dims).

    Returns: [..., S] int32 insertion indices in [0, B].
    """
    return jnp.sum(
        sorted_seq[..., None, :] <= values[..., :, None], axis=-1
    ).astype(jnp.int32)


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Draw samples along rays proportional to per-bin weights.

    Args:
      bins: [..., B] bin edges (e.g. z values), ascending.
      weights: [..., B-1] non-negative weights per bin interval.
      n_samples: number of samples per ray (static).
      key: PRNG key for stratified-uniform draws; ``None`` selects the
        deterministic midpoint rule (matches reference ``det=True``,
        renderer/utils.py:169-171).

    Returns: [..., n_samples] sampled positions.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., B]

    batch_shape = cdf.shape[:-1]
    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples,
                         dtype=cdf.dtype)
        u = jnp.broadcast_to(u, batch_shape + (n_samples,))
    else:
        u = jax.random.uniform(key, batch_shape + (n_samples,), dtype=cdf.dtype)

    inds = _searchsorted_right(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def inverse_cdf_sample(
    weights: jnp.ndarray,
    n_samples: int,
    key: jax.Array,
) -> jnp.ndarray:
    """Sample ``n_samples`` indices from an unnormalized weight vector.

    TPU-native replacement for the reference's mask-guided pixel selection
    (dataset.py:135-142): indices are drawn i.i.d. proportionally to
    ``weights`` via inverse-CDF with uniform randoms (with replacement —
    statistically matching the reference's importance path).

    Args:
      weights: [N] non-negative weights (zeros are never selected beyond the
        1e-12 floor).
      n_samples: number of indices (static).
      key: PRNG key.

    Returns: [n_samples] int32 indices in [0, N).
    """
    cdf = jnp.cumsum(weights + 1e-12)
    return sample_from_cdf(cdf / cdf[-1], n_samples, key)


def sample_from_cdf(cdf: jnp.ndarray, n_samples: int,
                    key: jax.Array) -> jnp.ndarray:
    """Draw indices from a normalized CDF via binary search.

    For large domains (per-frame pixel CDFs are H*W ~ 3e5 entries) binary
    search (log2(N) gathers) beats the broadcast compare-reduce used for the
    tiny per-ray z bins by orders of magnitude.

    Args:
      cdf: [N] non-decreasing, cdf[-1] == 1.
      n_samples: number of indices (static).
      key: PRNG key.

    Returns: [n_samples] int32 indices in [0, N).
    """
    u = jax.random.uniform(key, (n_samples,), dtype=cdf.dtype)
    inds = jnp.searchsorted(cdf, u, side="left").astype(jnp.int32)
    return jnp.clip(inds, 0, cdf.shape[0] - 1)


def sample_from_alias(prob: jnp.ndarray, alias: jnp.ndarray, n_samples: int,
                      key: jax.Array) -> jnp.ndarray:
    """Draw indices from a Walker/Vose alias table (native.alias_table).

    Same categorical distribution as sample_from_cdf on the weights the
    table was built from, but O(1) per draw: one randint, one uniform, TWO
    [n_samples]-sized gathers — vs the ~log2(N)=18 serial gather rounds a
    searchsorted over an H*W~3e5 pixel CDF costs on TPU.

    Args:
      prob: [N] float32 acceptance probabilities.
      alias: [N] int32 alias indices.
      n_samples: number of indices (static).
      key: PRNG key.

    Returns: [n_samples] int32 indices in [0, N).
    """
    k_j, k_u = jax.random.split(key)
    j = jax.random.randint(k_j, (n_samples,), 0, prob.shape[0],
                           dtype=jnp.int32)
    u = jax.random.uniform(k_u, (n_samples,), dtype=prob.dtype)
    return jnp.where(u < prob[j], j, alias[j]).astype(jnp.int32)
