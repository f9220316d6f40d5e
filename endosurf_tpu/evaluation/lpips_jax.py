"""LPIPS (VGG16) perceptual metric in JAX.

Re-implements the LPIPS-VGG metric used by the reference
(/root/reference/src/trainer/utils.py:460-502): inputs scaled to [-1, 1],
ImageNet-style shift/scale, VGG16 features at relu{1_2, 2_2, 3_3, 4_3, 5_3},
per-location channel unit-normalization, learned 1x1 linear heads, spatial
mean, layer sum.

Pretrained weights cannot be downloaded in this environment (zero egress), so
the metric is weight-gated: it loads ``endosurf_tpu/weights/lpips_vgg16.npz``
if present (produce it elsewhere with tools/convert_lpips_weights.py) and
otherwise reports unavailability; callers degrade gracefully (metrics report
lpips=None, as cal_lpips does).
"""

from __future__ import annotations

import functools
import os
import os.path as osp
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_PATH = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                        "weights", "lpips_vgg16.npz")

# VGG16 conv layout: (out_channels, n_convs) per block.
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def validate_weights(raw) -> None:
    """Raise ValueError unless `raw` is a structurally valid weights map.

    The contract (what tools/convert_lpips_weights.py emits): 13 convs
    named conv{i}_w/_b in the VGG16 2-2-3-3-3 block grouping, HWIO layout
    with 3x3 kernels chaining from 3 input channels; 5 heads lin{i}_w,
    one per block tap, each [C_block] and non-negative (lpips heads are
    non-negative by construction — a negative entry means the wrong torch
    tensor was extracted). Channel WIDTHS are read from the arrays (the
    forward adapts), so the same check serves the full VGG16 file and the
    tiny-width oracle fixtures in tests/test_metrics.py.
    """
    n_convs_total = sum(n for _, n in _VGG_BLOCKS)
    expected_keys = {f"conv{i}_{s}" for i in range(n_convs_total)
                     for s in ("w", "b")}
    expected_keys |= {f"lin{i}_w" for i in range(len(_VGG_BLOCKS))}
    missing = sorted(expected_keys - set(raw))
    extra = sorted(set(raw) - expected_keys)
    if missing or extra:
        raise ValueError(
            f"lpips weights schema mismatch: missing={missing} extra={extra}")

    idx, c_in = 0, 3
    for bi, (_, n_convs) in enumerate(_VGG_BLOCKS):
        for _ in range(n_convs):
            w, b = raw[f"conv{idx}_w"], raw[f"conv{idx}_b"]
            if w.ndim != 4 or w.shape[:3] != (3, 3, c_in):
                raise ValueError(
                    f"lpips weights: conv{idx}_w has shape {tuple(w.shape)}, "
                    f"expected (3, 3, {c_in}, C_out) — convs must be HWIO "
                    "(see tools/convert_lpips_weights.py)")
            if b.shape != (w.shape[3],):
                raise ValueError(
                    f"lpips weights: conv{idx}_b shape {tuple(b.shape)} "
                    f"does not match conv{idx}_w out-channels {w.shape[3]}")
            c_in = w.shape[3]
            idx += 1
        lin = np.asarray(raw[f"lin{bi}_w"])
        if lin.shape != (c_in,):
            raise ValueError(
                f"lpips weights: lin{bi}_w shape {lin.shape} does not match "
                f"block-{bi} tap width ({c_in},)")
        if lin.min() < 0:
            raise ValueError(
                f"lpips weights: lin{bi}_w has negative entries; lpips "
                "linear heads are non-negative — wrong tensor extracted?")


def _conv(x, w, b):
    # x: [B,H,W,C]; w: [kh,kw,in,out] (converted from torch OIHW).
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision="highest")
    return y + b


def _vgg_features(weights, x):
    """Run VGG16 conv stack, returning post-relu block outputs."""
    feats = []
    idx = 0
    for bi, (_, n_convs) in enumerate(_VGG_BLOCKS):
        for ci in range(n_convs):
            x = jax.nn.relu(_conv(x, weights[f"conv{idx}_w"],
                                  weights[f"conv{idx}_b"]))
            idx += 1
        feats.append(x)
        if bi != len(_VGG_BLOCKS) - 1:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat ** 2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips_fn(path: Optional[str] = None) -> Optional[Callable]:
    """Return a jitted lpips(a, b) over [B,H,W,3] images in [0,1], or None.

    `path` defaults to `$ESN_LPIPS_WEIGHTS` if set, else the module-level
    WEIGHTS_PATH (both genuinely resolved at EVERY call: the build cache
    below is keyed on the concrete resolved path, and a file-absent None is
    never cached — so setting the env var or dropping the file in after an
    early call still enables the metric for later calls in the same
    process). Returns None only when the weights file is absent (the
    zero-egress gap); a PRESENT file that fails schema validation raises,
    so a bad conversion can't silently disable the metric.
    """
    if path is None:
        path = os.environ.get("ESN_LPIPS_WEIGHTS") or WEIGHTS_PATH
    if not osp.exists(path):
        return None
    return _build_lpips(path)


@functools.lru_cache(maxsize=2)
def _build_lpips(path: str) -> Callable:
    """Load + validate + jit-wrap the weights at `path` (cached per path)."""
    raw = dict(np.load(path))
    validate_weights(raw)
    weights = {k: jnp.asarray(v) for k, v in raw.items()}

    @jax.jit
    def fn(a, b):
        # [0,1] -> [-1,1] -> LPIPS normalization.
        def prep(img):
            img = img * 2.0 - 1.0
            return (img - _SHIFT) / _SCALE
        fa = _vgg_features(weights, prep(a))
        fb = _vgg_features(weights, prep(b))
        total = 0.0
        for li, (xa, xb) in enumerate(zip(fa, fb)):
            diff = (_normalize(xa) - _normalize(xb)) ** 2
            lin = weights[f"lin{li}_w"]  # [C] nonneg 1x1 head
            total = total + jnp.mean(jnp.sum(diff * lin, axis=-1),
                                     axis=(1, 2))
        return total

    return fn


# Back-compat for callers of the formerly lru_cache'd lpips_fn: clearing
# through lpips_fn.cache_clear still empties the (path-keyed) build cache.
lpips_fn.cache_clear = _build_lpips.cache_clear
