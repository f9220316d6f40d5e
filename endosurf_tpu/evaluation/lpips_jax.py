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


@functools.lru_cache(maxsize=1)
def lpips_fn() -> Optional[Callable]:
    """Return a jitted lpips(a, b) over [B,H,W,3] images in [0,1], or None."""
    if not osp.exists(WEIGHTS_PATH):
        return None
    raw = dict(np.load(WEIGHTS_PATH))
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
