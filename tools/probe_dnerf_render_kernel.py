#!/usr/bin/env python
"""One-shot TPU bring-up probe for the EndoNeRF whole-pipeline render
kernel (kernels/fused_render_dnerf.py): compile + run 2048-ray dispatches
at shipping precision and check NUMBERS against the composed XLA path
(round-3 lesson: interpret-mode parity does not validate Mosaic lowering).

Optional argv[1]: comma-separated block_r caps to sweep (e.g. 256,1024,2048).
"""
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from endosurf_tpu.ops.mlp import set_matmul_precision, set_sampling_precision
set_matmul_precision("default")
set_sampling_precision("default")

from endosurf_tpu.kernels import fused_render_dnerf as frd
from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                          init_dnerf_params,
                                          render_rays_inference)

spec = DNeRFSpec()
params = init_dnerf_params(jax.random.PRNGKey(0), spec)
rspec = DNeRFRenderSpec()
n = 2048
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
o = jnp.concatenate([jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
                     jnp.full((n, 1), -1.5)], -1)
tgt = jax.random.uniform(k2, (n, 3), minval=-0.2, maxval=0.2)
d = tgt - o
d = d / jnp.linalg.norm(d, -1, keepdims=True)
t = jax.random.uniform(k3, (n, 1))
# depth-guided slots: (gt-depth mean, sigma) — the eval contract
nf = jnp.concatenate([jnp.full((n, 1), 1.45), jnp.full((n, 1), 1.0)], -1)
rays = jnp.concatenate([o, d, nf, t], -1)
step = jnp.asarray(100000.0)

blocks = ([int(b) for b in sys.argv[1].split(",")]
          if len(sys.argv) > 1 else [frd.BLOCK_R])

ref = None
runs = [("off", blocks[0])] + [("auto", b) for b in blocks]
for mode, blk in runs:
    frd.set_dnerf_render_kernel_mode(mode)
    frd.set_block_r(blk)
    fn = jax.jit(lambda p, r: render_rays_inference(spec, rspec, p, r))
    t0 = time.time()
    out = fn(params, rays)
    c = np.asarray(out["color_map"])
    dep = np.asarray(out["depth_map"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(20):
        out = fn(params, rays)
    np.asarray(out["color_map"])[0, 0]
    ms = (time.time() - t0) / 20 * 1e3
    print({"mode": mode, "block_r": blk, "compile_s": round(compile_s, 1),
           "ms_per_2048rays": round(ms, 2),
           "rays_per_sec": round(n / ms * 1e3, 1),
           "color0": [round(float(x), 5) for x in c[0]],
           "depth_mean": round(float(dep.mean()), 5)}, flush=True)
    if mode == "off":
        ref, ref_d = c, dep
    else:
        print({"block_r": blk,
               "color_max_abs_diff": float(np.abs(c - ref).max()),
               "depth_max_abs_diff": float(np.abs(dep - ref_d).max())},
              flush=True)
frd.set_dnerf_render_kernel_mode("auto")
print("PROBE OK", flush=True)
