#!/usr/bin/env python
"""One-shot TPU bring-up probe for the fused render kernel: compile + run
one 2048-ray dispatch at shipping precision, compare against the XLA path."""
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

from endosurf_tpu.kernels.fused_render import set_render_kernel_mode
from endosurf_tpu.models.endosurf import RenderSpec, render_rays_inference
from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params

spec = EndoSurfSpec()
params = init_endosurf_params(jax.random.PRNGKey(0), spec)
rspec = RenderSpec()
n = 2048
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
o = jnp.concatenate([jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
                     jnp.full((n, 1), -1.5)], -1)
tgt = jax.random.uniform(k2, (n, 3), minval=-0.2, maxval=0.2)
d = tgt - o
d = d / jnp.linalg.norm(d, -1, keepdims=True)
t = jax.random.uniform(k3, (n, 1))
rays = jnp.concatenate([o, d, jnp.zeros((n, 2)), t], -1)
step = jnp.asarray(100000.0)

for mode in ("off", "auto"):
    set_render_kernel_mode(mode)
    fn = jax.jit(lambda p, r: render_rays_inference(spec, rspec, p, r, step))
    t0 = time.time()
    out = fn(params, rays)
    c = np.asarray(out["color_map"])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(20):
        out = fn(params, rays)
    np.asarray(out["color_map"])[0, 0]
    ms = (time.time() - t0) / 20 * 1e3
    print({"mode": mode, "compile_s": round(compile_s, 1),
           "ms_per_2048rays": round(ms, 2),
           "rays_per_sec": round(n / ms * 1e3, 1),
           "color0": [round(float(x), 5) for x in c[0]]}, flush=True)
    if mode == "off":
        ref = c
    else:
        print({"max_abs_diff_vs_off": float(np.abs(c - ref).max())},
              flush=True)
print("PROBE OK", flush=True)
