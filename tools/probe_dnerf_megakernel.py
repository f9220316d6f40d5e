#!/usr/bin/env python
"""One-shot TPU bring-up probe for the D-NeRF fwd+bwd megakernel
(kernels/fused_train_dnerf.py): compile + run the fused field eval and its
gradient at the flagship fine-pass batch (2048 rays x 128 samples = 262,144
points), CHECK THE NUMBERS against the XLA chain on-device, then A/B the
full EndoNeRF train step. Run this before any queue stage exercises the
kernel (CLAUDE.md probe-numbers rule)."""
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from endosurf_tpu.models.fields import set_deform_jac_mode
from endosurf_tpu.ops.mlp import (set_activation_dtype, set_matmul_precision,
                                  set_sampling_precision)

set_matmul_precision("default")
set_sampling_precision("default")
set_activation_dtype("bfloat16")
set_deform_jac_mode("linearize")

from endosurf_tpu.kernels import fused_train_dnerf as ftd
from endosurf_tpu.models.endonerf import DNeRFSpec, init_dnerf_params

spec = DNeRFSpec()
params = init_dnerf_params(jax.random.PRNGKey(0), spec)
n = 2048 * 128
kx, kd, kt, kr, ks = jax.random.split(jax.random.PRNGKey(1), 5)
x = jax.random.uniform(kx, (n, 3), minval=-0.8, maxval=0.8)
d = jax.random.normal(kd, (n, 3))
d = d / jnp.linalg.norm(d, -1, keepdims=True)
t = jax.random.uniform(kt, (n, 1))
cr = jax.random.normal(kr, (n, 3)) * 0.01
cs = jax.random.normal(ks, (n,)) * 0.01


def loss(p, xx, dd, tt):
    rgb, raw = ftd.megakernel_field_raw(spec, p, xx, dd, tt)
    return jnp.sum(rgb * cr) + jnp.sum(jax.nn.relu(raw) * cs)


results = {}
for mode in ("off", "on"):
    ftd.set_dnerf_megakernel_mode(mode)
    if mode == "off":
        def loss_ref(p, xx, dd, tt):
            from endosurf_tpu.models.endonerf import _field_raw
            rgb, raw = _field_raw(spec, p, xx, dd, tt)
            return jnp.sum(rgb * cr) + jnp.sum(jax.nn.relu(raw) * cs)
        fn = jax.jit(jax.value_and_grad(loss_ref))
    else:
        fn = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    val, grads = fn(params, x, d, t)
    v = float(np.asarray(val))
    compile_s = time.time() - t0
    t0 = time.time()
    iters = 20
    for _ in range(iters):
        val, grads = fn(params, x, d, t)
    float(np.asarray(val))
    ms = (time.time() - t0) / iters * 1e3
    g0 = np.asarray(jax.tree_util.tree_leaves(grads)[0])
    results[mode] = (v, grads)
    print(json.dumps({"mode": mode, "compile_s": round(compile_s, 1),
                      "fwdbwd_ms": round(ms, 2), "loss": v,
                      "g0_sample": float(g0.ravel()[0])}), flush=True)

v_off, g_off = results["off"]
v_on, g_on = results["on"]
worst = 0.0
for a, b in zip(jax.tree_util.tree_leaves(g_off),
                jax.tree_util.tree_leaves(g_on)):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    scale = max(1e-6, float(np.abs(a).max()))
    worst = max(worst, float(np.abs(a - b).max()) / scale)
print(json.dumps({"loss_rel_diff": abs(v_on - v_off) / max(1e-9, abs(v_off)),
                  "grad_worst_rel_to_leafmax": worst}), flush=True)

# --- full train step A/B --------------------------------------------------
import optax

from endosurf_tpu.data.scene_data import make_synthetic_arrays
from endosurf_tpu.models.endonerf import DNeRFRenderSpec
from endosurf_tpu.train.schedules import exponential
from endosurf_tpu.train.trainer_endonerf import make_train_step

scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
rspec = DNeRFRenderSpec()
ray_batch = 2048
tx = optax.adam(exponential(5e-4, 250))
weights = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}

for mode in ("off", "auto"):
    ftd.set_dnerf_megakernel_mode(mode)
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, ray_batch,
                              weights)
    p = init_dnerf_params(jax.random.PRNGKey(0), spec)
    o = tx.init(p)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    key, k = jax.random.split(key)
    p, o, m = step_fn(p, o, scene.device_arrays, k, jnp.asarray(1.0))
    l0 = float(np.asarray(m["loss_total"]))
    compile_s = time.time() - t0
    t0 = time.time()
    iters = 50
    for i in range(iters):
        key, k = jax.random.split(key)
        p, o, m = step_fn(p, o, scene.device_arrays, k,
                          jnp.asarray(float(i + 2)))
    lN = float(np.asarray(m["loss_total"]))
    ms = (time.time() - t0) / iters * 1e3
    print(json.dumps({"step_mode": mode, "compile_s": round(compile_s, 1),
                      "step_ms": round(ms, 2),
                      "rays_per_sec": round(ray_batch / ms * 1e3, 1),
                      "loss_step1": l0, "loss_step51": lN}), flush=True)
print("PROBE OK", flush=True)
