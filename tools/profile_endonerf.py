#!/usr/bin/env python
"""EndoNeRF flagship-step attribution (the round-2 treatment, applied to
the baseline vertical): per-piece burst timings + XLA cost analysis of the
full train step at the shipping precision modes.

Pieces (reference endonerf.py:56-120 structure):
  coarse_fwd   — 64-sample stop-grad eval that shapes the importance CDF
  pdf_glue     — sample_pdf + concat + 128-wide sort (lane-unfriendly XLA)
  fine_fwd     — 128-sample field eval (the gradient path)
  render_fwd   — whole render_rays forward
  train_step   — full fwd+bwd+Adam (the bench.py quantity)

Usage: python tools/profile_endonerf.py [--rays 2048] [--iters 30]
JSON lines to stdout; keep for VALIDATION.md.
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def fence(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def burst(fn, args, iters, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              field_eval, init_dnerf_params,
                                              raw2outputs, render_rays)
    from endosurf_tpu.ops.mlp import (sampling_precision_scope,
                                      set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.ops.pdf import sample_pdf
    from endosurf_tpu.train.schedules import exponential
    from endosurf_tpu.train.trainer_endonerf import make_train_step

    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")

    spec = DNeRFSpec()
    rspec = DNeRFRenderSpec()
    params = init_dnerf_params(jax.random.PRNGKey(0), spec)

    n = args.rays
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    o = jnp.concatenate(
        [jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
         jnp.full((n, 1), -1.5)], axis=-1)
    target = jax.random.uniform(k2, (n, 3), minval=-0.2, maxval=0.2)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(k3, (n, 1))
    # depth-guided sampling slots: mean ~ surface depth, std
    mean = jnp.full((n, 1), 1.4)
    std = jnp.full((n, 1), 0.2)
    rays = jnp.concatenate([o, d, mean, std, t], axis=-1)
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    rays_d_z = rays_d / (rays_d[:, 2:3] + 1e-5)

    kz = jax.random.PRNGKey(2)
    z0 = jnp.sort(mean + std * jax.random.normal(
        kz, (n, rspec.n_samples)), axis=-1)

    def coarse_fwd(p):
        with sampling_precision_scope():
            pts = rays_o[:, None, :] + rays_d_z[:, None, :] * z0[..., None]
            dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
            tt = jnp.broadcast_to(t[:, None, :],
                                  (n, rspec.n_samples, 1))
            rgb, sigma = field_eval(spec, p, pts.reshape(-1, 3),
                                    dirs.reshape(-1, 3), tt.reshape(-1, 1),
                                    None)
        return rgb.reshape(n, -1, 3), sigma.reshape(n, -1)

    rgb_c, sigma_c = jax.jit(coarse_fwd)(params)

    def pdf_glue(sig):
        _, _, w = raw2outputs(rgb_c, sig, z0, rays_d)
        z_mid = 0.5 * (z0[..., 1:] + z0[..., :-1])
        z_s = sample_pdf(z_mid, w[..., 1:-1], rspec.n_importance, key=None)
        return jnp.sort(jnp.concatenate([z0, z_s], -1), axis=-1)

    z_all = jax.jit(pdf_glue)(sigma_c)

    def fine_fwd(p):
        pts = rays_o[:, None, :] + rays_d_z[:, None, :] * z_all[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
        tt = jnp.broadcast_to(t[:, None, :], (n, z_all.shape[1], 1))
        rgb, sigma = field_eval(spec, p, pts.reshape(-1, 3),
                                dirs.reshape(-1, 3), tt.reshape(-1, 1),
                                None)
        return raw2outputs(rgb.reshape(n, -1, 3), sigma.reshape(n, -1),
                           z_all, rays_d)[0]

    def render_fwd(p):
        return render_rays(spec, rspec, p, rays,
                           key=jax.random.PRNGKey(3))["color_map"]

    for name, fn in (("coarse_fwd", coarse_fwd), ("pdf_glue", pdf_glue),
                     ("fine_fwd", fine_fwd), ("render_fwd", render_fwd)):
        a = (sigma_c,) if name == "pdf_glue" else (params,)
        f = jax.jit(fn)
        ms = burst(f, a, args.iters) * 1e3
        print(json.dumps({"piece": name, "rays": n, "ms": round(ms, 2)}),
              flush=True)

    # full train step + cost analysis
    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    tx = optax.adam(exponential(5e-4, 250))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, n, lw)
    p = init_dnerf_params(jax.random.PRNGKey(0), spec)
    ostate = tx.init(p)
    arrays = scene.device_arrays
    k = jax.random.PRNGKey(4)

    def one(p, ostate, k, i):
        return step_fn(p, ostate, arrays, k, jnp.asarray(float(i)))

    for i in range(3):
        k, kk = jax.random.split(k)
        p, ostate, m = one(p, ostate, kk, i + 1)
    fence(m["loss_total"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        k, kk = jax.random.split(k)
        p, ostate, m = one(p, ostate, kk, i + 4)
    fence(m["loss_total"])
    step_ms = (time.perf_counter() - t0) / args.iters * 1e3
    try:
        lowered = jax.jit(step_fn).lower(p, ostate, arrays, k,
                                         jnp.asarray(1.0))
        ca = lowered.compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = ca.get("flops", 0.0)
        bytes_ = ca.get("bytes accessed", 0.0)
    except Exception:
        flops = bytes_ = -1.0
    print(json.dumps({"piece": "train_step", "rays": n,
                      "ms": round(step_ms, 2),
                      "rays_per_sec": round(n / step_ms * 1e3, 1),
                      "gflops_per_step": round(flops / 1e9, 1),
                      "gb_per_step": round(bytes_ / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
