#!/usr/bin/env python
"""One-process sampler-megakernel A/B: isolated upsample / ray-march stage
timings and the full flagship train step with the Pallas sampler kernels
(kernels/fused_sampler.py) on vs off, at the shipping precision.

Single process by design: the tunneled TPU wedges after process exits and
its dispatch latency drifts between processes (CLAUDE.md).

Output: JSON lines to stdout (keep for VALIDATION.md).
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
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--megakernel", default="auto",
                    help="fwd+bwd megakernel mode during the train-step A/B")
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.kernels import fused_sampler as fsmp
    from endosurf_tpu.models.endosurf import (RenderSpec, _split_rays,
                                              ray_march, render_rays,
                                              surface_neighbour_error,
                                              upsample_z, _stratified_z)
    from endosurf_tpu.models.fields import (EndoSurfSpec,
                                            init_endosurf_params,
                                            set_deform_jac_mode,
                                            set_megakernel_mode)
    from endosurf_tpu.ops.geometry import ray_sphere_intersection
    from endosurf_tpu.ops.mlp import (sampling_precision_scope,
                                      set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    set_deform_jac_mode("linearize")
    set_megakernel_mode(args.megakernel)

    spec = EndoSurfSpec()
    rspec = RenderSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)

    n = args.rays
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    o = jnp.concatenate(
        [jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
         jnp.full((n, 1), -1.5)], axis=-1)
    target = jax.random.uniform(k2, (n, 3), minval=-0.2, maxval=0.2)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(k3, (n, 1))
    rays = jnp.concatenate([o, d, jnp.zeros((n, 2)), t], axis=-1)
    rays_o, rays_d, rays_d_z, tt = _split_rays(rays)
    near, far, _ = ray_sphere_intersection(rays_o, rays_d)
    z0 = _stratified_z(near, far, rspec.n_samples, None)

    # ---- isolated upsample ------------------------------------------------
    def up_jnp(p):
        with sampling_precision_scope():
            return upsample_z(spec, rspec, p, rays_o, rays_d_z, tt, z0)

    def up_kernel(p):
        with sampling_precision_scope():
            return fsmp.fused_upsample_z(
                spec, p, rays_o, rays_d_z, tt, z0, rspec.n_importance,
                rspec.up_sample_steps, compute_dtype=jnp.bfloat16)

    for name, fn in (("xla", up_jnp), ("kernel", up_kernel)):
        fsmp.set_sampler_kernel_mode("off")   # jnp path must not re-dispatch
        try:
            f = jax.jit(fn)
            t0 = time.perf_counter()
            fence(f(params))
            compile_s = time.perf_counter() - t0
            ms = burst(f, (params,), args.iters) * 1e3
            print(json.dumps({"section": "upsample", "path": name,
                              "rays": n, "ms": round(ms, 2),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:  # keep the A/B alive if one path won't compile
            print(json.dumps({"section": "upsample", "path": name,
                              "error": str(e)[:400]}), flush=True)

    # ---- isolated ray march ----------------------------------------------
    def march_jnp(p):
        with sampling_precision_scope():
            return ray_march(spec, p, rays)[0]

    def march_kernel(p):
        with sampling_precision_scope():
            return fsmp.fused_ray_march(
                spec, p, rays_o, rays_d_z, tt, near, far,
                compute_dtype=jnp.bfloat16)[0]

    for name, fn in (("xla", march_jnp), ("kernel", march_kernel)):
        fsmp.set_sampler_kernel_mode("off")
        try:
            f = jax.jit(fn)
            t0 = time.perf_counter()
            fence(f(params))
            compile_s = time.perf_counter() - t0
            ms = burst(f, (params,), args.iters) * 1e3
            print(json.dumps({"section": "ray_march", "path": name,
                              "rays": n, "ms": round(ms, 2),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"section": "ray_march", "path": name,
                              "error": str(e)[:400]}), flush=True)

    # ---- full train step, sampler kernels on vs off -----------------------
    if args.skip_step:
        return
    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    loss_weights = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                    "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
                    "eikonal_loss_weight": 0.1,
                    "surf_neig_loss_weight": 0.1}
    arrays = scene.device_arrays
    for mode in ("off", "on"):
        fsmp.set_sampler_kernel_mode(mode)
        try:
            step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w,
                                      args.rays, loss_weights,
                                      surf_neig_rad=0.1, remat=False)
            p = init_endosurf_params(jax.random.PRNGKey(0), spec)
            ostate = tx.init(p)
            k = jax.random.PRNGKey(3)
            t0 = time.perf_counter()
            for i in range(3):
                k, kk = jax.random.split(k)
                p, ostate, m = step_fn(p, ostate, arrays, kk,
                                       jnp.asarray(float(i + 1)))
            fence(m["loss_total"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(args.iters):
                k, kk = jax.random.split(k)
                p, ostate, m = step_fn(p, ostate, arrays, kk,
                                       jnp.asarray(float(i + 4)))
            fence(m["loss_total"])
            step_ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(json.dumps({
                "section": "train_step", "sampler_kernel": mode,
                "megakernel": args.megakernel,
                "step_ms": round(step_ms, 2),
                "rays_per_sec": round(args.rays / step_ms * 1e3, 1),
                "loss": round(fence(m["loss_total"]), 4),
                "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"section": "train_step",
                              "sampler_kernel": mode,
                              "error": str(e)[:400]}), flush=True)

    fsmp.set_sampler_kernel_mode("auto")


if __name__ == "__main__":
    main()
