#!/usr/bin/env python
"""Where does the flagship train step's time go? (VERDICT round-1 item 2)

Produces, on the default device:
  1. XLA cost analysis of the compiled flagship step (logical FLOPs,
     transcendentals, bytes) and an MFU estimate vs the chip's bf16 peak;
  2. a per-piece timing table from separately-jitted pipeline stages
     (batch sampling, upsampling, ray march, fused render fwd, loss fwd+bwd,
     Adam) — each piece is timed standalone, so the numbers slightly
     over-count shared work but bound each stage's cost;
  3. optionally (--trace) a jax.profiler trace of a few steps.

Usage: python tools/profile_step.py [--steps 30] [--trace]
Writes a JSON lines report to stdout; keep for VALIDATION.md.
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

# TPU v5e (lite) peak: 197 TFLOP/s bf16, ~same matmul units at bf16x3 = /3.
PEAK_BF16_FLOPS = 197e12


def fence(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, args, n, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    fence(jax_leaves(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(jax_leaves(out))
    return (time.perf_counter() - t0) / n


def jax_leaves(out):
    import jax
    return jax.tree_util.tree_leaves(out)[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--precision", default="high")
    ap.add_argument("--sampling-precision", default="default")
    ap.add_argument("--activation-dtype", default=None,
                    choices=[None, "bfloat16", "float32"],
                    help="narrow the field-MLP interior (ops/mlp.py)")
    ap.add_argument("--jac-mode", default="jacfwd",
                    choices=["jacfwd", "linearize"],
                    help="deform-Jacobian formulation (models/fields.py)")
    ap.add_argument("--megakernel", default="auto",
                    choices=["auto", "on", "off"],
                    help="Pallas fwd+bwd megakernel dispatch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import (make_synthetic_arrays,
                                              sample_train_batch)
    from endosurf_tpu.models.endosurf import (RenderSpec, ray_march,
                                              render_rays, upsample_z,
                                              _split_rays, error_on_depth,
                                              surface_neighbour_error)
    from endosurf_tpu.models.fields import (EndoSurfSpec, fused_point_eval,
                                            init_endosurf_params,
                                            set_deform_jac_mode)
    from endosurf_tpu.ops.geometry import ray_sphere_intersection
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    set_matmul_precision(args.precision)
    set_sampling_precision(None if args.sampling_precision == "none"
                           else args.sampling_precision)
    set_activation_dtype(args.activation_dtype)
    set_deform_jac_mode(args.jac_mode)
    from endosurf_tpu.models.fields import set_megakernel_mode
    set_megakernel_mode(args.megakernel)

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    loss_weights = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                    "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
                    "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, ray_batch,
                              loss_weights, surf_neig_rad=0.1, remat=False)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    opt_state = tx.init(params)
    arrays = scene.device_arrays
    key = jax.random.PRNGKey(1)

    # ---- full step timing + XLA cost analysis -----------------------------
    # (separate non-donating jit for cost analysis; donation complicates reuse)
    for i in range(3):
        key, k = jax.random.split(key)
        params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                       jnp.asarray(float(i + 1)))
    fence(m["loss_total"])
    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                       jnp.asarray(float(i + 4)))
    fence(m["loss_total"])
    step_s = (time.perf_counter() - t0) / args.steps

    lowered = step_fn.lower(params, opt_state, arrays, key, jnp.asarray(5.0))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    # At "high" (bf16x3) each logical f32 matmul runs ~3 bf16 MXU passes; at
    # "default" 1. MFU here = logical flops / (time * bf16 peak).
    mfu = flops / (step_s * PEAK_BF16_FLOPS)
    print(json.dumps({
        "section": "full_step", "precision": args.precision,
        "sampling_precision": args.sampling_precision,
        "activation_dtype": args.activation_dtype,
        "jac_mode": args.jac_mode,
        "step_ms": round(step_s * 1e3, 2),
        "rays_per_sec": round(ray_batch / step_s, 1),
        "xla_logical_gflops_per_step": round(flops / 1e9, 2),
        "transcendentals_g": round(
            float(cost.get("transcendentals", 0)) / 1e9, 3),
        "bytes_accessed_gb": round(
            float(cost.get("bytes accessed", 0)) / 1e9, 3),
        "mfu_logical_vs_bf16_peak": round(mfu, 4),
    }), flush=True)

    # ---- per-piece standalone timings --------------------------------------
    key, k_batch = jax.random.split(key)
    batch = jax.jit(lambda a, k: sample_train_batch(a, scene.h, scene.w, k,
                                                    ray_batch))(arrays, k_batch)
    rays = batch["rays"]
    rays_o, rays_d, rays_d_z, t = _split_rays(rays)
    near, far, _ = ray_sphere_intersection(rays_o, rays_d)
    t_vals = jnp.linspace(0.0, 1.0, rspec.n_samples)
    z0 = near + (far - near) * t_vals[None, :]

    pieces = {}

    pieces["batch_sampling"] = timeit(
        jax.jit(lambda a, k: sample_train_batch(
            a, scene.h, scene.w, k, ray_batch)["rays"]),
        (arrays, k_batch), args.steps)

    pieces["upsample_64"] = timeit(
        jax.jit(lambda p, z: upsample_z(spec, rspec, p, rays_o, rays_d_z,
                                        t, z)),
        (params, z0), args.steps)

    pieces["ray_march_128"] = timeit(
        jax.jit(lambda p, r: ray_march(spec, p, r)[0]), (params, rays),
        args.steps)

    n_total = rspec.n_samples + rspec.n_importance
    pts = (rays_o[:, None, :] + rays_d_z[:, None, :]
           * jnp.linspace(1.0, 3.0, n_total)[None, :, None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :],
                            (ray_batch, n_total, 3)).reshape(-1, 3)
    tts = jnp.broadcast_to(t[:, None, :],
                           (ray_batch, n_total, 1)).reshape(-1, 1)
    pieces["fused_eval_fwd_64"] = timeit(
        jax.jit(lambda p: fused_point_eval(spec, p, pts, dirs, tts)["sdf"]),
        (params,), args.steps)

    pieces["render_rays_fwd"] = timeit(
        jax.jit(lambda p, r: render_rays(spec, rspec, p, r,
                                         jnp.asarray(5.0))["color_map"]),
        (params, rays), args.steps)

    def color_loss(p, r):
        out = render_rays(spec, rspec, p, r, jnp.asarray(5.0))
        return (jnp.mean(jnp.abs(out["color_map"] - batch["color"]))
                + 0.1 * out["gradient_o_error"])

    pieces["render_fwd_bwd"] = timeit(
        jax.jit(lambda p, r: jax.grad(color_loss)(
            p, r)["sdf_network"]["layers"][0]["v"]),
        (params, rays), args.steps)

    pieces["error_on_depth"] = timeit(
        jax.jit(lambda p, r: error_on_depth(spec, p, r, batch["depth"],
                                            batch["mask"])[0]),
        (params, rays), args.steps)

    pieces["surf_neig_full"] = timeit(
        jax.jit(lambda p, r: surface_neighbour_error(
            spec, p, r, batch["mask"], jax.random.PRNGKey(0), 0.1)),
        (params, rays), args.steps)

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    pieces["adam_update"] = timeit(
        jax.jit(lambda g, s, p: tx.update(g, s, p)[0]
                ["deviation_network"]["variance"]),
        (grads, opt_state, params), args.steps)

    for name, s in pieces.items():
        print(json.dumps({"section": name, "ms": round(s * 1e3, 2)}),
              flush=True)

    if args.trace:
        trace_dir = osp.join(osp.dirname(osp.abspath(__file__)), "..",
                             "logs", "profile_step")
        jax.profiler.start_trace(trace_dir)
        for i in range(5):
            key, k = jax.random.split(key)
            params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                           jnp.asarray(float(100 + i)))
        fence(m["loss_total"])
        jax.profiler.stop_trace()
        print(json.dumps({"section": "trace", "dir": trace_dir}), flush=True)


if __name__ == "__main__":
    main()
