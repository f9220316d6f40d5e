#!/usr/bin/env python
"""One-process megakernel A/B: dispatch floor, per-kernel bursts, and the
full flagship train step with the Pallas fwd+bwd megakernel on vs off.

Everything runs in a single process because the tunneled TPU wedges after
process exits and its dispatch latency drifts between processes (CLAUDE.md)
— cross-process comparisons are not trustworthy.

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
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--skip-kernels", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.kernels import fused_train as ft
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec, fused_point_eval,
                                            init_endosurf_params,
                                            set_deform_jac_mode,
                                            set_megakernel_mode)
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    # shipping precision everywhere
    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    set_deform_jac_mode("linearize")

    # ---- dispatch floor ---------------------------------------------------
    f_triv = jax.jit(lambda x: x @ x)
    x8 = jnp.ones((8, 8))
    floor_ms = burst(f_triv, (x8,), args.iters) * 1e3
    print(json.dumps({"section": "dispatch_floor", "ms": round(floor_ms, 3),
                      "iters": args.iters}), flush=True)

    # ---- per-kernel bursts ------------------------------------------------
    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    if not args.skip_kernels:
        from endosurf_tpu.kernels import fused_train_pallas as ftp
        ft.set_compute_mode(jnp.bfloat16, None)
        eff = jax.jit(lambda p: ft.prepare_effective(spec, p))(params)
        consts = ft.selectors(spec)
        n = args.n
        key = jax.random.PRNGKey(1)
        kx, kd, kt = jax.random.split(key, 3)
        x = jax.random.uniform(kx, (n, 3), minval=-0.8, maxval=0.8)
        d = jax.random.normal(kd, (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        t = jax.random.uniform(kt, (n, 1))
        xt = ft.pad_lanes(x, t)
        d_pad = ft.pad_lanes(d)
        x_c, jrows = jax.jit(
            lambda e, a: ft.seg_deform_math(e, consts, a))(eff["deform"], xt)
        sdf, feat, grad_c = jax.jit(
            lambda e, h, fw, a: ft.seg_sdf_math(e, h, fw, consts, a))(
            eff["sdf"], eff["sdf_head"], eff["sdf_feat"], x_c)
        _, d_c = jax.jit(
            lambda j, g, dd: ft.coupling_math(j, g, dd))(jrows, grad_c, d_pad)
        fence((x_c, sdf, d_c))
        ct_xc = jnp.ones_like(x_c) * 1e-3
        ct_j = [jnp.ones_like(j) * 1e-3 for j in jrows]
        runs = {
            "deform_fwd": jax.jit(lambda: ftp.deform_fwd(
                spec, consts, eff["deform"], xt)),
            "sdf_fwd": jax.jit(lambda: ftp.sdf_fwd(
                spec, consts, eff["sdf"], eff["sdf_head"], eff["sdf_feat"],
                x_c)),
            "color_fwd": jax.jit(lambda: ftp.color_fwd(
                spec, consts, eff["color"], x_c, grad_c, d_c, feat)),
            "deform_bwd": jax.jit(lambda: ftp.deform_bwd(
                spec, consts, eff["deform"], xt, (ct_xc, ct_j))),
            "sdf_bwd": jax.jit(lambda: ftp.sdf_bwd(
                spec, consts, eff["sdf"], eff["sdf_head"], eff["sdf_feat"],
                x_c, (jnp.ones_like(sdf), jnp.ones_like(feat) * 1e-3,
                      jnp.ones_like(grad_c) * 1e-3))),
            "color_bwd": jax.jit(lambda: ftp.color_bwd(
                spec, consts, eff["color"], x_c, grad_c, d_c, feat,
                jnp.ones_like(x_c) * 1e-3)),
        }
        total = 0.0
        for name, fn in runs.items():
            t0 = time.perf_counter()
            fence(fn())
            compile_s = time.perf_counter() - t0
            ms = burst(fn, (), args.iters) * 1e3
            total += ms
            print(json.dumps({
                "section": "kernel", "name": name, "ms": round(ms, 2),
                "mpts_per_s": round(args.n / ms / 1e3, 1),
                "compile_s": round(compile_s, 1)}), flush=True)
        print(json.dumps({"section": "kernel_total",
                          "ms": round(total, 2)}), flush=True)

    # ---- fused eval fwd+bwd, megakernel on vs off -------------------------
    npts = args.n
    key = jax.random.PRNGKey(2)
    kx, kd, kt = jax.random.split(key, 3)
    px = jax.random.uniform(kx, (npts, 3), minval=-0.8, maxval=0.8)
    pd = jax.random.normal(kd, (npts, 3))
    pd = pd / jnp.linalg.norm(pd, axis=-1, keepdims=True)
    pt = jax.random.uniform(kt, (npts, 1))

    def eval_loss(p):
        out = fused_point_eval(spec, p, px, pd, pt)
        return (jnp.mean(out["sdf"]) + jnp.mean(out["color"])
                + jnp.mean(out["grad_o"]))

    for mode in ("off", "on"):
        set_megakernel_mode(mode)
        g = jax.jit(lambda p, _m=mode: jax.grad(eval_loss)(
            p)["sdf_network"]["layers"][0]["v"])
        ms = burst(g, (params,), args.iters) * 1e3
        print(json.dumps({"section": "fused_eval_fwd_bwd",
                          "megakernel": mode, "ms": round(ms, 2)}),
              flush=True)

    # ---- full train step, on vs off ---------------------------------------
    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    rspec = RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    loss_weights = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                    "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
                    "eikonal_loss_weight": 0.1,
                    "surf_neig_loss_weight": 0.1}
    arrays = scene.device_arrays
    for mode in ("off", "on"):
        set_megakernel_mode(mode)
        step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w,
                                  ray_batch, loss_weights,
                                  surf_neig_rad=0.1, remat=False)
        p = init_endosurf_params(jax.random.PRNGKey(0), spec)
        o = tx.init(p)
        k = jax.random.PRNGKey(3)
        t0 = time.perf_counter()
        for i in range(3):
            k, kk = jax.random.split(k)
            p, o, m = step_fn(p, o, arrays, kk, jnp.asarray(float(i + 1)))
        fence(m["loss_total"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.iters):
            k, kk = jax.random.split(k)
            p, o, m = step_fn(p, o, arrays, kk, jnp.asarray(float(i + 4)))
        fence(m["loss_total"])
        step_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({
            "section": "train_step", "megakernel": mode,
            "step_ms": round(step_ms, 2),
            "rays_per_sec": round(ray_batch / step_ms * 1e3, 1),
            "loss": round(fence(m["loss_total"]), 4),
            "compile_s": round(compile_s, 1)}), flush=True)

    set_megakernel_mode("auto")


if __name__ == "__main__":
    main()
