#!/usr/bin/env python
"""Data-parallel scaling check on a virtual CPU mesh.

Fixed GLOBAL ray batch, 1 -> N virtual devices (VERDICT round-1 item 9): the
point is not absolute throughput (virtual CPU devices share physical cores)
but that the sharded train step actually distributes — per-device work and
step time must FALL as devices are added; a serialized pipeline would stay
flat or grow. Run from any shell (self-provisions the CPU mesh):

    python tools/bench_scaling.py [--devices 8] [--global-batch 1024]
"""

import argparse
import json
import os
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--global-batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec, MLPSpec,
                                            init_endosurf_params)
    from endosurf_tpu.parallel.mesh import make_mesh, replicated_sharding
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    assert len(jax.devices()) >= args.devices, jax.devices()
    scene = make_synthetic_arrays(n_frames=4, h=64, w=64)

    # Mid-size fields (CPU-tractable) but the REAL step: all six losses,
    # importance upsampling, the sphere-traced regularizer, Adam.
    spec = EndoSurfSpec(
        deform_pos_freqs=4, deform_time_freqs=4, sdf_pos_freqs=4,
        color_pos_freqs=4, color_dir_freqs=4,
        deform=MLPSpec(4, 128, (), 3), sdf=MLPSpec(4, 128, (), 65),
        color=MLPSpec(4, 128, (), 3), color_feat_dim=64)
    rspec = RenderSpec(n_samples=16, n_importance=16, up_sample_steps=4,
                       anneal_end=100.0)
    tx = optax.adam(warmup_cosine(5e-4, 50, 1000, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}

    results = []
    n = 1
    while n <= args.devices:
        mesh = make_mesh(n)
        step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w,
                                  args.global_batch, lw, surf_neig_rad=0.1,
                                  remat=False, mesh=mesh)
        rep = replicated_sharding(mesh)
        params = jax.device_put(
            init_endosurf_params(jax.random.PRNGKey(0), spec), rep)
        opt_state = jax.device_put(tx.init(params), rep)
        arrays = jax.device_put(scene.device_arrays, rep)
        key = jax.random.PRNGKey(1)
        # Per-device program cost: under SPMD, XLA reports the LOCAL
        # partition's flops — the ground-truth check that the ray axis is
        # physically partitioned (independent of host-core contention).
        cost = step_fn.lower(params, opt_state, arrays, key,
                             jnp.asarray(1.0)).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops_dev = float(cost.get("flops", float("nan"))) / 1e9
        for i in range(2):
            key, k = jax.random.split(key)
            params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                           jnp.asarray(float(i + 1)))
        float(np.asarray(m["loss_total"]))
        t0 = time.perf_counter()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                           jnp.asarray(float(i + 3)))
        loss = float(np.asarray(m["loss_total"]))
        dt = (time.perf_counter() - t0) / args.steps
        row = {"devices": n, "global_batch": args.global_batch,
               "step_ms": round(dt * 1e3, 1),
               "rays_per_sec": round(args.global_batch / dt, 1),
               "speedup_vs_1": (round(results[0]["step_ms"] / (dt * 1e3), 2)
                                if results else 1.0),
               "gflops_per_device": round(gflops_dev, 2),
               "flops_fraction_vs_1": (round(
                   gflops_dev / results[0]["gflops_per_device"], 3)
                   if results else 1.0),
               "loss_finite": bool(np.isfinite(loss))}
        results.append(row)
        print(json.dumps(row), flush=True)
        n *= 2


if __name__ == "__main__":
    main()
