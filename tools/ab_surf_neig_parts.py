#!/usr/bin/env python
"""One-process step-rate A/B over the PARTS of the surf_neig loss chain.

The stage-E ablation step A/B (results/r4/r4_ab_ablation_step.log) showed
the surface-neighbour term is the only loss term with real step cost:
compiling it out is 22.29 -> 18.90 ms (1.18x). Its chain has two halves:

  1. the stop-gradient sphere-trace (fused_ray_march Pallas kernel:
     128 SDF evals/ray = 131k evals — as many field points as the whole
     render forward) + secant refinement, and
  2. the DIFFERENTIATED SDF-gradient queries at the 2R surface+neighbour
     points (sdf_grad_observed: jacfwd inside the loss, so the step's
     backward carries second-order structure through it).

This tool pins which half the 3.39 ms lives in, by tracing step variants
with one half disabled (monkeypatch at trace time — each jitted step owns
its traced program; same one-process interleaved-window discipline as
tools/ab_ablation_step.py):

  full      — shipping step (all parts)
  no_bwd2   — march kept; stop_gradient around the queried gradients
              (kills the second-order backward, keeps the grad-query fwd)
  no_march  — march replaced by a constant mid-chord depth (kills the
              Pallas march kernel, keeps grad queries fwd+bwd)
  none      — surf_neig_loss_weight = 0 (the stage-E reference point)

Reference chain: /root/reference/src/renderer/endosurf.py:319-449
(ray_marching + surface_neighbour_error), consumed at
trainer_endosurf.py:147-162.
"""
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

MODES = ("full", "no_bwd2", "no_march", "none")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import endosurf_tpu.models.endosurf as es
    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec,
                                            init_endosurf_params,
                                            set_deform_jac_mode)
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    # Shipping defaults (bench.py).
    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    set_deform_jac_mode("linearize")

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    weights = {
        "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
        "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
        "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
    }
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    orig_pts = es.surface_neighbour_points
    orig_from = es.surface_neighbour_error_from

    def pts_no_march(spec, params, rays, mask, key, neighbour_rad=0.05,
                     samples=None, n_secant_reuse=0):
        """Mid-chord placeholder surface: same shapes/dtypes, no march."""
        rays_o, rays_d, rays_d_z, t = es._split_rays(rays)
        near, far, _ = es.ray_sphere_intersection(rays_o, rays_d)
        d_surf = 0.5 * (near + far)
        valid = mask == 1
        p_surf = rays_o + d_surf * rays_d_z
        offset = (jax.random.uniform(key, p_surf.shape, dtype=p_surf.dtype)
                  - 0.5) * neighbour_rad
        return jnp.concatenate([p_surf, p_surf + offset], axis=0), valid

    def from_no_bwd2(g2, valid):
        return orig_from(jax.lax.stop_gradient(g2), valid)

    def build(mode):
        w = dict(weights)
        if mode == "none":
            w["surf_neig_loss_weight"] = 0.0
        if mode == "no_march":
            es.surface_neighbour_points = pts_no_march
        if mode == "no_bwd2":
            es.surface_neighbour_error_from = from_no_bwd2
        try:
            step = make_train_step(spec, rspec, tx, scene.h, scene.w,
                                   ray_batch, w, surf_neig_rad=0.1,
                                   remat=False)
            # Trace + compile NOW, while the patch is active.
            p = jax.tree_util.tree_map(jnp.array, params0)
            st = tx.init(p)
            p, st, m = step(p, st, scene.device_arrays,
                            jax.random.PRNGKey(2), jnp.asarray(1.0))
            float(np.asarray(m["loss_total"]))  # fence the warm dispatch
        finally:
            es.surface_neighbour_points = orig_pts
            es.surface_neighbour_error_from = orig_from
        return step, (p, st, jax.random.PRNGKey(3))

    steps, state = {}, {}
    for mode in MODES:
        steps[mode], state[mode] = build(mode)

    n_steps, n_windows = 50, 4
    rates = {m: [] for m in MODES}
    for w_i in range(n_windows):
        for mode in MODES:
            params, opt_state, key = state[mode]
            t0 = time.perf_counter()
            for i in range(n_steps):
                key, k = jax.random.split(key)
                params, opt_state, metrics = steps[mode](
                    params, opt_state, scene.device_arrays, k,
                    jnp.asarray(float(w_i * n_steps + i + 2)))
            float(np.asarray(metrics["loss_total"]))  # fence
            dt = time.perf_counter() - t0
            rates[mode].append(n_steps * ray_batch / dt)
            state[mode] = (params, opt_state, key)
    full_med = float(np.median(rates["full"]))
    out = {}
    for mode in MODES:
        med = float(np.median(rates[mode]))
        out[mode] = med
        print(json.dumps({
            "mode": mode,
            "rays_per_sec_median": round(med, 1),
            "ms_per_step": round(ray_batch / med * 1e3, 2),
            "speedup_vs_full": round(med / full_med, 4),
            "windows": [round(r, 1) for r in rates[mode]],
        }), flush=True)
    ms = {m: ray_batch / out[m] * 1e3 for m in MODES}
    print(json.dumps({
        "march_ms_in_step": round(ms["full"] - ms["no_march"], 2),
        "bwd2_ms_in_step": round(ms["full"] - ms["no_bwd2"], 2),
        "whole_term_ms_in_step": round(ms["full"] - ms["none"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
