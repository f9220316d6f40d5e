#!/usr/bin/env python
"""Per-component step-time breakdown: which loss terms cost what.

Benches the train step with terms toggled off to attribute time:
  full            — all six losses
  no_surf_neig    — drop the 128-step sphere-traced regularizer
  no_depth_terms  — additionally drop sdf/angle-at-depth queries
  render_only     — color+eikonal only
Also sweeps matmul precision "high" (bf16x3) for the full step.
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def bench(loss_weights, precision="default", remat=False, n_steps=30,
          label=""):
    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
    from endosurf_tpu.ops.mlp import set_matmul_precision
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    set_matmul_precision(precision)
    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = EndoSurfSpec(), RenderSpec()
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, 1024,
                              loss_weights, surf_neig_rad=0.1, remat=remat)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    opt_state = tx.init(params)
    arrays = scene.device_arrays
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                       jnp.asarray(float(i + 1)))
    float(np.asarray(m["loss_total"]))
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                       jnp.asarray(float(i + 4)))
    float(np.asarray(m["loss_total"]))
    dt = time.perf_counter() - t0
    out = {"label": label, "precision": precision, "remat": remat,
           "step_ms": round(dt / n_steps * 1000, 2),
           "rays_per_sec": round(n_steps * 1024 / dt, 1)}
    print(json.dumps(out), flush=True)
    return out


def main():
    full = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
            "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
            "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    no_sn = dict(full, surf_neig_loss_weight=0.0)
    render_only = dict(no_sn, sdf_loss_weight=0.0, angle_loss_weight=0.0,
                       depth_loss_weight=0.0)
    bench(full, "default", False, label="full")
    bench(no_sn, "default", False, label="no_surf_neig")
    bench(render_only, "default", False, label="render_only")
    bench(full, "high", False, label="full_high")


if __name__ == "__main__":
    main()
