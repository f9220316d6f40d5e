#!/usr/bin/env python
"""One-process step-level A/B for train.surf_march_reuse (march-reuse:
surface localization on the render's own importance samples via
surface_from_samples instead of the fresh 128-eval fused_ray_march —
trainer_endosurf.py loss_fn, round-5 lever from the stage-E attribution:
the surf_neig term is 3.39 ms of the 22.3 ms step).

Round-3 lesson: only same-process interleaved step-level A/B decides on
the tunneled TPU. Prints one JSON line per mode plus a loss-track record
(the losses are NOT expected bit-identical — localization differs by the
crossing-interpolation delta — so this reports both tracks for eyeball
closeness rather than asserting digit parity).
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

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

    n_secant = int(os.environ.get("ESN_REUSE_SECANT", "0"))

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    loss_weights = {
        "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
        "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
        "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
    }
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    steps = {}
    for reuse in (False, True):
        steps[reuse] = make_train_step(
            spec, rspec, tx, scene.h, scene.w, ray_batch, loss_weights,
            surf_neig_rad=0.1, remat=False, march_reuse=reuse,
            march_reuse_secant=n_secant)

    def fresh(tree):
        return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

    # Loss track from identical init (both modes see identical batches).
    losses = {}
    for reuse in (False, True):
        params = fresh(params0)
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(1)
        ls = []
        for i in range(3):
            key, k = jax.random.split(key)
            params, opt_state, metrics = steps[reuse](
                params, opt_state, scene.device_arrays, k,
                jnp.asarray(float(i + 1)))
            ls.append(round(float(np.asarray(metrics["loss_total"])), 4))
        losses[reuse] = ls
    print(json.dumps({"loss_march": losses[False],
                      "loss_reuse": losses[True],
                      "n_secant_reuse": n_secant}), flush=True)

    # Interleaved timed windows (A B A B ...) so tunnel-contention drift
    # hits both modes equally.
    n_steps, n_windows = 50, 4
    rates = {False: [], True: []}
    state = {}
    for reuse in (False, True):
        p = fresh(params0)
        state[reuse] = (p, tx.init(p), jax.random.PRNGKey(2))
    for w in range(n_windows):
        for reuse in (False, True):
            params, opt_state, key = state[reuse]
            t0 = time.perf_counter()
            for i in range(n_steps):
                key, k = jax.random.split(key)
                params, opt_state, metrics = steps[reuse](
                    params, opt_state, scene.device_arrays, k,
                    jnp.asarray(float(w * n_steps + i + 4)))
            float(np.asarray(metrics["loss_total"]))  # fence
            dt = time.perf_counter() - t0
            rates[reuse].append(n_steps * ray_batch / dt)
            state[reuse] = (params, opt_state, key)
    for reuse in (False, True):
        med = float(np.median(rates[reuse]))
        print(json.dumps({
            "mode": "reuse" if reuse else "march",
            "rays_per_sec_median": round(med, 1),
            "ms_per_step": round(ray_batch / med * 1e3, 2),
            "windows": [round(r, 1) for r in rates[reuse]],
        }), flush=True)
    print(json.dumps({
        "speedup_reuse_over_march": round(
            float(np.median(rates[True])) / float(np.median(rates[False])),
            4)}), flush=True)


if __name__ == "__main__":
    main()
