#!/usr/bin/env python
"""One-process step-level A/B for train.fold_aux_queries (the aux-query
folding of error_on_depth + surface-neighbour gradients into the
render_core megakernel dispatch — trainer_endosurf.py loss_fn).

Round-3 lesson: only same-process step-level A/B decides on the tunneled
TPU; isolated timings can read 3x off. Prints one JSON line per mode plus
a loss-parity record (printed-digit parity over the first 3 steps from
identical init).
"""
import json
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
    for fold in (False, True):
        steps[fold] = make_train_step(
            spec, rspec, tx, scene.h, scene.w, ray_batch, loss_weights,
            surf_neig_rad=0.1, remat=False, fold_aux=fold)

    def fresh(tree):
        """Deep device copy: the step fns donate params/opt_state buffers,
        so every (re)use must start from new arrays."""
        return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

    # Loss parity from identical init (printed-digit, 3 steps each).
    losses = {}
    for fold in (False, True):
        params = fresh(params0)
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(1)
        ls = []
        for i in range(3):
            key, k = jax.random.split(key)
            params, opt_state, metrics = steps[fold](
                params, opt_state, scene.device_arrays, k,
                jnp.asarray(float(i + 1)))
            ls.append(round(float(np.asarray(metrics["loss_total"])), 4))
        losses[fold] = ls
    print(json.dumps({"loss_unfolded": losses[False],
                      "loss_folded": losses[True],
                      "parity": losses[False] == losses[True]}), flush=True)

    # Interleaved timed windows (A B A B ...) so tunnel-contention drift
    # hits both modes equally.
    n_steps, n_windows = 50, 4
    rates = {False: [], True: []}
    state = {}
    for fold in (False, True):
        p = fresh(params0)
        state[fold] = (p, tx.init(p), jax.random.PRNGKey(2))
    for w in range(n_windows):
        for fold in (False, True):
            params, opt_state, key = state[fold]
            t0 = time.perf_counter()
            for i in range(n_steps):
                key, k = jax.random.split(key)
                params, opt_state, metrics = steps[fold](
                    params, opt_state, scene.device_arrays, k,
                    jnp.asarray(float(w * n_steps + i + 4)))
            float(np.asarray(metrics["loss_total"]))  # fence
            dt = time.perf_counter() - t0
            rates[fold].append(n_steps * ray_batch / dt)
            state[fold] = (params, opt_state, key)
    for fold in (False, True):
        med = float(np.median(rates[fold]))
        print(json.dumps({
            "mode": "folded" if fold else "unfolded",
            "rays_per_sec_median": round(med, 1),
            "ms_per_step": round(ray_batch / med * 1e3, 2),
            "windows": [round(r, 1) for r in rates[fold]],
        }), flush=True)
    print(json.dumps({
        "speedup_folded_over_unfolded": round(
            float(np.median(rates[True])) / float(np.median(rates[False])),
            4)}), flush=True)


if __name__ == "__main__":
    main()
