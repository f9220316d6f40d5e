#!/usr/bin/env python
"""One-process per-step-rate A/B of steps_per_call (K=1 vs K=5) on the
EndoSurf flagship train step.

bench.py dispatches K=1 steps asynchronously (one host fence per 50-step
window), so device dispatch RTT is already pipelined — but on this 1-core
host the per-step Python work (PRNG split + jit call dispatch) may still
gate the device. K=5 scans 5 optimizer steps inside one dispatch
(bit-equal to K=1, tests/test_train_smoke.py), shrinking host work 5x.
This A/B decides whether the bench/shipping default should carry K>1.

Prints one JSON line per mode plus a loss-parity record (K=5 is designed
bit-identical to K=1; printed-digit check over the first 5 steps).
"""
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

KS = (1, 5)


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

    steps = {k: make_train_step(
        spec, rspec, tx, scene.h, scene.w, ray_batch, loss_weights,
        surf_neig_rad=0.1, remat=False, steps_per_call=k) for k in KS}

    def fresh(tree):
        """Deep device copy: the step fns donate params/opt_state buffers."""
        return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

    # Parity: 5 K=1 steps from one key chain vs 1 K=5 window from the same
    # key (the window splits identically inside the scan).
    losses = {}
    for k in KS:
        params = fresh(params0)
        opt_state = tx.init(params)
        if k == 1:
            key = jax.random.PRNGKey(1)
            for i in range(5):
                key, kk = jax.random.split(key)
                params, opt_state, metrics = steps[1](
                    params, opt_state, scene.device_arrays, kk,
                    jnp.asarray(float(i + 1)))
        else:
            params, opt_state, metrics = steps[k](
                params, opt_state, scene.device_arrays,
                jax.random.PRNGKey(1), jnp.asarray(1.0))
        losses[k] = round(float(np.asarray(metrics["loss_total"])), 4)
    print(json.dumps({"loss_k1_step5": losses[1], "loss_k5_window1":
                      losses[5], "parity": losses[1] == losses[5]}),
          flush=True)

    # Interleaved timed windows of 50 optimizer steps each.
    n_steps, n_windows = 50, 4
    rates = {k: [] for k in KS}
    state = {}
    for k in KS:
        p = fresh(params0)
        state[k] = (p, tx.init(p), jax.random.PRNGKey(2))
    for w in range(n_windows):
        for k in KS:
            params, opt_state, key = state[k]
            t0 = time.perf_counter()
            for i in range(n_steps // k):
                key, kk = jax.random.split(key)
                params, opt_state, metrics = steps[k](
                    params, opt_state, scene.device_arrays, kk,
                    jnp.asarray(float((w * n_steps) // k + i + 4)))
            float(np.asarray(metrics["loss_total"]))  # fence
            dt = time.perf_counter() - t0
            rates[k].append(n_steps * ray_batch / dt)
            state[k] = (params, opt_state, key)
    for k in KS:
        med = float(np.median(rates[k]))
        print(json.dumps({
            "steps_per_call": k,
            "rays_per_sec_median": round(med, 1),
            "ms_per_step": round(ray_batch / med * 1e3, 2),
            "windows": [round(r, 1) for r in rates[k]],
        }), flush=True)
    print(json.dumps({
        "speedup_k5_over_k1": round(
            float(np.median(rates[5])) / float(np.median(rates[1])), 4)}),
        flush=True)


if __name__ == "__main__":
    main()
