#!/usr/bin/env python
"""One-process step-level A/B for train.presample_batches: hoisting the
K-step scan window's batch gathers into one vmapped pre-sample phase
(identical sampled rays; steps match to last-ulp program noise —
tests/test_train_smoke.py::test_presample_window_parity).
Measured at the long-run dispatch config (steps_per_call=5,
shipping precision modes) for BOTH verticals.
"""
import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def measure(step_fn, params0, opt0, arrays, key0, k_per_call, ray_batch,
            n_windows=4, calls_per_window=10):
    import jax
    import jax.numpy as jnp
    params, opt_state, key = params0, opt0, key0
    # warmup/compile
    for i in range(2):
        key, k = jax.random.split(key)
        params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                       jnp.asarray(float(1 + i * k_per_call)))
    float(np.asarray(m["loss_total"]))
    rates = []
    sf = 1 + 2 * k_per_call
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(calls_per_window):
            key, k = jax.random.split(key)
            params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                           jnp.asarray(float(sf)))
            sf += k_per_call
        float(np.asarray(m["loss_total"]))  # fence
        dt = time.perf_counter() - t0
        rates.append(calls_per_window * k_per_call * ray_batch / dt)
    return rates, float(np.asarray(m["loss_total"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-per-call", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              init_dnerf_params)
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec,
                                            init_endosurf_params,
                                            set_deform_jac_mode)
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train import trainer_endonerf, trainer_endosurf
    from endosurf_tpu.train.schedules import exponential, warmup_cosine

    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    set_deform_jac_mode("linearize")

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    arrays = scene.device_arrays
    K = args.steps_per_call

    spec, rspec = EndoSurfSpec(), RenderSpec()
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    es_params = init_endosurf_params(jax.random.PRNGKey(0), spec)

    en_spec, en_rspec = DNeRFSpec(), DNeRFRenderSpec()
    en_tx = optax.adam(exponential(5e-4, 250))
    en_params = init_dnerf_params(jax.random.PRNGKey(0), en_spec)

    for model, build, p0, txx, rb in (
            ("endosurf",
             lambda pre: trainer_endosurf.make_train_step(
                 spec, rspec, tx, scene.h, scene.w, 1024, lw,
                 surf_neig_rad=0.1, remat=False, steps_per_call=K,
                 presample=pre),
             es_params, tx, 1024),
            ("endonerf",
             lambda pre: trainer_endonerf.make_train_step(
                 en_spec, en_rspec, en_tx, scene.h, scene.w, 2048,
                 {"color_loss_weight": 1.0, "depth_loss_weight": 1.0},
                 steps_per_call=K, presample=pre),
             en_params, en_tx, 2048)):
        res = {}
        for pre in (False, True):
            # Deep device copy per run: the step fns donate params/opt_state.
            p = jax.tree_util.tree_map(lambda x: jnp.array(x), p0)
            rates, loss = measure(build(pre), p, txx.init(p), arrays,
                                  jax.random.PRNGKey(1), K, rb)
            res[pre] = (float(np.median(rates)), rates, loss)
            print(json.dumps({
                "model": model, "presample": pre, "steps_per_call": K,
                "rays_per_sec_median": round(res[pre][0], 1),
                "windows": [round(r, 1) for r in rates],
                "final_loss": round(loss, 6)}), flush=True)
        print(json.dumps({
            "model": model,
            "loss_parity": res[False][2] == res[True][2],
            "speedup_presample": round(res[True][0] / res[False][0], 4)}),
            flush=True)


if __name__ == "__main__":
    main()
