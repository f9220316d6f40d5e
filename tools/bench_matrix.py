#!/usr/bin/env python
"""Throughput matrix: matmul precision x remat, on the default device.

Measures the full EndoSurf training step (flagship config) like bench.py,
sweeping the TPU execution knobs. Run on real TPU hardware:

    python tools/bench_matrix.py
"""

import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import sys
import time

import numpy as np


def bench_variant(precision: str, remat: bool, n_steps: int = 30,
                  sampling: str = "default", act_dtype=None,
                  jac_mode: str = "jacfwd", steps_per_call: int = 1):
    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays as _synthetic_arrays
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import (EndoSurfSpec,
                                            init_endosurf_params,
                                            set_deform_jac_mode)
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    set_matmul_precision(precision)
    set_sampling_precision(sampling)
    set_activation_dtype(act_dtype)
    set_deform_jac_mode(jac_mode)
    scene = _synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, ray_batch,
                              lw, surf_neig_rad=0.1, remat=remat,
                              steps_per_call=steps_per_call)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    opt_state = tx.init(params)
    arrays = scene.device_arrays
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    for i in range(3):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, arrays, k,
                                             jnp.asarray(float(i + 1)))
    loss0 = float(np.asarray(metrics["loss_total"]))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, arrays, k,
                                             jnp.asarray(float(i + 4)))
    loss = float(np.asarray(metrics["loss_total"]))  # fence
    dt = time.perf_counter() - t0
    total_steps = n_steps * steps_per_call
    return {
        "precision": precision, "remat": remat,
        "sampling": sampling, "act_dtype": act_dtype, "jac_mode": jac_mode,
        "steps_per_call": steps_per_call,
        "rays_per_sec": round(total_steps * ray_batch / dt, 1),
        "step_ms": round(dt / total_steps * 1000, 2),
        "compile_s": round(compile_s, 1),
        "loss_finite": bool(np.isfinite(loss)),
        "loss": round(loss, 4),
    }


VARIANTS = [
    # (precision, remat, sampling, act_dtype, jac_mode, steps_per_call)
    ("highest", True, "default", None, "jacfwd", 1),
    ("highest", False, "default", None, "jacfwd", 1),
    ("default", True, "default", None, "jacfwd", 1),
    ("default", False, "default", None, "jacfwd", 1),
    ("default", False, "default", None, "linearize", 1),
    ("default", False, "default", "bfloat16", "jacfwd", 1),
    ("default", False, "default", "bfloat16", "linearize", 1),
    ("default", False, "default", None, "jacfwd", 5),
]


def main():
    results = []
    for precision, remat, sampling, act, jac, spc in VARIANTS:
        try:
            r = bench_variant(precision, remat, sampling=sampling,
                              act_dtype=act, jac_mode=jac,
                              steps_per_call=spc)
        except Exception as e:  # e.g. OOM without remat
            r = {"precision": precision, "remat": remat,
                 "act_dtype": act, "jac_mode": jac, "steps_per_call": spc,
                 "error": repr(e)[:200]}
        results.append(r)
        print(json.dumps(r), flush=True)
    best = max((r for r in results if "rays_per_sec" in r),
               key=lambda r: r["rays_per_sec"])
    print("# best:", json.dumps(best), file=sys.stderr)


if __name__ == "__main__":
    main()
