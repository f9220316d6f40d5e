#!/usr/bin/env python
"""One-process step-rate A/B across the ablation configurations.

The ablation quality runs (tools/validate_synthetic.py --ablation ...) each
live in their own process, so their wall-clock rays/s mixes compile time and
tunnel-latency weather — useless for the "measured step-rate gain from
compiling the term out" claim (VERDICT r3 item 1). This tool builds the
baseline step plus all four single-term-zeroed steps in ONE process and
times them in interleaved windows (round-robin, so tunnel drift hits every
mode equally), at shipping defaults (bf16 matmuls/interior, linearize
Jacobian, make_train_step's shipping fold_aux/presample defaults, remat
off).

Reference loss wiring: /root/reference/src/trainer/trainer_endosurf.py
(loss assembly; the reference keeps computing zero-weighted terms — ours
compiles them out, which is where the measured gain comes from).

Prints one JSON line per mode plus a summary with speedups vs baseline.
"""
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

ABLATIONS = {
    "baseline": None,
    "no_sdf": "sdf_loss_weight",
    "no_angle": "angle_loss_weight",
    "no_eikonal": "eikonal_loss_weight",
    "no_surf_neig": "surf_neig_loss_weight",
}


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
    base_weights = {
        "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
        "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
        "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
    }
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    steps = {}
    for name, zero_key in ABLATIONS.items():
        w = dict(base_weights)
        if zero_key is not None:
            w[zero_key] = 0.0
        steps[name] = make_train_step(
            spec, rspec, tx, scene.h, scene.w, ray_batch, w,
            surf_neig_rad=0.1, remat=False)

    def fresh(tree):
        """Deep device copy: the step fns donate params/opt_state buffers,
        so every (re)use must start from new arrays."""
        return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

    # Interleaved timed windows (round-robin over all modes per window)
    # so tunnel-contention drift hits every mode equally.
    n_steps, n_windows = 50, 4
    rates = {name: [] for name in ABLATIONS}
    state = {}
    for name in ABLATIONS:
        p = fresh(params0)
        state[name] = (p, tx.init(p), jax.random.PRNGKey(2))
    # Warm pass (compile + first dispatch) outside the timed windows.
    for name in ABLATIONS:
        params, opt_state, key = state[name]
        key, k = jax.random.split(key)
        params, opt_state, metrics = steps[name](
            params, opt_state, scene.device_arrays, k, jnp.asarray(1.0))
        float(np.asarray(metrics["loss_total"]))  # fence
        state[name] = (params, opt_state, key)
    for w_i in range(n_windows):
        for name in ABLATIONS:
            params, opt_state, key = state[name]
            t0 = time.perf_counter()
            for i in range(n_steps):
                key, k = jax.random.split(key)
                params, opt_state, metrics = steps[name](
                    params, opt_state, scene.device_arrays, k,
                    jnp.asarray(float(w_i * n_steps + i + 2)))
            float(np.asarray(metrics["loss_total"]))  # fence
            dt = time.perf_counter() - t0
            rates[name].append(n_steps * ray_batch / dt)
            state[name] = (params, opt_state, key)
    base_med = float(np.median(rates["baseline"]))
    for name in ABLATIONS:
        med = float(np.median(rates[name]))
        print(json.dumps({
            "mode": name,
            "rays_per_sec_median": round(med, 1),
            "ms_per_step": round(ray_batch / med * 1e3, 2),
            "speedup_vs_baseline": round(med / base_med, 4),
            "windows": [round(r, 1) for r in rates[name]],
        }), flush=True)


if __name__ == "__main__":
    main()
