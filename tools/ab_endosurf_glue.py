#!/usr/bin/env python
"""One-process step-rate A/B over the EndoSurf train step's NON-DOT glue.

Companion to tools/ab_endonerf_parts.py for the flagship vertical: the
round-5 ceiling decomposition (results/r5/train_ceiling.json) prices the
EndoSurf step's MXU dots at 12.2 ms of the measured 20.0 ms and leaves a
6.6 ms non-dot residual attributed generically to "sampler merges,
compositing, batch sampling, Adam". This pins it, with trace-time
monkeypatch variants (one-process interleaved windows, the
tools/ab_surf_neig_parts.py discipline):

  full            — shipping step (bench.py's exact config)
  mean_composite  — the NeuS alpha chain (sigmoid CDF ratios + exclusive
                    cumprod) replaced by a plain normalized weighting with
                    the same shapes — prices compositing fwd+bwd.
  cheap_pixels    — mask-guided pixel CDF binary search replaced by uniform
                    pixel indices (gathers kept) — prices the batch sampler.
  sgd             — optax.sgd instead of adam — prices the optimizer.

The upsample/march sampler kernels and the loss terms are NOT re-priced
here: the sampler kernels carry real dots (priced by the ceiling tool) and
the loss terms have their own A/B (results/r4/r4_ab_ablation_step.log,
logs/r5_ab_surf_neig_parts2.log).

Reference chain being priced: /root/reference/src/renderer/endosurf.py:
134-213 (render_core compositing) + src/dataset/dataset.py:117-161 (pixel
sampler) + the torch Adam step at trainer_endosurf.py:165-181.
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

MODES = ("full", "mean_composite", "cheap_pixels", "alias_pixels", "sgd")
if os.environ.get("ESN_AB_MODES"):
    MODES = tuple(m for m in os.environ["ESN_AB_MODES"].split(",")
                  if m in MODES)


def main():
    import jax

    if int(os.environ.get("ESN_AB_CPU", "0")):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    import endosurf_tpu.models.endosurf as es
    import endosurf_tpu.train.trainer_endosurf as tes
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

    tiny = bool(int(os.environ.get("ESN_AB_TINY", "0")))
    if tiny:  # CPU smoke test of the trace seams only
        scene = make_synthetic_arrays(n_frames=2, h=32, w=40)
        ray_batch = 64
    else:
        scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
        ray_batch = 1024
    spec, rspec = EndoSurfSpec(), RenderSpec()
    schedule = warmup_cosine(5e-4, 5000, 100000, 0.05)
    weights = {
        "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
        "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
        "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
    }
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    orig_alpha = es.neus_alpha
    orig_cumprod = es.exclusive_cumprod_weights
    orig_sample_batch = tes.sample_train_batch

    def cheap_alpha(sdf, iter_cos, dists, inv_s):
        """Same shapes + gradient paths into sdf/iter_cos/inv_s, no CDF
        ratio chain."""
        a = jax.nn.sigmoid(-(sdf + iter_cos * dists) * inv_s)
        return a, a

    def cheap_weights(alpha, eps=1e-7):
        del eps
        return alpha / (jnp.sum(alpha, axis=-1, keepdims=True) + 1e-6)

    def cheap_pixel_batch(arrays, h, w, key, ray_batch,
                          mask_guided=True, pixel_sampler="cdf"):
        del mask_guided, pixel_sampler
        k_frame, k_pix = jax.random.split(key)
        list_train = arrays["list_train"]
        fid = list_train[
            jax.random.randint(k_frame, (), 0, list_train.shape[0])]
        pix = jax.random.randint(k_pix, (ray_batch,), 0, h * w)
        from endosurf_tpu.ops.geometry import rays_from_pixels
        py = (pix // w).astype(jnp.float32)
        px = (pix % w).astype(jnp.float32)
        rays_o, rays_d = rays_from_pixels(
            px, py, arrays["intrinsics_inv"][fid], arrays["poses"][fid])

        def gather(name):
            return arrays[name][fid].reshape(h * w, -1)[pix]

        bounds = jnp.broadcast_to(arrays["bounds"][fid][None, :],
                                  (ray_batch, 2))
        t = jnp.full((ray_batch, 1), arrays["ts"][fid])
        rays = jnp.concatenate([rays_o, rays_d, bounds, t], axis=-1)
        return {"rays": rays, "color": gather("colors"),
                "depth": gather("depths"), "mask": gather("masks"),
                "color_mask": gather("color_masks"),
                "depth_mask": gather("depth_masks"), "frame_id": fid}

    def build(mode):
        tx = optax.sgd(schedule) if mode == "sgd" else optax.adam(schedule)
        sampler = "alias" if mode == "alias_pixels" else "cdf"
        if mode == "mean_composite":
            es.neus_alpha = cheap_alpha
            es.exclusive_cumprod_weights = cheap_weights
        if mode == "cheap_pixels":
            tes.sample_train_batch = cheap_pixel_batch
        try:
            step = make_train_step(spec, rspec, tx, scene.h, scene.w,
                                   ray_batch, weights, surf_neig_rad=0.1,
                                   remat=False, pixel_sampler=sampler)
            p = jax.tree_util.tree_map(jnp.array, params0)
            st = tx.init(p)
            p, st, m = step(p, st, scene.device_arrays,
                            jax.random.PRNGKey(2), jnp.asarray(1.0))
            float(np.asarray(m["loss_total"]))  # fence the warm dispatch
        finally:
            es.neus_alpha = orig_alpha
            es.exclusive_cumprod_weights = orig_cumprod
            tes.sample_train_batch = orig_sample_batch
        return step, (p, st, jax.random.PRNGKey(3))

    steps, state = {}, {}
    for mode in MODES:
        t0 = time.perf_counter()
        steps[mode], state[mode] = build(mode)
        print(f"# built {mode} in {time.perf_counter() - t0:.1f}s",
              flush=True)

    n_steps, n_windows = (2, 1) if tiny else (50, 4)
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

    def delta(mode):
        return round(ms["full"] - ms[mode], 2) if mode in ms else None

    print(json.dumps({
        "composite_ms": delta("mean_composite"),
        "pixel_cdf_ms": delta("cheap_pixels"),
        "alias_saving_ms": delta("alias_pixels"),
        "adam_vs_sgd_ms": delta("sgd"),
    }), flush=True)


if __name__ == "__main__":
    main()
