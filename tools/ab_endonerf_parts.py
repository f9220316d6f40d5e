#!/usr/bin/env python
"""One-process step-rate A/B over the PARTS of the EndoNeRF train step.

The round-5 train ceiling decomposition (results/r5/train_ceiling.json)
leaves EndoNeRF train with a 14.4 ms NON-DOT residual in a 29.4 ms step
(hardware-dot time 14.8 ms) — attributed generically to "VPU compositing
fwd+bwd". This tool pins WHERE it lives, by tracing step variants with one
part disabled (monkeypatch at trace time; each jitted step owns its traced
program; same one-process interleaved-window discipline as
tools/ab_surf_neig_parts.py):

  full            — shipping step (bench.py's exact config)
  no_importance   — n_samples=128, n_importance=0: kills the coarse
                    sigma-only pass AND the fused fine-resample kernel;
                    the fine eval keeps its [2048,128] shape. Expected dot
                    saving alone ~3.6 ms (hardware 14.83 - model 11.22);
                    savings beyond that are the importance stage's VPU glue.
  no_gauss_sort   — jnp.sort of the gaussian depth draws skipped (z stays
                    unsorted; semantics broken, shapes identical) — prices
                    the [2048,64] XLA sort.
  mean_composite  — raw2outputs' exp + exclusive-cumprod chain replaced by
                    a plain weighted sum (same shapes) — prices the
                    compositing transcendentals + scan fwd+bwd OUTSIDE the
                    megakernel.
  cheap_pixels    — the mask-guided pixel draw's binary search over the
                    H*W=327k CDF replaced by uniform pixel indices (same
                    gathers) — prices the batch sampler's searchsorted.
  sgd             — optax.sgd instead of adam — prices the Adam moment
                    update + its HBM traffic.

Reference chain being priced: /root/reference/src/renderer/endonerf.py:
56-196 (render_rays + importance_sampling_ray + raw2outputs) consumed at
trainer_endonerf.py:94-139; the reference pays these on CUDA, we pay the
TPU/VPU equivalents.
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

MODES = ("full", "no_importance", "no_gauss_sort", "mean_composite",
         "cheap_pixels", "alias_pixels", "sgd")
if os.environ.get("ESN_AB_MODES"):
    MODES = tuple(m for m in os.environ["ESN_AB_MODES"].split(",")
                  if m in MODES)


def main():
    import dataclasses

    import jax

    if int(os.environ.get("ESN_AB_CPU", "0")):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    import endosurf_tpu.models.endonerf as en
    import endosurf_tpu.train.trainer_endonerf as ten
    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              init_dnerf_params)
    from endosurf_tpu.models.fields import set_deform_jac_mode
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train.schedules import exponential
    from endosurf_tpu.train.trainer_endonerf import make_train_step

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
        ray_batch = 2048
    spec = DNeRFSpec()
    rspec = DNeRFRenderSpec()
    schedule = exponential(5e-4, 250)
    loss_weights = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}
    params0 = init_dnerf_params(jax.random.PRNGKey(0), spec)

    orig_raw2outputs = en.raw2outputs
    orig_sample_batch = ten.sample_train_batch
    orig_jnp = en.jnp

    def mean_composite(rgb, sigma, z_vals, rays_d):
        """Same shapes/depth-normalization structure, no exp/cumprod."""
        d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        weights = sigma / (jnp.sum(sigma, axis=-1, keepdims=True) + 1e-6)
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
        depth_raw = jnp.sum(weights * z_vals * d_norm, axis=-1)
        depth_map = depth_raw[..., None]
        return rgb_map, depth_map, weights

    def cheap_pixel_batch(arrays, h, w, key, ray_batch,
                          mask_guided=True, pixel_sampler="cdf"):
        """Uniform pixel draw: keeps every gather, skips the CDF search."""
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

    class _JnpNoSort:
        """jnp proxy whose sort is identity (trace-time seam for the
        gaussian-z sort at models/endonerf.py:290)."""

        def __getattr__(self, name):
            return getattr(orig_jnp, name)

        @staticmethod
        def sort(x, axis=-1):
            del axis
            return x

    def build(mode):
        rs = rspec
        tx = optax.adam(schedule)
        sampler = "alias" if mode == "alias_pixels" else "cdf"
        if mode == "no_importance":
            rs = dataclasses.replace(rspec, n_samples=128, n_importance=0)
        if mode == "sgd":
            tx = optax.sgd(schedule)
        if mode == "mean_composite":
            en.raw2outputs = mean_composite
        if mode == "cheap_pixels":
            ten.sample_train_batch = cheap_pixel_batch
        if mode == "no_gauss_sort":
            en.jnp = _JnpNoSort()
        try:
            step = make_train_step(spec, rs, tx, scene.h, scene.w,
                                   ray_batch, loss_weights,
                                   pixel_sampler=sampler)
            p = jax.tree_util.tree_map(jnp.array, params0)
            st = tx.init(p)
            p, st, m = step(p, st, scene.device_arrays,
                            jax.random.PRNGKey(2), jnp.asarray(1.0))
            float(np.asarray(m["loss_total"]))  # fence the warm dispatch
        finally:
            en.raw2outputs = orig_raw2outputs
            ten.sample_train_batch = orig_sample_batch
            en.jnp = orig_jnp
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
        "importance_stage_ms": delta("no_importance"),
        "gauss_sort_ms": delta("no_gauss_sort"),
        "composite_ms": delta("mean_composite"),
        "pixel_cdf_ms": delta("cheap_pixels"),
        "alias_saving_ms": delta("alias_pixels"),
        "adam_vs_sgd_ms": delta("sgd"),
    }), flush=True)


if __name__ == "__main__":
    main()
