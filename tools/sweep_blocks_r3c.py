#!/usr/bin/env python
"""One-process step-level A/B sweep of the sampler/render kernel ray-block
size (BLOCK_R), following the fused_train block lesson (256->1024 won 13%).

Isolated kernel timings on the tunneled TPU are unreliable (CLAUDE.md:
contention windows can read 3x worse); this times the FULL jitted step /
serving call per block setting inside one process, writing one JSON line
per config to stdout (redirect to a log) as each finishes.

Stages: endosurf train step (sampler blocks), serving render (render-kernel
blocks), endonerf train step (sampler blocks drive its fine-resample too).
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

BLOCKS = [256, 512, 1024]


def _emit(rec):
    print(json.dumps(rec), flush=True)


def _fence(x):
    return float(np.asarray(x).ravel()[0])


def _time_train(step_fn, params, opt_state, arrays, ray_batch,
                n_steps=30, n_windows=2):
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(2):  # compile + settle
        key, k = jax.random.split(key)
        params, opt_state, metrics = step_fn(params, opt_state, arrays, k,
                                             jnp.asarray(float(i + 1)))
        _fence(metrics["loss_total"])
    compile_s = time.perf_counter() - t0
    rates = []
    si = 3
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step_fn(
                params, opt_state, arrays, k, jnp.asarray(float(si)))
            si += 1
        _fence(metrics["loss_total"])
        rates.append(n_steps * ray_batch / (time.perf_counter() - t0))
    assert np.isfinite(_fence(metrics["loss_total"]))
    return rates, compile_s


def stage_endosurf(blocks):
    import jax
    import optax
    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.kernels import fused_sampler
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)
    saved_blk = fused_sampler.BLOCK_R
    for blk in blocks:
        fused_sampler.set_block_r(blk)
        try:
            step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w,
                                      ray_batch, lw, surf_neig_rad=0.1,
                                      remat=False)
            rates, compile_s = _time_train(step_fn, params0, tx.init(params0),
                                           scene.device_arrays, ray_batch)
            _emit({"stage": "endosurf_train", "sampler_block_r": blk,
                   "rays_per_sec": [round(r, 1) for r in rates],
                   "median": round(float(np.median(rates)), 1),
                   "compile_s": round(compile_s, 1)})
        except Exception as e:
            _emit({"stage": "endosurf_train", "sampler_block_r": blk,
                   "error": repr(e)[:300]})
    fused_sampler.set_block_r(saved_blk)


def stage_serving(blocks):
    import jax
    import jax.numpy as jnp
    from endosurf_tpu.data.scene_data import frame_rays, make_synthetic_arrays
    from endosurf_tpu.kernels import fused_render
    from endosurf_tpu.models.endosurf import (RenderSpec,
                                              render_rays_inference)
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    arrays = scene.device_arrays
    spec, rspec = EndoSurfSpec(), RenderSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    step_f = jnp.asarray(100000.0)
    all_rays = np.asarray(
        frame_rays(arrays, scene.h, scene.w, 0)).reshape(-1, 9)
    chunk = 2048
    n = (len(all_rays) // chunk) * chunk
    rays = jnp.asarray(all_rays[:n]).reshape(-1, chunk, 9)
    fused_render.set_render_kernel_mode("auto")
    saved_blk = fused_render.BLOCK_R
    for blk in blocks:
        fused_render.set_block_r(blk)
        try:
            @jax.jit
            def render(params, r):
                return render_rays_inference(spec, rspec, params, r, step_f)

            t0 = time.perf_counter()
            out = render(params, rays[0])
            _fence(out["color_map"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            done = 0
            for _ in range(2):
                for i in range(rays.shape[0]):
                    out = render(params, rays[i])
                    done += chunk
            _fence(out["color_map"])
            dt = time.perf_counter() - t0
            _emit({"stage": "serving", "render_block_r": blk,
                   "rays_per_sec": round(done / dt, 1),
                   "compile_s": round(compile_s, 1)})
        except Exception as e:
            _emit({"stage": "serving", "render_block_r": blk,
                   "error": repr(e)[:300]})
    fused_render.set_block_r(saved_blk)


def stage_endonerf(blocks):
    import jax
    import optax
    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.kernels import fused_sampler
    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              init_dnerf_params)
    from endosurf_tpu.train.schedules import exponential
    from endosurf_tpu.train.trainer_endonerf import make_train_step

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = DNeRFSpec(), DNeRFRenderSpec()
    ray_batch = 2048
    tx = optax.adam(exponential(5e-4, 250))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}
    params0 = init_dnerf_params(jax.random.PRNGKey(0), spec)
    saved_blk = fused_sampler.BLOCK_R
    for blk in blocks:
        fused_sampler.set_block_r(blk)
        try:
            step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w,
                                      ray_batch, lw)
            rates, compile_s = _time_train(step_fn, params0, tx.init(params0),
                                           scene.device_arrays, ray_batch)
            _emit({"stage": "endonerf_train", "sampler_block_r": blk,
                   "rays_per_sec": [round(r, 1) for r in rates],
                   "median": round(float(np.median(rates)), 1),
                   "compile_s": round(compile_s, 1)})
        except Exception as e:
            _emit({"stage": "endonerf_train", "sampler_block_r": blk,
                   "error": repr(e)[:300]})
    fused_sampler.set_block_r(saved_blk)


def main():
    from endosurf_tpu.models.fields import set_deform_jac_mode
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    set_deform_jac_mode("linearize")

    stages = sys.argv[1:] or ["endosurf", "serving", "endonerf"]
    if "endosurf" in stages:
        stage_endosurf(BLOCKS)
    if "serving" in stages:
        stage_serving(BLOCKS)
    if "endonerf" in stages:
        stage_endonerf(BLOCKS)


if __name__ == "__main__":
    main()
