#!/usr/bin/env python
"""Offline-inference (eval/demo render) throughput on the default device.

The training rays/s number (bench.py) is the round headline; this measures
the serving path: full-frame chunked rendering through the jitted eval
renderer (render_rays without grads), the workload behind --mode
test/test_2d/demo. Prints one JSON line per chunk size.

Usage: python tools/bench_eval.py [--chunks 2048 4096 8192] [--frames 4]
"""

import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[2048, 4096, 8192])
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--precision", default="default")
    ap.add_argument("--limit", type=int, default=0,
                    help="cap rays per frame-equivalent (CPU smoke tests)")
    ap.add_argument("--chunks-per-call", type=int, nargs="+", default=[1],
                    help="fold N chunks into one dispatch via lax.map "
                         "(amortizes tunnel RTT; see render_eval)")
    ap.add_argument("--megakernel", default="auto",
                    choices=["auto", "on", "off"],
                    help="Pallas megakernel mode for the fwd field eval "
                         "(the fwd-only serving path may prefer XLA)")
    ap.add_argument("--render-kernel", nargs="+", default=["off", "auto"],
                    choices=["auto", "on", "off"],
                    help="whole-pipeline inference megakernel modes to "
                         "sweep (kernels/fused_render.py); the default "
                         "measures the XLA-composed path vs the fused "
                         "dispatch in one process")
    ap.add_argument("--model", default="endosurf",
                    choices=["endosurf", "endonerf"],
                    help="endonerf measures the baseline vertical's eval "
                         "renderer (depth-guided sampling, slots 6/7 "
                         "rewritten like eval_ray_transform); --render-"
                         "kernel sweeps its whole-pipeline kernel "
                         "(kernels/fused_render_dnerf.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from endosurf_tpu.data.scene_data import (frame_rays,
                                              make_synthetic_arrays)
    from endosurf_tpu.kernels.fused_render import set_render_kernel_mode
    from endosurf_tpu.models.endosurf import (RenderSpec,
                                              render_rays_inference)
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
    from endosurf_tpu.ops.mlp import (set_matmul_precision,
                                      set_sampling_precision)

    set_matmul_precision(args.precision)
    set_sampling_precision("default")
    from endosurf_tpu.kernels.fused_train_dnerf import \
        set_dnerf_megakernel_mode
    from endosurf_tpu.models.fields import set_megakernel_mode
    set_megakernel_mode(args.megakernel)
    set_dnerf_megakernel_mode(args.megakernel)

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    arrays = scene.device_arrays
    step_f = jnp.asarray(100000.0)

    all_rays = np.asarray(
        frame_rays(arrays, scene.h, scene.w, 0)).reshape(-1, 9)
    if args.model == "endonerf":
        # eval_ray_transform equivalent: gt depth + sigma into slots 6/7
        # (reference trainer_endonerf.py:163-165).
        from endosurf_tpu.kernels.fused_render_dnerf import \
            set_dnerf_render_kernel_mode
        from endosurf_tpu.models.endonerf import (DNeRFRenderSpec,
                                                  DNeRFSpec,
                                                  init_dnerf_params)
        from endosurf_tpu.models.endonerf import \
            render_rays_inference as dn_render
        en_spec, en_rspec = DNeRFSpec(), DNeRFRenderSpec()
        en_params = init_dnerf_params(jax.random.PRNGKey(0), en_spec)
        all_rays = all_rays.copy()
        all_rays[:, 6:7] = np.asarray(
            arrays["depths"][0]).reshape(-1, 1)
        all_rays[:, 7] = en_rspec.depth_sampling_sigma
    else:
        spec, rspec = EndoSurfSpec(), RenderSpec()
        params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    if args.limit:
        all_rays = all_rays[:args.limit]

    import jax.lax as lax

    for rk_mode in args.render_kernel:
        # Fresh jit closures per mode: the render-kernel gate is read at
        # trace time, so a cached trace would pin the previous mode.
        if args.model == "endonerf":
            params = en_params
            set_dnerf_render_kernel_mode(rk_mode)

            # render_rays_inference matches the trainer's eval render_fn
            # (want_normals=False inside; the reference derives EndoNeRF
            # display normals from depth).
            @jax.jit
            def render(params, rays):
                return dn_render(en_spec, en_rspec, params, rays)
        else:
            set_render_kernel_mode(rk_mode)

            @jax.jit
            def render(params, rays):
                return render_rays_inference(spec, rspec, params, rays,
                                             step_f)

        for chunk in args.chunks:
          for cpc in args.chunks_per_call:
            n = (len(all_rays) // (chunk * cpc)) * chunk * cpc
            if n == 0:
                continue
            rays = jnp.asarray(all_rays[:n]).reshape(-1, cpc, chunk, 9)

            # Plain closures: ``call`` is consumed within this iteration,
            # so loop-variable late binding cannot bite.
            if cpc == 1:
                def call(group):
                    return render(params, group[0])
            else:
                @jax.jit
                def render_many(params, group):
                    return lax.map(lambda r: render(params, r), group)

                def call(group):
                    return render_many(params, group)

            # Warmup/compile, then timed passes over args.frames
            # frame-equivalents.
            out = call(rays[0])
            float(np.asarray(out["color_map"]).ravel()[0])
            t0 = time.perf_counter()
            done = 0
            for _ in range(args.frames):
                for i in range(rays.shape[0]):
                    out = call(rays[i])
                    done += chunk * cpc
            float(np.asarray(out["color_map"]).ravel()[0])  # fence
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"{args.model}_eval_rays_per_sec",
                "ray_chunk": chunk,
                "chunks_per_call": cpc,
                "value": round(done / dt, 1), "unit": "rays/s",
                "precision": args.precision,
                "megakernel": args.megakernel,
                "render_kernel": rk_mode,
            }), flush=True)


if __name__ == "__main__":
    main()
