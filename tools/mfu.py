#!/usr/bin/env python
"""Honest MFU for the shipping configurations (VERDICT r3 item 4).

Method
------
MFU = model FLOPs / (measured step time x chip peak). "Model FLOPs" follows
the standard definition (PaLM appendix B): the FLOPs the MATH requires, not
the FLOPs a particular schedule executes — megakernel backward recompute and
bf16x3 multi-pass dots are deliberately excluded. We count them as the XLA
`cost_analysis()["flops"]` of the SAME program compiled with every Pallas
kernel forced off on the CPU backend: that program contains the identical
mathematical graph (fold_aux, losses, Adam included), and with no
pallas_call opaque boxes the count is complete — unlike the round-3 41.8
GFLOP figure, which ran cost analysis on the kernel-dispatching program and
so saw almost none of the work.

Measured times come from a bench JSON (logs/r4_bench*.json schema) and/or
explicit rays/s flags; this tool itself never touches the TPU.

Usage:
  python tools/mfu.py --bench logs/r4_bench1.json \
      [--endonerf-serving-rps 190000] [--peak-tflops 197]
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def count_flops(lowerable, *args):
    cost = lowerable.lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"]), float(cost.get("transcendentals", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None,
                    help="bench.py output JSON (train + ES serving rates)")
    ap.add_argument("--es-train-rps", type=float, default=None)
    ap.add_argument("--en-train-rps", type=float, default=None)
    ap.add_argument("--es-serving-rps", type=float, default=None)
    ap.add_argument("--endonerf-serving-rps", type=float, default=None)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip bf16 peak (v5e 197; the shipping matmul "
                         "mode is bf16)")
    args = ap.parse_args()

    rates = {}
    if args.bench:
        with open(args.bench) as f:
            rec = json.loads(f.read().strip().splitlines()[-1])
        rates["endosurf_train"] = rec.get("value")
        rates["endonerf_train"] = rec.get("endonerf_rays_per_sec")
        rates["endosurf_serving"] = rec.get("eval_rays_per_sec")
        rates["endonerf_serving"] = rec.get("endonerf_eval_rays_per_sec")
    for k, v in (("endosurf_train", args.es_train_rps),
                 ("endonerf_train", args.en_train_rps),
                 ("endosurf_serving", args.es_serving_rps),
                 ("endonerf_serving", args.endonerf_serving_rps)):
        if v is not None:
            rates[k] = v

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.kernels.fused_render import set_render_kernel_mode
    from endosurf_tpu.kernels.fused_render_dnerf import \
        set_dnerf_render_kernel_mode
    from endosurf_tpu.kernels.fused_sampler import (set_march_kernel_mode,
                                                    set_sampler_kernel_mode)
    from endosurf_tpu.kernels.fused_train_dnerf import \
        set_dnerf_megakernel_mode
    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              init_dnerf_params)
    from endosurf_tpu.models.endonerf import \
        render_rays_inference as dn_render_inference
    from endosurf_tpu.models.endosurf import (RenderSpec,
                                              render_rays_inference)
    from endosurf_tpu.models.fields import (EndoSurfSpec,
                                            init_endosurf_params,
                                            set_deform_jac_mode,
                                            set_megakernel_mode)
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    from endosurf_tpu.train import trainer_endonerf, trainer_endosurf
    from endosurf_tpu.train.schedules import exponential, warmup_cosine

    # Shipping modes (bench.py), with every Pallas kernel forced off so the
    # XLA cost analysis sees the complete mathematical graph.
    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    set_deform_jac_mode("linearize")
    for setter in (set_megakernel_mode, set_dnerf_megakernel_mode,
                   set_sampler_kernel_mode, set_march_kernel_mode,
                   set_render_kernel_mode, set_dnerf_render_kernel_mode):
        setter("off")

    scene = make_synthetic_arrays(n_frames=2, h=512, w=640)
    arrays = scene.device_arrays
    key = jax.random.PRNGKey(0)
    rows = []

    # --- EndoSurf train (flagship) -------------------------------------
    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    step = trainer_endosurf.make_train_step(
        spec, rspec, tx, scene.h, scene.w, ray_batch, lw,
        surf_neig_rad=0.1, remat=False)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    flops, trans = count_flops(step, params, tx.init(params), arrays, key,
                               jnp.asarray(1.0))
    rows.append(("endosurf_train", flops, trans, ray_batch))

    # --- EndoNeRF train --------------------------------------------------
    en_spec, en_rspec = DNeRFSpec(), DNeRFRenderSpec()
    en_batch = 2048
    en_tx = optax.adam(exponential(5e-4, 250))
    en_step = trainer_endonerf.make_train_step(
        en_spec, en_rspec, en_tx, scene.h, scene.w, en_batch,
        {"color_loss_weight": 1.0, "depth_loss_weight": 1.0})
    en_params = init_dnerf_params(jax.random.PRNGKey(0), en_spec)
    flops, trans = count_flops(en_step, en_params, en_tx.init(en_params),
                               arrays, key, jnp.asarray(1.0))
    rows.append(("endonerf_train", flops, trans, en_batch))

    # --- Serving (2048-ray chunks, the bench_eval workload) --------------
    chunk = 2048
    rays = jnp.concatenate(
        [jnp.zeros((chunk, 2)), jnp.full((chunk, 1), -1.5),
         jnp.zeros((chunk, 2)), jnp.ones((chunk, 1)),
         jnp.full((chunk, 1), 0.5), jnp.full((chunk, 1), 2.5),
         jnp.full((chunk, 1), 0.5)], -1)
    flops, trans = count_flops(
        jax.jit(lambda p, r: render_rays_inference(
            spec, rspec, p, r, jnp.asarray(100000.0))["color_map"]),
        params, rays)
    rows.append(("endosurf_serving", flops, trans, chunk))

    en_rays = rays.at[:, 6].set(1.45).at[:, 7].set(1.0)
    flops, trans = count_flops(
        jax.jit(lambda p, r: dn_render_inference(
            en_spec, en_rspec, p, r)["color_map"]),
        en_params, en_rays)
    rows.append(("endonerf_serving", flops, trans, chunk))

    peak = args.peak_tflops * 1e12
    for name, flops, trans, batch in rows:
        rec = {"path": name,
               "model_gflops_per_batch": round(flops / 1e9, 2),
               "transcendentals_g": round(trans / 1e9, 3),
               "rays_per_batch": batch,
               "model_flops_per_ray_m": round(flops / batch / 1e6, 3)}
        rps = rates.get(name)
        if rps:
            achieved = flops / batch * rps
            rec.update({
                "measured_rays_per_sec": rps,
                "achieved_model_tflops": round(achieved / 1e12, 2),
                "mfu_vs_bf16_peak": round(achieved / peak, 4),
            })
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "method": "model FLOPs = XLA cost_analysis of the kernels-off "
                  "program (complete graph, no pallas_call opacity); "
                  "recompute/multi-pass excluded per the standard MFU "
                  "definition; peak = %.0f TF/s bf16" % args.peak_tflops}),
        flush=True)


if __name__ == "__main__":
    main()
