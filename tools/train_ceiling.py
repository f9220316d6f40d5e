#!/usr/bin/env python
"""Ceiling decomposition for the TRAIN steps (round 5).

Question: after march-reuse the EndoSurf step runs 51.3k rays/s at 36.6%
model-FLOPs MFU, while the serving kernels reach 57.8% dot-MFU
(`tools/serving_ceiling.py`, VALIDATION "Serving MFU ceiling"). Where do
the remaining ~20 ms/step go? Decompose the measured step time into
  (a) model math     — the MFU numerator (kernels-off dot inventory,
                       XLA stored-activation backward),
  (b) recompute tax  — the fwd+bwd megakernel re-evaluates forward
                       activations inside the backward (in-VMEM recompute;
                       its dots exist on the hardware but not in the
                       model-FLOPs definition),
  (c) MXU tile padding — roundup(M,8) x roundup(K,128) x roundup(N,128),
  (d) precision passes — dots pinned above DEFAULT cost multiple bf16
                       MXU passes (HIGH~3, HIGHEST~6 on v5e; estimates),
  (e) VPU transcendentals (estimate, same rate as serving_ceiling),
  (f) residual       — XLA glue between programs, pipeline bubbles,
                       dispatch, batch sampling, Adam.

Method: trace the SHIPPING step with every Pallas kernel FORCED ON
(`set_*_mode("on")` — kernels trace as `pallas_call` eqns on any backend)
and walk the jaxpr recursively, including pallas_call bodies with grid
multiplicity; the in-kernel `lax.fori_loop`s trace to `scan`s with a
static `length`, so per-trip dots multiply correctly (a `while` eqn would
be unpriceable — the tool counts and reports them; zero expected).
The kernels-OFF trace of the same step gives the model inventory that
`tools/mfu.py` prices. hardware/model padded ratio = the recompute tax.

Both traces are CPU-side (no TPU needed); measured step time comes from
the shipping bench JSON (rays_per_batch / rays_per_sec).

Reference scope note: the reference has no train-kernel analog (PyTorch
autograd end to end, `src/trainer/trainer_endosurf.py:94-181`); this
bounds OUR step against the TPU, not against the reference.

Usage:
  python tools/train_ceiling.py [--bench results/r5/r5_bench.json]
                                [--peak-tflops 197] [--vpu-gops 960]
"""

import argparse
import json
import os.path as osp
import sys
from math import ceil, prod

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _roundup(x, m):
    return m * ceil(x / m)


_PASSES = {"DEFAULT": 1, "HIGH": 3, "HIGHEST": 6}


def _dot_passes(eqn):
    """bf16 MXU pass count for a dot's precision (v5e estimate: DEFAULT =
    one bf16 pass — Mosaic/XLA TPU default; HIGH = bf16x3; HIGHEST =
    f32/bf16x6)."""
    prec = eqn.params.get("precision")
    if prec is None:
        return 1
    if isinstance(prec, (tuple, list)):
        return max(_PASSES.get(getattr(p, "name", str(p)), 1) for p in prec)
    return _PASSES.get(getattr(prec, "name", str(prec)), 1)


def collect_dots(jaxpr, mult, dots, stats):
    """Walk a jaxpr recursively; `mult` multiplies per-trip counts (scan
    length, pallas grid). Appends (mult, batch, M, K, N, passes)."""
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
            a, b = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
            batch = prod(a[i] for i in lb) if lb else 1
            m = prod(a[i] for i in range(len(a)) if i not in lc + lb)
            k = prod(a[i] for i in lc)
            n = prod(b[i] for i in range(len(b)) if i not in rc + rb)
            dots.append((mult, batch, m, k, n, _dot_passes(eqn)))
            continue
        inner = []
        if prim == "scan":
            inner = [(eqn.params["jaxpr"], mult * eqn.params["length"])]
        elif prim == "while":
            # Trip count is not in the jaxpr: count the body ONCE and
            # surface the undercount so it can't hide.
            stats["while_eqns"] = stats.get("while_eqns", 0) + 1
            inner = [(eqn.params["body_jaxpr"], mult),
                     (eqn.params["cond_jaxpr"], mult)]
        elif prim == "cond":
            inner = [(br, mult) for br in eqn.params["branches"]]
        elif prim == "pallas_call":
            grid = tuple(eqn.params["grid_mapping"].grid)
            stats["pallas_calls"] = stats.get("pallas_calls", 0) + 1
            inner = [(eqn.params["jaxpr"], mult * (prod(grid) if grid
                                                   else 1))]
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if key in eqn.params:
                    inner = [(eqn.params[key], mult)]
                    break
        for sub, m2 in inner:
            collect_dots(getattr(sub, "jaxpr", sub), m2, dots, stats)


def summarize(dots, peak):
    """Price the dot inventory. Contractions with K*N < 128 lower to VPU
    mul+reduce (XLA rewrites tiny dots); everything else pays MXU tiles,
    weighted by precision pass count."""
    mxu = [d for d in dots if d[3] * d[4] >= 128]
    vpu = [d for d in dots if d[3] * d[4] < 128]
    model = sum(2 * c * b * m * k * n for c, b, m, k, n, _ in dots)
    mxu_model = sum(2 * c * b * m * k * n for c, b, m, k, n, _ in mxu)
    padded = sum(2 * c * b * _roundup(m, 8) * _roundup(k, 128)
                 * _roundup(n, 128) for c, b, m, k, n, _ in mxu)
    padded_passes = sum(2 * c * b * _roundup(m, 8) * _roundup(k, 128)
                        * _roundup(n, 128) * p
                        for c, b, m, k, n, p in mxu)
    vpu_flop = sum(2 * c * b * m * k * n for c, b, m, k, n, _ in vpu)
    worst = sorted(mxu, key=lambda d: 2 * d[0] * d[1] * d[5]
                   * (_roundup(d[2], 8) * _roundup(d[3], 128)
                      * _roundup(d[4], 128) - d[2] * d[3] * d[4]),
                   reverse=True)[:4]
    return {
        "dot_model_gflop": round(model / 1e9, 2),
        "mxu_dot_padded_gflop": round(padded / 1e9, 2),
        "mxu_dot_padded_passes_gflop": round(padded_passes / 1e9, 2),
        "pad_factor": round(padded / mxu_model, 3) if mxu_model else None,
        "pass_factor": round(padded_passes / padded, 3) if padded else None,
        "tiny_dot_vpu_gflop": round(vpu_flop / 1e9, 3),
        "mxu_ms_padded_passes": round(padded_passes / peak * 1e3, 3),
        "worst_padded_dots_MxKxN_xcount": [
            "%dx%dx%d x%d p%d" % (m, k, n, c * b, p)
            for c, b, m, k, n, p in worst],
    }


def set_all_kernels(mode_on: bool):
    from endosurf_tpu.kernels.fused_sampler import (set_march_kernel_mode,
                                                    set_sampler_kernel_mode)
    from endosurf_tpu.kernels.fused_sdf import set_fused_sdf_enabled
    from endosurf_tpu.kernels.fused_train_dnerf import \
        set_dnerf_megakernel_mode
    from endosurf_tpu.models.fields import set_megakernel_mode

    mode = "on" if mode_on else "off"
    set_megakernel_mode(mode)
    set_dnerf_megakernel_mode(mode)
    set_sampler_kernel_mode(mode)
    set_march_kernel_mode(mode)
    set_fused_sdf_enabled(mode_on)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default="results/r5/r5_bench.json",
                    help="bench JSON for measured train rates")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--vpu-gops", type=float, default=960.0,
                    help="estimated transcendental rate, G evals/s "
                         "(same estimate as serving_ceiling)")
    args = ap.parse_args()

    rates = {}
    with open(args.bench) as f:
        rec = json.loads(f.read().strip().splitlines()[-1])
    rates["endosurf_train"] = rec.get("value")
    rates["endonerf_train"] = rec.get("endonerf_rays_per_sec")

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endonerf import DNeRFRenderSpec, DNeRFSpec, \
        init_dnerf_params
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

    scene = make_synthetic_arrays(n_frames=2, h=512, w=640)
    arrays = scene.device_arrays
    key = jax.random.PRNGKey(0)

    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
          "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
          "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    opt0 = tx.init(params)

    en_spec, en_rspec = DNeRFSpec(), DNeRFRenderSpec()
    en_batch = 2048
    en_tx = optax.adam(exponential(5e-4, 250))
    en_params = init_dnerf_params(jax.random.PRNGKey(0), en_spec)
    en_opt0 = en_tx.init(en_params)

    def es_step():
        return trainer_endosurf.make_train_step(
            spec, rspec, tx, scene.h, scene.w, ray_batch, lw,
            surf_neig_rad=0.1, remat=False)

    def en_step():
        return trainer_endonerf.make_train_step(
            en_spec, en_rspec, en_tx, scene.h, scene.w, en_batch,
            {"color_loss_weight": 1.0, "depth_loss_weight": 1.0})

    peak = args.peak_tflops * 1e12
    paths = {
        "endosurf_train": (es_step, (params, opt0, arrays, key,
                                     jnp.asarray(1.0)), ray_batch),
        "endonerf_train": (en_step, (en_params, en_opt0, arrays, key,
                                     jnp.asarray(1.0)), en_batch),
    }

    for name, (make_step, sargs, batch) in paths.items():
        rec = {"path": name, "rays_per_batch": batch}
        inventories = {}
        for label, on in (("model", False), ("hardware", True)):
            set_all_kernels(on)
            step = make_step()
            dots, stats = [], {}
            collect_dots(jax.make_jaxpr(step)(*sargs).jaxpr, 1, dots, stats)
            inv = summarize(dots, peak)
            inv.update(stats)
            inventories[label] = inv
            rec[label] = inv
            if not on:
                # Post-optimization totals + transcendental count come from
                # the kernels-off compile (pallas_call is opaque to XLA's
                # cost analysis, so only this variant has them).
                cost = jax.jit(step).lower(*sargs).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                rec["xla_cost_total_gflop"] = round(
                    float(cost["flops"]) / 1e9, 2)
                rec["transcendentals_g"] = round(
                    float(cost.get("transcendentals", 0.0)) / 1e9, 3)
        set_all_kernels(False)
        hw, mo = inventories["hardware"], inventories["model"]
        rec["recompute_factor_padded"] = round(
            hw["mxu_dot_padded_gflop"] / mo["mxu_dot_padded_gflop"], 3)
        # Transcendentals recompute roughly with the dots (the backward
        # re-runs the softplus/exp chains) — scale the model count.
        vpu_ms = (rec["transcendentals_g"] * rec["recompute_factor_padded"]
                  * 1e9 / (args.vpu_gops * 1e9) * 1e3)
        rec["vpu_ms_est"] = round(vpu_ms, 3)
        rps = rates.get(name)
        if rps:
            measured_ms = batch / rps * 1e3
            rec["measured_ms"] = round(measured_ms, 3)
            rec["mfu_model"] = round(
                mo["dot_model_gflop"] / peak * 1e12 / measured_ms, 4)
            rec["mfu_hardware_padded_passes"] = round(
                hw["mxu_dot_padded_passes_gflop"] / peak * 1e12
                / measured_ms, 4)
            rec["residual_ms_after_hw_mxu_and_vpu"] = round(
                measured_ms - hw["mxu_ms_padded_passes"] - vpu_ms, 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
