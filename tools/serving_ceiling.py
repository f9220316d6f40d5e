#!/usr/bin/env python
"""Ceiling analysis for the two serving paths (VERDICT r4 item 8).

Question: both inference megakernels sit at ~49% of bf16 peak
(results/r4/r4_mfu.json: EndoSurf 48.9%, EndoNeRF 49.6%) with 20x
DIFFERENT transcendental budgets (1.32 G vs 0.063 G per 2048-ray batch)
— so transcendentals cannot be the shared ceiling. What is?

Hypothesis: MXU tile padding. Model-FLOPs counts 2*M*K*N for every dot,
but the MXU processes 128x128 tiles (8-row sublanes on the M axis): a
dot with K=39 (frequency-encoded position into the first MLP layer) or
N=4 (head layers) occupies full tiles and wastes the difference. The
model-FLOPs MFU charges that waste to "inefficiency"; hardware-FLOPs
(padded) MFU shows how close the schedule is to the machine's real
ceiling for these shapes.

Method: trace the SAME kernels-off serving graphs used by tools/mfu.py
(the Pallas kernels execute the identical math with the same layer
shapes, so the dot inventory transfers), walk the closed jaxpr
recursively (pjit / scan / cond / custom_*), collect every dot_general's
(batch, M, K, N), and sum
  model  = 2*B*M*K*N
  padded = 2*B*roundup(M,8)*roundup(K,128)*roundup(N,128)
per dot. Padded time = padded / bf16 peak; transcendental time =
count / VPU rate (--vpu-gops, default 7 transc/cycle-lane at 940 MHz
x 8x128 lanes ~ 0.96 T/s single-pass equivalent; exp/sigmoid cost
multiple passes, so the default is deliberately a LOWER bound on time
only when raised — treat this row as an estimate, the MXU row is exact).

Usage:
  python tools/serving_ceiling.py [--bench logs/r5_bench.json]
                                  [--peak-tflops 197] [--vpu-gops 960]

Reference scope note: the reference has no serving-kernel analog (it
renders eval images through the training forward, endosurf.py render
loop); this analysis bounds OUR kernels against the TPU, not against it.
"""

import argparse
import json
import os.path as osp
import sys
from math import ceil, prod

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _roundup(x, m):
    return m * ceil(x / m)


def collect_dots(jaxpr, mult, dots):
    """Walk a (closed) jaxpr, recursing into inner jaxprs; `mult`
    multiplies per-trip counts (lax.scan length, while upper bounds are
    unknowable -> count once and flag)."""
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
            a, b = eqn.invars[0].aval.shape, eqn.invars[1].aval.shape
            batch = prod(a[i] for i in lb) if lb else 1
            m = prod(a[i] for i in range(len(a)) if i not in lc + lb)
            k = prod(a[i] for i in lc)
            n = prod(b[i] for i in range(len(b)) if i not in rc + rb)
            dots.append((mult, batch, m, k, n))
            continue
        inner = []
        if prim == "scan":
            inner = [(eqn.params["jaxpr"], mult * eqn.params["length"])]
        elif prim == "while":
            inner = [(eqn.params["body_jaxpr"], mult),
                     (eqn.params["cond_jaxpr"], mult)]
        elif prim == "cond":
            inner = [(br, mult) for br in eqn.params["branches"]]
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if key in eqn.params:
                    inner = [(eqn.params[key], mult)]
                    break
        for sub, m2 in inner:
            collect_dots(getattr(sub, "jaxpr", sub), m2, dots)


def summarize(dots, peak):
    """Bucket dots: contractions with K*N < 128 lower to VPU mul+reduce
    on TPU (XLA rewrites tiny dots), so MXU tile padding does not apply
    to them; everything else pays roundup(M,8) x roundup(K,128) x
    roundup(N,128) MXU tiles."""
    mxu = [d for d in dots if d[3] * d[4] >= 128]
    vpu = [d for d in dots if d[3] * d[4] < 128]
    model = sum(2 * c * b * m * k * n for c, b, m, k, n in dots)
    mxu_model = sum(2 * c * b * m * k * n for c, b, m, k, n in mxu)
    padded = sum(2 * c * b * _roundup(m, 8) * _roundup(k, 128)
                 * _roundup(n, 128) for c, b, m, k, n in mxu)
    vpu_flop = sum(2 * c * b * m * k * n for c, b, m, k, n in vpu)
    # Worst offenders by padded-minus-model cycles.
    worst = sorted(mxu, key=lambda d: 2 * d[0] * d[1]
                   * (_roundup(d[2], 8) * _roundup(d[3], 128)
                      * _roundup(d[4], 128) - d[2] * d[3] * d[4]),
                   reverse=True)[:4]
    return {
        "dot_model_gflop": round(model / 1e9, 2),
        "mxu_dot_model_gflop": round(mxu_model / 1e9, 2),
        "mxu_dot_padded_gflop": round(padded / 1e9, 2),
        "pad_factor": round(padded / mxu_model, 3),
        "tiny_dot_vpu_gflop": round(vpu_flop / 1e9, 3),
        "mxu_ms_model": round(mxu_model / peak * 1e3, 3),
        "mxu_ms_padded": round(padded / peak * 1e3, 3),
        "worst_padded_dots_MxKxN_xcount": [
            "%dx%dx%d x%d" % (m, k, n, c * b) for c, b, m, k, n in worst],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None,
                    help="bench JSON for measured serving rates")
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--vpu-gops", type=float, default=960.0,
                    help="estimated transcendental rate, G evals/s")
    ap.add_argument("--es-serving-rps", type=float, default=None)
    ap.add_argument("--endonerf-serving-rps", type=float, default=None)
    args = ap.parse_args()

    rates = {}
    if args.bench:
        with open(args.bench) as f:
            rec = json.loads(f.read().strip().splitlines()[-1])
        rates["endosurf_serving"] = rec.get("eval_rays_per_sec")
        rates["endonerf_serving"] = rec.get("endonerf_eval_rays_per_sec")
    if args.es_serving_rps:
        rates["endosurf_serving"] = args.es_serving_rps
    if args.endonerf_serving_rps:
        rates["endonerf_serving"] = args.endonerf_serving_rps

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from endosurf_tpu.kernels.fused_render import set_render_kernel_mode
    from endosurf_tpu.kernels.fused_render_dnerf import \
        set_dnerf_render_kernel_mode
    from endosurf_tpu.kernels.fused_sampler import (set_march_kernel_mode,
                                                    set_sampler_kernel_mode)
    from endosurf_tpu.models.endonerf import (DNeRFRenderSpec, DNeRFSpec,
                                              init_dnerf_params)
    from endosurf_tpu.models.endonerf import \
        render_rays_inference as dn_render_inference
    from endosurf_tpu.models.endosurf import (RenderSpec,
                                              render_rays_inference)
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)

    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    for setter in (set_sampler_kernel_mode, set_march_kernel_mode,
                   set_render_kernel_mode, set_dnerf_render_kernel_mode):
        setter("off")

    chunk = 2048
    rays = jnp.concatenate(
        [jnp.zeros((chunk, 2)), jnp.full((chunk, 1), -1.5),
         jnp.zeros((chunk, 2)), jnp.ones((chunk, 1)),
         jnp.full((chunk, 1), 0.5), jnp.full((chunk, 1), 2.5),
         jnp.full((chunk, 1), 0.5)], -1)

    spec, rspec = EndoSurfSpec(), RenderSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    en_spec, en_rspec = DNeRFSpec(), DNeRFRenderSpec()
    en_params = init_dnerf_params(jax.random.PRNGKey(0), en_spec)

    es_fn = lambda p, r: render_rays_inference(  # noqa: E731
        spec, rspec, p, r, jnp.asarray(100000.0))["color_map"]
    en_rays = rays.at[:, 6].set(1.45).at[:, 7].set(1.0)
    en_fn = lambda p, r: dn_render_inference(  # noqa: E731
        en_spec, en_rspec, p, r)["color_map"]
    paths = {
        "endosurf_serving": (
            lambda: jax.make_jaxpr(es_fn)(params, rays),
            lambda: jax.jit(es_fn).lower(params, rays)),
        "endonerf_serving": (
            lambda: jax.make_jaxpr(en_fn)(en_params, en_rays),
            lambda: jax.jit(en_fn).lower(en_params, en_rays)),
    }

    peak = args.peak_tflops * 1e12
    # Transcendental counts per 2048-ray batch from the kernels-off XLA
    # cost analysis (tools/mfu.py output, results/r4/r4_mfu.json).
    trans_g = {"endosurf_serving": 1.322, "endonerf_serving": 0.063}
    for name, (make, lower) in paths.items():
        dots = []
        collect_dots(make().jaxpr, 1, dots)
        rec = {"path": name, "rays_per_batch": chunk, **summarize(dots, peak)}
        # Post-optimization totals (CSE'd): total - pre-CSE dot flops is a
        # LOWER bound on non-dot vector flops (pre-CSE dots >= post-CSE).
        cost = lower().compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        rec["xla_cost_total_gflop"] = round(float(cost["flops"]) / 1e9, 2)
        rec["vector_gflop_lower_bound"] = round(max(
            0.0, float(cost["flops"]) - rec["dot_model_gflop"] * 1e9) / 1e9,
            2)
        # Caveat: the jaxpr inventory is PRE-optimization — XLA CSE dedupes
        # repeated field evals (cost_analysis totals run ~15% lower on
        # EndoSurf) — so padded figures are upper bounds on MXU time.
        rec["vpu_ms_est"] = round(
            trans_g[name] * 1e9 / (args.vpu_gops * 1e9) * 1e3, 3)
        rps = rates.get(name)
        if rps:
            measured_ms = chunk / rps * 1e3
            rec["measured_ms"] = round(measured_ms, 3)
            rec["mfu_model"] = round(
                rec["dot_model_gflop"] / peak * 1e12 / measured_ms, 4)
            rec["mfu_padded"] = round(
                rec["mxu_dot_padded_gflop"] / peak * 1e12 / measured_ms, 4)
            rec["residual_ms_after_padded_mxu_and_vpu"] = round(
                measured_ms - rec["mxu_ms_padded"] - rec["vpu_ms_est"], 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
