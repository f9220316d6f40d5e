#!/usr/bin/env python
"""Benchmark: EndoSurf training throughput (rays/sec) on the default device.

Runs the flagship configuration — full-size 9x256 deform/SDF/color fields,
32 stratified + 32 importance samples/ray, 1024-ray batches, all six losses
including the 128-step sphere-traced surface-neighbour regularizer — i.e. the
same per-iteration work as the reference's base_pull.yml training
(/root/reference/configs/endosurf/baseline/base_pull.yml), on an in-memory
synthetic scene (the real datasets are not redistributable). The EndoNeRF
baseline vertical's flagship step (64+64 samples, 2048 rays — reference
configs/endonerf/baseline/base_pull.yml) is measured alongside and reported
as a secondary field.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md); the
denominator is an estimate of the PyTorch reference on a single modern CUDA
GPU (~3.5 it/s at 1024 rays/iter ~= 3,500 rays/s for NeuS-class pipelines
with double-backprop Eikonal terms). Replace with a measured number when the
reference can be profiled on comparable hardware.
"""

import json
import time

import numpy as np

REFERENCE_RAYS_PER_SEC_ESTIMATE = 3500.0


def _arm_watchdog(seconds: float = 3000.0):
    """Hard-exit if the device wedges (the tunneled TPU occasionally blocks
    all dispatches indefinitely); a clean failure beats a silent hang."""
    import os
    import sys
    import threading

    def boom():
        print("bench watchdog: device did not complete within "
              f"{seconds:.0f}s — aborting", file=sys.stderr, flush=True)
        os._exit(2)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def _measure(step_fn, params, opt_state, arrays, ray_batch,
             n_steps=50, n_windows=4, tag=""):
    """Warm up (compile), then time n_windows windows of n_steps steps.

    Synchronization: fetch a scalar to host — on the tunneled TPU platform
    block_until_ready returns prematurely, and the sequential params
    dependency means one final fetch fences all steps. Returns the list of
    per-window rays/s rates.
    """
    import sys

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        t = time.perf_counter()
        params, opt_state, metrics = step_fn(params, opt_state, arrays, k,
                                             jnp.asarray(float(i + 1)))
        loss = float(np.asarray(metrics["loss_total"]))
        print(f"# {tag} warmup {i}: {time.perf_counter() - t:.1f}s "
              f"loss={loss:.4f}", file=sys.stderr, flush=True)

    # The tunneled TPU's dispatch latency fluctuates with contention
    # (CLAUDE.md: 1.5s..22s observed for a tiny probe). Measure several
    # windows; the MEDIAN window is the headline (best-of-N was
    # methodologically optimistic — ADVICE r2), the spread is disclosed.
    rates = []
    step_i = 4
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            params, opt_state, metrics = step_fn(
                params, opt_state, arrays, k, jnp.asarray(float(step_i)))
            step_i += 1
        float(np.asarray(metrics["loss_total"]))  # host fetch = fence
        rates.append(n_steps * ray_batch / (time.perf_counter() - t0))
    assert np.isfinite(float(np.asarray(metrics["loss_total"])))
    return rates


def bench_endosurf():
    import jax
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endosurf import RenderSpec
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
    from endosurf_tpu.train.schedules import warmup_cosine
    from endosurf_tpu.train.trainer_endosurf import make_train_step

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec = EndoSurfSpec()
    rspec = RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    loss_weights = {
        "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
        "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
        "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
    }
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, ray_batch,
                              loss_weights, surf_neig_rad=0.1, remat=False)
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    return _measure(step_fn, params, tx.init(params), scene.device_arrays,
                    ray_batch, tag="endosurf")


def bench_eval_serving(model: str = "endosurf", budget_s: float = 1800.0):
    """Serving-path throughput (eval/demo renderer, no gradients) at the
    shipping config: 2048-ray chunks through render_rays_inference (the
    fused whole-pipeline kernels on TPU, kernels/fused_render*.py).

    Runs as a BOUNDED SUBPROCESS (tools/bench_eval.py) so a tunnel stall
    here can only cost its own budget, never the headline training metric
    (the caller cancels its watchdog first). The budget is generous: the
    render-kernel Mosaic compile is ~300 s uncached and a timeout KILLS the
    child mid-compile, which can wedge the tunnel for whatever runs next
    (CLAUDE.md) — these stages are therefore the LAST device work in bench.
    Returns rays/s or None."""
    import os.path as osp
    import subprocess
    import sys

    cmd = [sys.executable,
           osp.join(osp.dirname(osp.abspath(__file__)), "tools",
                    "bench_eval.py"), "--model", model,
           "--chunks", "2048", "--chunks-per-call", "1", "--frames", "2",
           "--render-kernel", "auto"]
    # One retry: the tunnel's remote-compile helper intermittently returns
    # HTTP 500 (observed killing whole sweep units, logs/r4_ab_sampler_
    # block.log); a lost serving number from a transient is worth 60s.
    for attempt in range(2):
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=budget_s)
        except subprocess.TimeoutExpired:
            print(f"# bench_eval_serving({model}) attempt {attempt}: "
                  f"timeout after {budget_s}s", file=sys.stderr, flush=True)
            continue
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("metric") == f"{model}_eval_rays_per_sec":
                return rec["value"]
        # No metric line: surface the child's tail so a driver-run bench
        # records WHY the field is null instead of a silent gap.
        tail = "\n".join((proc.stderr or proc.stdout or "").splitlines()[-8:])
        print(f"# bench_eval_serving({model}) attempt {attempt}: no metric; "
              f"child tail:\n{tail}", file=sys.stderr, flush=True)
    return None


def bench_endonerf():
    import jax
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.models.endonerf import DNeRFRenderSpec, DNeRFSpec, \
        init_dnerf_params
    from endosurf_tpu.train.schedules import exponential
    from endosurf_tpu.train.trainer_endonerf import make_train_step

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec = DNeRFSpec()
    rspec = DNeRFRenderSpec()
    ray_batch = 2048
    tx = optax.adam(exponential(5e-4, 250))
    loss_weights = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0}
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, ray_batch,
                              loss_weights)
    params = init_dnerf_params(jax.random.PRNGKey(0), spec)
    return _measure(step_fn, params, tx.init(params), scene.device_arrays,
                    ray_batch, n_windows=2, tag="endonerf")


def main():
    watchdog = _arm_watchdog()

    from endosurf_tpu.models.fields import set_deform_jac_mode
    from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)
    # Shipping defaults (trainer setup mirrors these; measured in
    # VALIDATION.md's mode matrix + quality gates): bf16 MXU passes, bf16
    # MLP-interior storage, bf16 stop-gradient sampling paths, linearize
    # deform-Jacobian products.
    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")
    set_deform_jac_mode("linearize")

    es_rates = bench_endosurf()
    en_rates = bench_endonerf()
    # Training metrics are in hand: cancel the watchdog BEFORE the serving
    # stage so a stall there can never discard the headline — the serving
    # subprocess is bounded by its own budget instead.
    watchdog.cancel()
    eval_rates = {}
    for model in ("endosurf", "endonerf"):
        try:
            eval_rates[model] = bench_eval_serving(model)
        except Exception as e:
            import sys
            print(f"# bench_eval_serving({model}) failed: {e!r}",
                  file=sys.stderr, flush=True)
            eval_rates[model] = None
    eval_rate = eval_rates["endosurf"]

    rays_per_sec = float(np.median(es_rates))
    print(json.dumps({
        "metric": "endosurf_train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE,
                             3),
        # The reference publishes no throughput anywhere (BASELINE.md); the
        # denominator is an estimate for NeuS-class double-backprop pipelines
        # on a modern CUDA GPU. Do not over-trust vs_baseline.
        "baseline_is_estimate": True,
        "baseline_rays_per_sec": REFERENCE_RAYS_PER_SEC_ESTIMATE,
        "window_rays_per_sec": [round(r, 1) for r in es_rates],
        "endonerf_rays_per_sec": round(float(np.median(en_rates)), 1),
        "endonerf_window_rays_per_sec": [round(r, 1) for r in en_rates],
        # Serving paths (eval/demo renderer, fused inference kernels on TPU).
        "eval_rays_per_sec": (round(eval_rate, 1)
                              if eval_rate is not None else None),
        "endonerf_eval_rays_per_sec": (
            round(eval_rates["endonerf"], 1)
            if eval_rates.get("endonerf") is not None else None),
    }))


if __name__ == "__main__":
    main()
