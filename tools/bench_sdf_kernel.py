#!/usr/bin/env python
"""Benchmark: fused Pallas SDF kernel vs XLA sdf_observed (ray-march shape)."""
import json, os.path as osp, sys, time
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from endosurf_tpu.kernels.fused_sdf import fused_sdf_observed
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params, sdf_observed
    from endosurf_tpu.ops.mlp import set_matmul_precision

    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    n = 1024 * 128  # ray-march workload
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-0.8, maxval=0.8)
    t = jax.random.uniform(jax.random.PRNGKey(2), (n, 1))

    def timeit(fn, reps=20):
        out = fn()
        float(np.asarray(out).sum())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        float(np.asarray(out).sum())
        return (time.perf_counter() - t0) / reps * 1000

    for precision in ("highest", "default"):
        set_matmul_precision(precision)
        xla_fn = jax.jit(lambda p, xx, tt: sdf_observed(spec, p, xx, tt))
        ms_xla = timeit(lambda: xla_fn(params, x, t))
        cd = jnp.bfloat16 if precision == "default" else jnp.float32
        ms_pal = timeit(lambda: fused_sdf_observed(spec, params, x, t, compute_dtype=cd))
        print(json.dumps({"precision": precision, "n_points": n,
                          "xla_ms": round(ms_xla, 2),
                          "pallas_ms": round(ms_pal, 2),
                          "speedup": round(ms_xla / ms_pal, 2)}), flush=True)

if __name__ == "__main__":
    main()
