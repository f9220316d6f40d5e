#!/usr/bin/env python
"""One-shot REAL-TPU numbers probe for fused_upsample_z(return_sdf=True).

CLAUDE.md round-3 lesson: interpret-mode parity does NOT validate Mosaic
lowering, and TPU probes must check NUMBERS against a jnp reference, not
just "it ran". This probe gates the march-reuse queue stage on three
checks at flagship shapes (1024 rays, 32+32 samples, 4 rounds, bf16
sampling compute — bench.py defaults):

  1. z with return_sdf=True is BIT-IDENTICAL to the shipping kernel's z
     (the flag must not perturb the sampler the renderer already ships);
  2. the emitted per-sample SDF matches an XLA _sdf_sampling evaluation at
     the same points to bf16-level tolerance;
  3. surface_from_samples on (kernel z, kernel sdf) agrees with the same
     localization on (kernel z, XLA sdf): identical valid mask, depths to
     1e-3 (the neighbour radius the consumer samples at is 0.05).

Prints one JSON line; exit 0 only if all checks pass.
"""
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from endosurf_tpu.kernels.fused_sampler import fused_upsample_z
    from endosurf_tpu.models.endosurf import (RenderSpec, _sdf_sampling,
                                              _stratified_z,
                                              surface_from_samples)
    from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
    from endosurf_tpu.ops.geometry import ray_sphere_intersection
    from endosurf_tpu.ops.mlp import (sampling_precision_scope,
                                      set_activation_dtype,
                                      set_matmul_precision,
                                      set_sampling_precision)

    set_matmul_precision("default")
    set_activation_dtype("bfloat16")
    set_sampling_precision("default")

    spec, rspec = EndoSurfSpec(), RenderSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)

    rng = np.random.default_rng(7)
    n = 1024
    d = np.concatenate(
        [rng.uniform(-0.4, 0.4, size=(n, 2)), np.ones((n, 1))], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile([0.0, 0.0, -2.0], (n, 1)) + rng.uniform(-0.1, 0.1, (n, 3))
    rays_o = jnp.asarray(o.astype(np.float32))
    rays_d = jnp.asarray(d.astype(np.float32))
    rays_d_z = rays_d / rays_d[:, 2:3]
    t = jnp.asarray(rng.uniform(0, 1, (n, 1)).astype(np.float32))
    near, far, _ = ray_sphere_intersection(rays_o, rays_d)
    z0 = _stratified_z(near, far, rspec.n_samples, None)
    rays9 = jnp.concatenate([rays_o, rays_d, near, far, t], axis=-1)

    cd = jnp.bfloat16
    z_plain = np.asarray(fused_upsample_z(
        spec, params, rays_o, rays_d_z, t, z0, rspec.n_importance,
        rspec.up_sample_steps, compute_dtype=cd))
    z2, sdf = fused_upsample_z(
        spec, params, rays_o, rays_d_z, t, z0, rspec.n_importance,
        rspec.up_sample_steps, compute_dtype=cd, return_sdf=True)
    z2, sdf = np.asarray(z2), np.asarray(sdf)

    bit_identical_z = bool(np.array_equal(z2, z_plain))

    # XLA reference SDF at the kernel's z, same sampling precision scope.
    s = z2.shape[1]
    pts = rays_o[:, None, :] + jnp.asarray(z2)[..., None] * rays_d_z[:, None]
    tt = jnp.broadcast_to(t[:, None, :], (n, s, 1))
    with sampling_precision_scope():
        sdf_ref = np.asarray(_sdf_sampling(
            spec, params, pts.reshape(-1, 3), tt.reshape(-1, 1))
        ).reshape(n, s)
    sdf_max_abs_diff = float(np.abs(sdf - sdf_ref).max())
    sdf_rms = float(np.sqrt(np.mean((sdf - sdf_ref) ** 2)))

    d_k, v_k = surface_from_samples(spec, params, rays9, jnp.asarray(z2),
                                    jnp.asarray(sdf))
    d_r, v_r = surface_from_samples(spec, params, rays9, jnp.asarray(z2),
                                    jnp.asarray(sdf_ref))
    d_k, v_k, d_r, v_r = (np.asarray(x) for x in (d_k, v_k, d_r, v_r))
    valid_match = float((v_k == v_r).mean())
    both = (v_k & v_r)[:, 0]
    depth_max_diff = float(np.abs(d_k - d_r)[both].max()) if both.any() \
        else 0.0

    ok = (bit_identical_z and sdf_max_abs_diff < 3e-2
          and valid_match > 0.995 and depth_max_diff < 1e-3)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "bit_identical_z": bit_identical_z,
        "sdf_max_abs_diff": sdf_max_abs_diff,
        "sdf_rms": sdf_rms,
        "n_valid": int(v_k.sum()),
        "valid_match_frac": valid_match,
        "depth_max_diff_valid": depth_max_diff,
        "ok": ok,
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
