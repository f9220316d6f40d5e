#!/usr/bin/env python
"""One-process step-level A/B over the SAMPLER kernel block size
(fused_upsample_z + fused_ray_march BLOCK_R) on the EndoSurf train step.

The shipping BLOCK_R=256 for these kernels was chosen under the round-3
setter-staleness bug (ADVICE r3 high — every swept setting silently timed
block 256); the fused_train megakernel's post-fix sweep moved its blocks
256/128 -> 1024/512 for a 1.14x step win, so the sampler kernels (march
4.0 ms + upsample 2.9 ms of the ~23 ms step) are the remaining unswept
block surface.

With the staleness fix (block_r threaded as a jit-static through the
non-jit wrapper), a per-block retrace only needs set_block_r() BEFORE the
first trace of each step function — each jitted step then owns its traced
program permanently, so the interleaved-window A/B (round-3 rule: only
same-process step-level A/B decides on the tunneled TPU) is sound.

Prints one JSON line per block plus a cross-block loss-parity record
(block tiling must not change values: n=1024 rays pads identically for
all swept blocks).
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

# Override the swept blocks, e.g. ESN_AB_BLOCKS=256,512 (retry lane for
# blocks whose first attempt died on transient tunnel compile errors).
BLOCKS = tuple(int(b) for b in
               os.environ.get("ESN_AB_BLOCKS", "256,512,1024").split(","))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from endosurf_tpu.data.scene_data import make_synthetic_arrays
    from endosurf_tpu.kernels import fused_sampler
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

    scene = make_synthetic_arrays(n_frames=8, h=512, w=640)
    spec, rspec = EndoSurfSpec(), RenderSpec()
    ray_batch = 1024
    tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
    loss_weights = {
        "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
        "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
        "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
    }
    params0 = init_endosurf_params(jax.random.PRNGKey(0), spec)

    def fresh(tree):
        """Deep device copy: the step fns donate params/opt_state buffers,
        so every (re)use must start from new arrays."""
        return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)

    # Build + trace one step fn per block. set_block_r must precede the
    # FIRST call (trace time) of each fn; after that the trace is owned.
    steps, losses, failed = {}, {}, {}
    for blk in BLOCKS:
        fused_sampler.set_block_r(blk)
        step = make_train_step(
            spec, rspec, tx, scene.h, scene.w, ray_batch, loss_weights,
            surf_neig_rad=0.1, remat=False)
        params = fresh(params0)
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(1)
        ls = []
        try:
            for i in range(3):
                key, k = jax.random.split(key)
                params, opt_state, metrics = step(
                    params, opt_state, scene.device_arrays, k,
                    jnp.asarray(float(i + 1)))
                ls.append(round(float(np.asarray(metrics["loss_total"])), 4))
        except Exception as e:  # Mosaic lowering/VMEM failures stay data
            failed[blk] = repr(e)[:300]
            print(json.dumps({"block": blk, "failed": failed[blk]}),
                  flush=True)
            continue
        steps[blk] = step
        losses[blk] = ls
    ok_blocks = [b for b in BLOCKS if b in steps]
    base = losses[ok_blocks[0]]
    print(json.dumps({
        "losses": {str(b): losses[b] for b in ok_blocks},
        "parity_across_blocks": all(losses[b] == base for b in ok_blocks),
    }), flush=True)

    # Interleaved timed windows (A B C A B C ...) so tunnel-contention
    # drift hits every block equally.
    n_steps, n_windows = 50, 4
    rates = {b: [] for b in ok_blocks}
    state = {}
    for blk in ok_blocks:
        p = fresh(params0)
        state[blk] = (p, tx.init(p), jax.random.PRNGKey(2))
    for w in range(n_windows):
        for blk in ok_blocks:
            params, opt_state, key = state[blk]
            t0 = time.perf_counter()
            for i in range(n_steps):
                key, k = jax.random.split(key)
                params, opt_state, metrics = steps[blk](
                    params, opt_state, scene.device_arrays, k,
                    jnp.asarray(float(w * n_steps + i + 4)))
            float(np.asarray(metrics["loss_total"]))  # fence
            dt = time.perf_counter() - t0
            rates[blk].append(n_steps * ray_batch / dt)
            state[blk] = (params, opt_state, key)
    best, best_rate = None, -1.0
    for blk in ok_blocks:
        med = float(np.median(rates[blk]))
        if med > best_rate:
            best, best_rate = blk, med
        print(json.dumps({
            "block": blk,
            "rays_per_sec_median": round(med, 1),
            "ms_per_step": round(ray_batch / med * 1e3, 2),
            "windows": [round(r, 1) for r in rates[blk]],
        }), flush=True)
    med256 = float(np.median(rates[ok_blocks[0]]))
    print(json.dumps({
        "best_block": best,
        "speedup_best_over_256": round(best_rate / med256, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
