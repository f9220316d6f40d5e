"""Does activation_dtype=bf16 change the compiled step's bytes-accessed?

CPU-compiled cost analysis of the flagship train step (small batch).
Findings recorded (VALIDATION.md):
  * round-2 original knob (post-activation ``astype`` only): bytes were
    BIT-IDENTICAL to f32 — JAX promotes bf16 @ f32 back to f32 before the
    dot, so nothing narrow is ever stored;
  * end-to-end narrow interior (inputs+weights+activations bf16): CPU
    bytes go slightly UP because XLA:CPU computes in f32 and counts the
    convert buffers — the CPU backend is NOT a proxy for TPU traffic here.
    The decisive numbers are TPU cost analysis + timing
    (tools/profile_step.py --activation-dtype bfloat16).
"""
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

from endosurf_tpu.data.scene_data import make_synthetic_arrays
from endosurf_tpu.models.endosurf import RenderSpec
from endosurf_tpu.models.fields import (EndoSurfSpec, init_endosurf_params,
                                        set_deform_jac_mode)
from endosurf_tpu.ops.mlp import (set_activation_dtype, set_matmul_precision,
                                  set_sampling_precision)
from endosurf_tpu.train.schedules import warmup_cosine
from endosurf_tpu.train.trainer_endosurf import make_train_step

scene = make_synthetic_arrays(n_frames=2, h=64, w=64)
spec, rspec = EndoSurfSpec(), RenderSpec()
ray_batch = 512
tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
      "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
      "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
params = init_endosurf_params(jax.random.PRNGKey(0), spec)
opt_state = tx.init(params)
arrays = scene.device_arrays
key = jax.random.PRNGKey(1)

set_matmul_precision("default")
set_sampling_precision("default")

for act, jac in ((None, "jacfwd"), ("bfloat16", "jacfwd"),
                 (None, "linearize")):
    set_activation_dtype(act)
    set_deform_jac_mode(jac)
    step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, ray_batch,
                              lw, surf_neig_rad=0.1, remat=False)
    lowered = step_fn.lower(params, opt_state, arrays, key, jnp.asarray(5.0))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(json.dumps({
        "activation_dtype": act, "jac_mode": jac,
        "gflops": round(float(cost.get("flops", 0)) / 1e9, 3),
        "bytes_gb": round(float(cost.get("bytes accessed", 0)) / 1e9, 4),
    }), flush=True)
set_activation_dtype(None)
set_deform_jac_mode("jacfwd")
