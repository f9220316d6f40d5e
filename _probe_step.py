import time, numpy as np, jax, jax.numpy as jnp, optax
from __graft_entry__ import _synthetic_arrays
from endosurf_tpu.models.endosurf import RenderSpec
from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
from endosurf_tpu.train.schedules import warmup_cosine
from endosurf_tpu.train.trainer_endosurf import make_train_step
print("backend:", jax.default_backend(), flush=True)
scene = _synthetic_arrays(n_frames=8, h=512, w=640)
spec, rspec = EndoSurfSpec(), RenderSpec()
tx = optax.adam(warmup_cosine(5e-4, 5000, 100000, 0.05))
lw = {"color_loss_weight":1.0,"depth_loss_weight":1.0,"sdf_loss_weight":1.0,"angle_loss_weight":0.1,"eikonal_loss_weight":0.1,"surf_neig_loss_weight":0.1}
step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, 1024, lw, 0.1)
params = init_endosurf_params(jax.random.PRNGKey(0), spec)
opt_state = tx.init(params)
arrays = scene.device_arrays
key = jax.random.PRNGKey(1)
t0=time.perf_counter()
for i in range(12):
    key,k = jax.random.split(key)
    params, opt_state, m = step_fn(params, opt_state, arrays, k, jnp.asarray(float(i+1)))
    loss = float(np.asarray(m["loss_total"]))
    print(f"step {i}: {time.perf_counter()-t0:.2f}s cum, loss={loss:.4f}", flush=True)
