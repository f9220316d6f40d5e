"""EndoNeRF trainer (D-NeRF density baseline).

Re-design of /root/reference/src/trainer/trainer_endonerf.py:26-225: single
Adam optimizer with exponential LR decay, masked MSE color + Huber depth
losses, depth-guided sampling writing (gt-depth, sigma) into ray slots 6/7.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from endosurf_tpu.data.scene_data import sample_train_batch
from endosurf_tpu.models.endonerf import (
    DNeRFRenderSpec,
    DNeRFSpec,
    init_dnerf_params,
    render_rays,
)
from endosurf_tpu.train.losses import endonerf_loss_terms
from endosurf_tpu.train.schedules import exponential
from endosurf_tpu.train.trainer import Trainer


def make_train_step(spec: DNeRFSpec, rspec: DNeRFRenderSpec,
                    tx: optax.GradientTransformation, h: int, w: int,
                    ray_batch: int, loss_weights: Dict[str, float],
                    mask_guided: bool = True, mesh=None,
                    steps_per_call: int = 1, presample: bool = False,
                    pixel_sampler: str = "cdf"):
    def loss_fn(params, batch, key):
        rays = batch["rays"]
        if rspec.use_depth_sampling:
            # Overwrite near/far slots with (gt depth, sigma)
            # (trainer_endonerf.py:114-116).
            rays = jnp.concatenate([
                rays[..., :6], batch["depth"],
                jnp.full_like(rays[..., 7:8], rspec.depth_sampling_sigma),
                rays[..., 8:9]], axis=-1)
        out = render_rays(spec, rspec, params, rays, key=key)
        return endonerf_loss_terms(out, batch, loss_weights)

    def compute_step(params, opt_state, batch, k_loss):
        if mesh is not None:
            from endosurf_tpu.parallel.mesh import shard_ray_batch
            batch = shard_ray_batch(batch, mesh)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, k_loss)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    def one_step(params, opt_state, arrays, key, step_f):
        del step_f  # the DNeRF objective has no step-dependent annealing
        k_batch, k_loss = jax.random.split(key)
        batch = sample_train_batch(arrays, h, w, k_batch, ray_batch,
                                   mask_guided=mask_guided,
                                   pixel_sampler=pixel_sampler)
        return compute_step(params, opt_state, batch, k_loss)

    if steps_per_call == 1:
        return jax.jit(one_step, donate_argnums=(0, 1))

    # K steps per dispatch (see trainer_endosurf.make_train_step docstring;
    # presample hoists the window's batch gathers as there, sampling
    # identical rays). Default OFF here: the round-4 one-process A/B
    # measured the hoisted gather phase a 4% step regression on EndoNeRF
    # (results/r4/r4_ab_presample.log) — its cheap first-order step does
    # not hide the extra HBM traffic the way EndoSurf's does.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_window(params, opt_state, arrays, key, step_f):
        if presample:
            def key_chain(key, _):
                key, k = jax.random.split(key)
                return key, k
            _, ks = jax.lax.scan(key_chain, key, None,
                                 length=steps_per_call)
            k_batch = jax.vmap(lambda k: jax.random.split(k)[0])(ks)
            k_loss = jax.vmap(lambda k: jax.random.split(k)[1])(ks)
            batches = jax.vmap(
                lambda k: sample_train_batch(arrays, h, w, k, ray_batch,
                                             mask_guided=mask_guided,
                                             pixel_sampler=pixel_sampler))(
                k_batch)

            def body(carry, x):
                params, opt_state = carry
                batch, k_l = x
                params, opt_state, metrics = compute_step(
                    params, opt_state, batch, k_l)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state), (batches, k_loss))
        else:
            def body(carry, i):
                params, opt_state, key = carry
                key, k = jax.random.split(key)
                params, opt_state, metrics = one_step(
                    params, opt_state, arrays, k, step_f + i)
                return (params, opt_state, key), metrics

            (params, opt_state, _), metrics = jax.lax.scan(
                body, (params, opt_state, key),
                jnp.arange(steps_per_call, dtype=jnp.float32))
        last = jax.tree_util.tree_map(lambda x: x[-1], metrics)
        return params, opt_state, last

    return train_window


class EndoNeRFTrainer(Trainer):
    def setup(self) -> None:
        cfg = self.cfg
        self.spec = DNeRFSpec.from_config(cfg["net"])
        self.rspec = DNeRFRenderSpec.from_config(cfg["render"])

        # Same TPU execution knobs as the EndoSurf trainer: bf16 ("default")
        # main passes, bf16 for the stop-gradient coarse importance pass
        # (quality evidence in VALIDATION.md).
        from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                          set_matmul_precision,
                                          set_sampling_precision)
        set_matmul_precision(
            self.train_cfg.get("matmul_precision", "default"))
        set_sampling_precision(
            self.train_cfg.get("sampling_precision", "default"))
        # bf16 MLP interior ships with the bf16 matmul mode (see the
        # EndoSurf trainer note + VALIDATION.md mode matrix).
        precision = self.train_cfg.get("matmul_precision", "default")
        set_activation_dtype(self.train_cfg.get(
            "activation_dtype",
            "bfloat16" if precision == "default" else None))
        # Kernel knobs (same mode contract as the EndoSurf trainer):
        # the fused fwd+bwd field megakernel (kernels/fused_train_dnerf.py)
        # and the fine-resample sampler kernel (kernels/fused_sampler.py).
        from endosurf_tpu.kernels.fused_sampler import set_sampler_kernel_mode
        from endosurf_tpu.kernels.fused_train_dnerf import \
            set_dnerf_megakernel_mode
        set_dnerf_megakernel_mode(self.train_cfg.get("megakernel", "auto"))
        set_sampler_kernel_mode(self.train_cfg.get("sampler_kernel", "auto"))
        # Whole-pipeline inference megakernel for eval/test/demo renders
        # (kernels/fused_render_dnerf.py; same knob name as EndoSurf).
        from endosurf_tpu.kernels.fused_render_dnerf import \
            set_dnerf_render_kernel_mode
        set_dnerf_render_kernel_mode(
            self.train_cfg.get("render_kernel", "auto"))

        seed = cfg.get("exp", {}).get("seed", 0)
        self.key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = init_dnerf_params(k_init, self.spec)

        optim_cfg = self.train_cfg["optim"]
        schedule = exponential(optim_cfg["lr"], optim_cfg.get("lr_decay", 250))
        self.lr_schedule = schedule
        self.tx = optax.adam(schedule)
        self.opt_state = self.tx.init(self.params)

        self.loss_weights = {
            "color_loss_weight": float(
                self.train_cfg.get("color_loss_weight", 1.0)),
            "depth_loss_weight": float(
                self.train_cfg.get("depth_loss_weight", 1.0)),
        }
        self.mesh = None
        par_cfg = cfg.get("parallel", {})
        # Multi-process runs ALWAYS build the global mesh (see the EndoSurf
        # trainer note); single-process stays opt-in.
        if par_cfg.get("data_parallel", False) or jax.process_count() > 1:
            from endosurf_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(par_cfg.get("n_devices"))
        self._step_fns: Dict[int, Any] = {}

    def _get_step_fn(self, steps_per_call: int = 1):
        if steps_per_call not in self._step_fns:
            self._step_fns[steps_per_call] = make_train_step(
                self.spec, self.rspec, self.tx, self.scene.h, self.scene.w,
                self.train_cfg.get("ray_batch", 2048), self.loss_weights,
                mask_guided=self.train_cfg.get("mask_guided_ray_sampling",
                                               True),
                mesh=self.mesh, steps_per_call=steps_per_call,
                presample=self.train_cfg.get("presample_batches", False),
                pixel_sampler=self.train_cfg.get("pixel_sampler", "cdf"))
        return self._step_fns[steps_per_call]

    def opt_state_template(self):
        return self.opt_state

    def restore(self, restored: Dict[str, Any]) -> None:
        self.step_start = int(restored["n_iter"]) + 1
        self.params = jax.tree_util.tree_map(jnp.asarray, restored["params"])
        self.opt_state = restored["opt_state"]

    def checkpoint_state(self):
        return self.params, self.opt_state

    def train_step(self, step: int) -> Dict[str, float]:
        return self.train_step_window(step, 1)

    def train_step_window(self, step: int, kk: int) -> Dict[str, float]:
        """kk optimizer steps in one device dispatch (train.steps_per_call)."""
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, metrics = self._get_step_fn(kk)(
            self.params, self.opt_state, self.scene.device_arrays, k,
            jnp.asarray(float(step)))
        return metrics  # device arrays; the loop materializes at log points

    def eval(self, step: int) -> Dict[str, float]:
        from endosurf_tpu.evaluation.render_eval import eval_frames
        # The reference EndoNeRF eval renders ALL test frames
        # (trainer_endonerf.py:157).
        eval_cfg = self.train_cfg.get("eval", {})
        stats = eval_frames(
            self, self.scene.list_test, step,
            ray_chunk=eval_cfg.get("ray_batch", 2048),
            save_dir_name="eval",
            chunks_per_call=eval_cfg.get("chunks_per_call", 0))
        if self.writer is not None:
            self.writer.add_scalars("eval", stats, step)
        return stats

    def eval_ray_transform(self, rays: np.ndarray, fid: int) -> np.ndarray:
        """Write (gt depth, sigma) into ray slots 6/7 for eval rendering
        (reference trainer_endonerf.py:163-165)."""
        if not self.rspec.use_depth_sampling:
            return rays
        depth = np.asarray(
            self.scene.device_arrays["depths"][fid]).reshape(-1, 1)
        rays = rays.copy()
        rays[:, 6:7] = depth
        rays[:, 7] = self.rspec.depth_sampling_sigma
        return rays

    # The reference derives display normals from the rendered depth map at
    # eval/demo time (gen_normal_from_depth, trainer_endonerf.py:188,289)
    # rather than from the much costlier density gradients.
    normals_from_depth = True

    def render_fn(self, use_importance: bool = True):
        """Jitted chunk renderer for eval/test/demo (render_full_frames
        contract). ``use_importance`` is honored (False drops the
        importance stage, mirroring the EndoSurf trainer's hook); ``step_f``
        stays in the signature for the shared contract but is genuinely
        unused — DNeRF has no annealing (reference endonerf.py:56-120)."""
        from endosurf_tpu.models.endonerf import render_rays_inference
        from endosurf_tpu.parallel.mesh import constrain_axis0, \
            replicate_outputs
        spec, rspec, mesh = self.spec, self.rspec, self.mesh

        @jax.jit
        def fn(params, rays, step_f):
            del step_f
            out = render_rays_inference(spec, rspec, params,
                                        constrain_axis0(rays, mesh),
                                        use_importance=use_importance)
            return replicate_outputs(out, mesh)
        return fn

    def demo_field_fn(self):
        """Negated density field so 'inside = value < iso' holds for the
        marching-tetrahedra convention (reference extracts density > thresh,
        endonerf.py:227-238)."""
        from endosurf_tpu.models.endonerf import density_observed
        from endosurf_tpu.parallel.mesh import constrain_axis0
        spec, params, mesh = self.spec, self.params, self.mesh

        def fn(pts, t):
            return -density_observed(spec, params, constrain_axis0(pts, mesh),
                                     constrain_axis0(t, mesh))
        return fn

    def demo_field_threshold(self, thresh: float) -> float:
        return -float(thresh)

    def render_points_fn(self):
        """Surface-point coloring (reference renderonpts, endonerf.py:240-258)."""
        from endosurf_tpu.models.endonerf import field_eval
        from endosurf_tpu.parallel.mesh import constrain_axis0
        spec, mesh = self.spec, self.mesh

        @jax.jit
        def fn(params, pts, dirs, t):
            pts, dirs, t = (constrain_axis0(pts, mesh),
                            constrain_axis0(dirs, mesh),
                            constrain_axis0(t, mesh))
            rgb, _ = field_eval(spec, params, pts, dirs, t)
            return rgb

        params = self.params
        return lambda pts, dirs, t: fn(params, jnp.asarray(pts),
                                       jnp.asarray(dirs), jnp.asarray(t))

    def demo(self, step: int, test_mode: bool = False, visualize: bool = True,
             demo_2d: bool = True, demo_3d: bool = True):
        from endosurf_tpu.evaluation.demo import run_demo
        return run_demo(self, step, test_mode, visualize, demo_2d, demo_3d)
