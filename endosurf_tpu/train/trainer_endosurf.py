"""EndoSurf trainer: one fused jit step for sampling, rendering, and losses.

Re-design of /root/reference/src/trainer/trainer_endosurf.py:27-203. The
reference's train step is a python orchestration of half a dozen separately-
launched network passes; here the entire iteration — batch sampling, ray
rendering with importance upsampling, the three auxiliary field queries, all
six losses, the gradient, and the Adam update — is a single donated-buffer
XLA program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from endosurf_tpu.data.scene_data import sample_train_batch
from endosurf_tpu.models.endosurf import (
    RenderSpec,
    depth_points,
    error_on_depth,
    error_on_depth_from,
    render_rays,
    surface_neighbour_error,
    surface_neighbour_error_from,
    surface_neighbour_points,
)
from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params
from endosurf_tpu.train.losses import endosurf_loss_terms
from endosurf_tpu.train.schedules import warmup_cosine
from endosurf_tpu.train.trainer import Trainer

LOSS_WEIGHT_KEYS = (
    "color_loss_weight", "depth_loss_weight", "sdf_loss_weight",
    "angle_loss_weight", "eikonal_loss_weight", "surf_neig_loss_weight",
)


def make_train_step(spec: EndoSurfSpec, rspec: RenderSpec,
                    tx: optax.GradientTransformation, h: int, w: int,
                    ray_batch: int, loss_weights: Dict[str, float],
                    surf_neig_rad: float, mask_guided: bool = True,
                    use_importance: bool = True, remat: bool = True,
                    mesh=None, steps_per_call: int = 1,
                    fold_aux: bool = False, presample: bool = True,
                    march_reuse: bool = True, march_reuse_secant: int = 0,
                    pixel_sampler: str = "cdf"):
    """Build the jitted training step.

    Terms with zero weight are compiled out entirely (the reference computes
    its expensive 128-step ray march even when the surface-neighbour weight is
    zeroed in the ablation configs).

    With ``mesh`` (a 1-D ("data",) jax.sharding.Mesh) the sampled ray batch is
    sharded across chips; the global masked-sum losses make XLA emit the psum
    gradient reduction automatically.

    With ``steps_per_call`` > 1 the returned function runs that many
    optimizer steps inside ONE device dispatch (lax.scan over the
    params/opt_state carry; per-step PRNG splits and step numbers advance
    inside the scan, so it is step-for-step identical to calling the K=1
    version K times). This is the dispatch-latency amortizer: per-step host
    work and device round-trips shrink by K — on a contended/tunneled TPU
    the wall-clock win is several-fold. The returned metrics are those of
    the window's LAST step, matching what a per-step loop would log at the
    same step when logging cadences divide steps_per_call.
    """

    need_depth_terms = (loss_weights["sdf_loss_weight"] != 0.0
                        or loss_weights["angle_loss_weight"] != 0.0
                        or loss_weights["depth_loss_weight"] != 0.0)
    need_surf = loss_weights["surf_neig_loss_weight"] != 0.0
    # March-reuse (round 5): localize the surface on the render's OWN
    # importance samples (surface_from_samples) instead of the fresh
    # 128-eval sphere trace — the march kernel evaluates as many field
    # points as the whole render forward just to place the neighbour pairs.
    # Needs the importance stage's (z, sdf) threaded out of render_rays, so
    # it is incompatible with fold_aux's surf folding (which must trace
    # BEFORE the render) — fold_aux wins if both are set (it ships off).
    march_reuse = (march_reuse and need_surf and use_importance
                   and rspec.n_importance > 0 and not fold_aux)

    def loss_fn(params, batch, step_f, key):
        """With ``fold_aux`` the auxiliary field queries — SDF+grad at the
        GT depth points (error_on_depth) and grads at the traced surface
        +- neighbour points — are APPENDED to render_core's sample points
        and ride the same fused evaluation (one megakernel dispatch, ~4.7%
        more points) instead of running as separate small XLA fwd+bwd
        programs. The math is equivalent (not bit-identical: the folded
        queries ride the megakernel's precision path). Default OFF: the
        round-4 one-process step A/B measured folding 1.8% SLOWER
        (44.6k vs 45.4k rays/s, results/r4/r4_ab_fold_aux.log) — the
        separate aux programs overlap with the step while folding grows
        the megakernel's critical path."""
        k_z, k_neig = jax.random.split(key)
        rays = batch["rays"]
        n_rays = rays.shape[0]
        rays_d, t = rays[..., 3:6], rays[..., 8:9]

        extra_groups = []
        if fold_aux and need_depth_terms:
            pts_d = depth_points(rays, batch["depth"])
            extra_groups.append((pts_d, rays_d, t))
        if fold_aux and need_surf:
            # Sphere trace first (stop-gradient Pallas kernel), then batch
            # the differentiable gradient queries.
            pts2, valid_surf = surface_neighbour_points(
                spec, params, rays, batch["mask"], k_neig, surf_neig_rad)
            extra_groups.append(
                (pts2, jnp.concatenate([rays_d, rays_d], axis=0),
                 jnp.concatenate([t, t], axis=0)))
        extra = {}
        if extra_groups:
            extra = {
                "extra_pts": jnp.concatenate(
                    [g[0] for g in extra_groups], axis=0),
                "extra_dirs": jnp.concatenate(
                    [g[1] for g in extra_groups], axis=0),
                "extra_t": jnp.concatenate(
                    [g[2] for g in extra_groups], axis=0),
            }

        out = render_rays(spec, rspec, params, rays, step_f,
                          key=k_z, use_importance=use_importance,
                          remat=remat, return_upsample=march_reuse, **extra)

        if fold_aux and need_depth_terms:
            sdf_err, angle_err, valid_region = error_on_depth_from(
                out["extra_sdf"][:n_rays], out["extra_grad"][:n_rays],
                extra_groups[0][0], rays, batch["mask"])
        elif need_depth_terms:
            sdf_err, angle_err, valid_region = error_on_depth(
                spec, params, rays, batch["depth"], batch["mask"])
        else:
            sdf_err = angle_err = jnp.asarray(0.0)
            valid_region = jnp.ones_like(batch["mask"])

        if fold_aux and need_surf:
            off = n_rays if need_depth_terms else 0
            surf_err = surface_neighbour_error_from(
                out["extra_grad"][off:off + 2 * n_rays], valid_surf)
        elif need_surf:
            surf_err = surface_neighbour_error(
                spec, params, rays, batch["mask"], k_neig, surf_neig_rad,
                samples=((out["up_z"], out["up_sdf"]) if march_reuse
                         else None),
                n_secant_reuse=march_reuse_secant)
        else:
            surf_err = jnp.asarray(0.0)

        total, metrics = endosurf_loss_terms(
            out, sdf_err, angle_err, valid_region, surf_err, batch,
            loss_weights)
        return total, metrics

    def compute_step(params, opt_state, batch, k_loss, step_f):
        if mesh is not None:
            from endosurf_tpu.parallel.mesh import shard_ray_batch
            batch = shard_ray_batch(batch, mesh)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, step_f, k_loss)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def one_step(params, opt_state, arrays, key, step_f):
        k_batch, k_loss = jax.random.split(key)
        batch = sample_train_batch(arrays, h, w, k_batch, ray_batch,
                                   mask_guided=mask_guided,
                                   pixel_sampler=pixel_sampler)
        return compute_step(params, opt_state, batch, k_loss, step_f)

    if steps_per_call == 1:
        return jax.jit(one_step, donate_argnums=(0, 1))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_window(params, opt_state, arrays, key, step_f):
        if presample:
            # Pre-sample the whole window's ray batches in ONE vmapped
            # gather phase before the scan. The mask-guided inverse-CDF
            # search is a chain of ~log2(H*W) dependent gather rounds that
            # is latency-bound at one batch's 1024 indices, so K batches
            # cost barely more than one. The key chain reproduces the
            # scan's splits exactly -> identical sampled batches; the step
            # outputs match to last-ulp program-reassociation noise
            # (tests/test_train_smoke.py::test_presample_window_parity).
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
                batch, k_l, i = x
                params, opt_state, metrics = compute_step(
                    params, opt_state, batch, k_l, step_f + i)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state),
                (batches, k_loss,
                 jnp.arange(steps_per_call, dtype=jnp.float32)))
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


class EndoSurfTrainer(Trainer):
    def setup(self) -> None:
        cfg = self.cfg
        self.spec = EndoSurfSpec.from_config(cfg["net"])
        self.rspec = RenderSpec.from_config(cfg["render"])

        # TPU execution knobs (no reference equivalent): field-MLP matmul
        # precision and backward-pass rematerialization.
        # Measured on TPU v5e (tools/bench_matrix.py, tools/
        # quality_precision.py, 8k-step multi-view runs in VALIDATION.md):
        # "default" (bf16 MXU) matches "high" (bf16x3) on PSNR/SSIM/geo-error
        # at realistic horizons within noise (depth RMSE +0.19 mm) at ~1.33x
        # the step rate, so bf16 ships as the default; "high" for
        # conservative runs, "highest" (exact f32) for strict parity runs.
        # Remat off: the flagship step fits HBM comfortably.
        from endosurf_tpu.ops.mlp import (set_activation_dtype,
                                          set_matmul_precision,
                                          set_sampling_precision)
        set_matmul_precision(
            self.train_cfg.get("matmul_precision", "default"))
        # Stop-gradient sampling paths (importance upsampling + sphere-traced
        # ray march) default to bf16: they only pick sample locations, and
        # bf16 there is quality-neutral (tools/quality_precision.py).
        set_sampling_precision(
            self.train_cfg.get("sampling_precision", "default"))
        # bf16 MLP-interior storage ships with the bf16 ("default") matmul
        # mode: +29% step rate (HBM-bound fwd+bwd, VALIDATION.md mode
        # matrix) at quality parity on the 2k-step orbit gate. Strict-parity
        # precisions keep the f32 interior unless explicitly overridden.
        precision = self.train_cfg.get("matmul_precision", "default")
        act_default = "bfloat16" if precision == "default" else None
        set_activation_dtype(
            self.train_cfg.get("activation_dtype", act_default))
        # The linearize deform-Jacobian formulation wins only in the bf16-
        # interior regime (loses 9% at f32 storage — VALIDATION.md); couple
        # the default to the storage mode. Exact same math either way.
        from endosurf_tpu.models.fields import set_deform_jac_mode
        jac_default = ("linearize"
                       if self.train_cfg.get("activation_dtype", act_default)
                       == "bfloat16" else "jacfwd")
        set_deform_jac_mode(self.train_cfg.get("jac_mode", jac_default))
        self.remat = bool(self.train_cfg.get("remat", False))
        # Megakernel: Pallas fwd+bwd segment kernels for the fused point
        # evaluation (kernels/fused_train.py). "auto" engages on TPU at the
        # flagship batch sizes and is a no-op elsewhere; precision follows
        # matmul_precision (bf16 compute under "default"). The jac_mode /
        # activation_dtype knobs above only govern the non-kernel path.
        from endosurf_tpu.models.fields import set_megakernel_mode
        set_megakernel_mode(self.train_cfg.get("megakernel", "auto"))
        # Sampler megakernels: whole-loop Pallas upsampling + ray march
        # (kernels/fused_sampler.py). Same mode contract as the megakernel;
        # "auto" engages on TPU at >=256-ray batches.
        from endosurf_tpu.kernels.fused_sampler import (
            set_march_kernel_mode, set_sampler_kernel_mode)
        set_sampler_kernel_mode(self.train_cfg.get("sampler_kernel", "auto"))
        set_march_kernel_mode(self.train_cfg.get("march_kernel", "auto"))
        # Inference megakernel: the whole forward render pipeline as one
        # Pallas dispatch per ray block (kernels/fused_render.py) — serves
        # the eval/test/demo render paths only (render_rays_inference).
        from endosurf_tpu.kernels.fused_render import set_render_kernel_mode
        set_render_kernel_mode(self.train_cfg.get("render_kernel", "auto"))

        seed = cfg.get("exp", {}).get("seed", 0)
        self.key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(self.key)
        self.params = init_endosurf_params(k_init, self.spec)

        optim_cfg = self.train_cfg["optim"]
        schedule = warmup_cosine(
            optim_cfg["lr"], optim_cfg.get("warm_up_end", 5000),
            self.n_iter, optim_cfg.get("lr_alpha", 0.05))
        # torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8) == optax.adam.
        self.lr_schedule = schedule
        # optim.deform_lr_mult scales the deform net's LR relative to the
        # shared schedule (capacity experiments; reference uses one LR for
        # all four subnets, trainer_endosurf.py:60-74 — 1.0 is parity).
        deform_mult = float(optim_cfg.get("deform_lr_mult", 1.0))
        if deform_mult != 1.0:
            self.tx = optax.multi_transform(
                {"deform": optax.adam(lambda c: schedule(c) * deform_mult),
                 "rest": optax.adam(schedule)},
                {k: ("deform" if k == "deform_network" else "rest")
                 for k in self.params})
        else:
            self.tx = optax.adam(schedule)
        self.opt_state = self.tx.init(self.params)

        self.loss_weights = {k: float(self.train_cfg.get(k, 0.0))
                             for k in LOSS_WEIGHT_KEYS}
        self.mesh = None
        par_cfg = cfg.get("parallel", {})
        # Multi-process runs ALWAYS build the global mesh: without it each
        # process would train a full replica independently (duplicated
        # work, divergent state). Single-process stays opt-in.
        if par_cfg.get("data_parallel", False) or jax.process_count() > 1:
            from endosurf_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(par_cfg.get("n_devices"))
        self._step_fns: Dict[Any, Any] = {}

    def _get_step_fn(self, use_importance: bool, steps_per_call: int = 1):
        cache_key = (use_importance, steps_per_call)
        if cache_key not in self._step_fns:
            self._step_fns[cache_key] = make_train_step(
                self.spec, self.rspec, self.tx, self.scene.h, self.scene.w,
                self.train_cfg.get("ray_batch", 1024), self.loss_weights,
                self.train_cfg.get("surf_neig_rad", 0.1),
                mask_guided=self.train_cfg.get("mask_guided_ray_sampling",
                                               True),
                use_importance=use_importance, remat=self.remat,
                mesh=self.mesh, steps_per_call=steps_per_call,
                fold_aux=self.train_cfg.get("fold_aux_queries", False),
                presample=self.train_cfg.get("presample_batches", True),
                march_reuse=self.train_cfg.get("surf_march_reuse", True),
                march_reuse_secant=self.train_cfg.get(
                    "surf_march_reuse_secant", 0),
                pixel_sampler=self.train_cfg.get("pixel_sampler", "cdf"))
        return self._step_fns[cache_key]

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
        use_importance = (self.rspec.n_importance > 0
                          and step >= self.rspec.important_begin_iter)
        fn = self._get_step_fn(use_importance, kk)
        self.key, k = jax.random.split(self.key)
        self.params, self.opt_state, metrics = fn(
            self.params, self.opt_state, self.scene.device_arrays, k,
            jnp.asarray(float(step)))
        return metrics  # device arrays; the loop materializes at log points

    def window_boundaries(self):
        # The compiled step changes shape when importance sampling begins.
        return (self.rspec.important_begin_iter,)

    def eval(self, step: int) -> Dict[str, float]:
        from endosurf_tpu.evaluation.render_eval import eval_frames
        list_test = self.scene.list_test[:1]  # reference eval: first frame
        eval_cfg = self.train_cfg.get("eval", {})
        stats = eval_frames(
            self, list_test, step,
            ray_chunk=eval_cfg.get("ray_chunk", 2048),
            save_dir_name="eval",
            chunks_per_call=eval_cfg.get("chunks_per_call", 0))
        if self.writer is not None:
            self.writer.add_scalars("eval", stats, step)
        return stats

    # -- offline inference helpers (used by eval/demo modules) --------------
    def render_fn(self, use_importance: bool = True):
        """Jitted chunked render closure for full-frame evaluation.

        With data_parallel on, eval ray chunks are sharded over the mesh
        like training batches — full-frame rendering scales with chips.
        Under multi-process meshes the outputs are gathered back to
        replicated so host-side frame assembly works on every process."""
        from endosurf_tpu.parallel.mesh import constrain_axis0, \
            replicate_outputs
        mesh = self.mesh

        from endosurf_tpu.models.endosurf import render_rays_inference

        @functools.partial(jax.jit, static_argnames=())
        def fn(params, rays, step_f):
            rays = constrain_axis0(rays, mesh)
            out = render_rays_inference(
                self.spec, self.rspec, params, rays, step_f,
                use_importance=use_importance)
            return replicate_outputs(out, mesh)
        return fn

    def demo_field_fn(self):
        """Scalar field for isosurface extraction: observed-space SDF
        (reference extract_observation_geometry, endosurf.py:490-500).
        Grid chunks are large, so on TPU this rides the fused Pallas kernel
        and, with data_parallel on, fans out over the mesh."""
        from endosurf_tpu.models.endosurf import _sdf_sampling
        from endosurf_tpu.parallel.mesh import constrain_axis0
        spec, params, mesh = self.spec, self.params, self.mesh

        def fn(pts, t):
            return _sdf_sampling(spec, params, constrain_axis0(pts, mesh),
                                 constrain_axis0(t, mesh))
        return fn

    def demo_field_threshold(self, thresh: float) -> float:
        return float(thresh)  # SDF: inside where sdf < thresh

    def render_points_fn(self):
        """Surface-point coloring (reference renderonpts, endosurf.py:502-521)."""
        from endosurf_tpu.models.fields import fused_point_eval
        from endosurf_tpu.parallel.mesh import constrain_axis0
        spec, mesh = self.spec, self.mesh

        @jax.jit
        def fn(params, pts, dirs, t):
            pts, dirs, t = (constrain_axis0(pts, mesh),
                            constrain_axis0(dirs, mesh),
                            constrain_axis0(t, mesh))
            return fused_point_eval(spec, params, pts, dirs, t)["color"]

        params = self.params
        return lambda pts, dirs, t: fn(params, jnp.asarray(pts),
                                       jnp.asarray(dirs), jnp.asarray(t))

    def demo(self, step: int, test_mode: bool = False, visualize: bool = True,
             demo_2d: bool = True, demo_3d: bool = True):
        from endosurf_tpu.evaluation.demo import run_demo
        return run_demo(self, step, test_mode, visualize, demo_2d, demo_3d)
