"""EndoNeRF: D-NeRF density baseline (deform + density + color MLPs).

Functional re-design of /root/reference/src/renderer/endonerf.py. Shares the
trainer/dataset machinery with EndoSurf; differs in fields (density instead of
SDF, no weight norm, unscaled skip concat) and compositing
(alpha = 1 - exp(-sigma * delta), disparity-normalized depth).

Depth-guided sampling (endonerf.py:65-68): when enabled, ray slots 6/7 carry
(gt-depth mean, sigma) instead of (near, far) and z values are drawn from a
sorted per-ray normal distribution.

Note on the reference's uniform path: endonerf.py:71 discards the computed
z values (a latent bug — the expression result is never assigned), so the
non-depth-sampling branch only works by accident upstream. Here the intended
NeRF stratified sampling is implemented.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from endosurf_tpu.ops.encoding import freq_encode, freq_encode_dim
from endosurf_tpu.ops.mlp import (
    init_skip_mlp,
    sampling_precision_scope,
    skip_mlp_apply,
)
from endosurf_tpu.ops.neus import exclusive_cumprod_weights
from endosurf_tpu.ops.pdf import sample_pdf

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DNeRFSpec:
    use_deform: bool = True
    bound: float = 1.5
    raw_noise_std: float = 1.0
    pos_density_freqs: int = 10
    dir_color_freqs: int = 4
    time_deform_freqs: int = 10
    pos_deform_freqs: int = 10
    deform_layers: Tuple[int, int, Tuple[int, ...]] = (9, 256, (5,))
    density_layers: Tuple[int, int, Tuple[int, ...]] = (9, 256, (5,))
    color_layers: Tuple[int, int, Tuple[int, ...]] = (2, 128, ())
    geo_feat_dim: int = 256

    @staticmethod
    def from_config(net_cfg: Dict[str, Any]) -> "DNeRFSpec":
        def layers(sec):
            return (sec.get("n_layers", 9), sec.get("hidden_dim", 256),
                    tuple(sec.get("skips", [])))
        return DNeRFSpec(
            use_deform=net_cfg.get("use_deform", True),
            bound=net_cfg.get("bound", 1.5),
            raw_noise_std=net_cfg.get("raw_noise_std", 1.0),
            pos_density_freqs=net_cfg.get("enc_pos_density_cfg", {}).get(
                "multires", 10),
            dir_color_freqs=net_cfg.get("enc_dir_color_cfg", {}).get(
                "multires", 4),
            time_deform_freqs=net_cfg.get("enc_time_deform_cfg", {}).get(
                "multires", 10),
            pos_deform_freqs=net_cfg.get("enc_pos_deform_cfg", {}).get(
                "multires", 10),
            deform_layers=layers(net_cfg.get("net_deform_cfg", {})),
            density_layers=layers(net_cfg.get("net_density_cfg", {})),
            color_layers=layers(net_cfg.get("net_color_cfg", {})),
            geo_feat_dim=net_cfg.get("geo_feat_dim", 256),
        )


@dataclasses.dataclass(frozen=True)
class DNeRFRenderSpec:
    n_samples: int = 64
    n_importance: int = 64
    perturb: bool = True
    use_depth_sampling: bool = True
    depth_sampling_sigma: float = 1.0

    @staticmethod
    def from_config(render_cfg: Dict[str, Any]) -> "DNeRFRenderSpec":
        return DNeRFRenderSpec(
            n_samples=render_cfg.get("n_samples", 64),
            n_importance=render_cfg.get("n_importance", 64),
            perturb=render_cfg.get("perturb", True),
            use_depth_sampling=render_cfg.get("use_depth_sampling", True),
            depth_sampling_sigma=render_cfg.get("depth_sampling_sigma", 1.0),
        )


def init_dnerf_params(key: jax.Array, spec: DNeRFSpec) -> Params:
    """Initialize DNeRF params (plain torch-default Linears, endonerf.py:320-336)."""
    k_deform, k_density, k_color = jax.random.split(key, 3)
    params: Params = {}
    if spec.use_deform:
        n, h, s = spec.deform_layers
        in_dim = (freq_encode_dim(3, spec.pos_deform_freqs)
                  + freq_encode_dim(1, spec.time_deform_freqs))
        params["deform"] = init_skip_mlp(k_deform, n, h, in_dim, 3, s,
                                         style="nerf", weight_norm=False)
    n, h, s = spec.density_layers
    params["density"] = init_skip_mlp(
        k_density, n, h, freq_encode_dim(3, spec.pos_density_freqs),
        1 + spec.geo_feat_dim, s, style="nerf", weight_norm=False)
    n, h, s = spec.color_layers
    params["color"] = init_skip_mlp(
        k_color, n, h,
        freq_encode_dim(3, spec.dir_color_freqs) + spec.geo_feat_dim,
        3, s, style="nerf", weight_norm=False)
    return params


def _deform(spec: DNeRFSpec, params: Params, x, t):
    enc = jnp.concatenate([
        freq_encode(x, spec.pos_deform_freqs),
        freq_encode(t, spec.time_deform_freqs)], axis=-1)
    return skip_mlp_apply(params["deform"], enc, skips=spec.deform_layers[2],
                          activation="relu", skip_scale=1.0)


def _warp(spec: DNeRFSpec, params: Params, x, t):
    return x + _deform(spec, params, x, t) if spec.use_deform else x


def _density_feat(spec: DNeRFSpec, params: Params, x_c):
    enc = freq_encode(x_c, spec.pos_density_freqs)
    return skip_mlp_apply(params["density"], enc,
                          skips=spec.density_layers[2], activation="relu",
                          skip_scale=1.0)


def _color(spec: DNeRFSpec, params: Params, d, feat):
    enc = jnp.concatenate([freq_encode(d, spec.dir_color_freqs), feat],
                          axis=-1)
    h = skip_mlp_apply(params["color"], enc, skips=spec.color_layers[2],
                       activation="relu", skip_scale=1.0)
    return jax.nn.sigmoid(h)


def _field_raw(spec: DNeRFSpec, params: Params, x, d, t):
    """(x, d, t) -> (rgb [N,3] post-sigmoid, raw_sigma [N] pre-noise/relu).

    The gradient-path field chain. Large TPU batches route through the fused
    fwd+bwd megakernel (kernels/fused_train_dnerf.py — deform + density +
    color as three custom_vjp segments whose backwards recompute in VMEM);
    under a >1-device mesh the megakernel dispatches per shard via shard_map
    (pallas_call has no GSPMD rule). Everything else runs the jnp chain.
    """
    from endosurf_tpu.kernels import fused_train_dnerf as ftd
    n = x.shape[0]
    # Mesh first (same rationale as fields.fused_point_eval): under a mesh
    # the kernel path is only valid via shard_map.
    mk_mesh = ftd.dnerf_megakernel_mesh(n)
    if mk_mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from endosurf_tpu.models.fields import _sync_megakernel_precision
        _sync_megakernel_precision()

        def body(p, xx, dd, tt):
            return ftd.megakernel_field_raw(spec, p, xx, dd, tt,
                                            force_kernel=True)

        f = shard_map(body, mesh=mk_mesh,
                      in_specs=(P(), P("data"), P("data"), P("data")),
                      out_specs=(P("data"), P("data")), check_vma=False)
        return f(params, x, d, t)
    if ftd.dnerf_megakernel_serves(n):
        from endosurf_tpu.models.fields import _sync_megakernel_precision
        _sync_megakernel_precision()
        return ftd.megakernel_field_raw(spec, params, x, d, t)
    x_c = _warp(spec, params, x, t)
    h = _density_feat(spec, params, x_c)
    return _color(spec, params, d, h[..., 1:]), h[..., 0]


def field_eval(spec: DNeRFSpec, params: Params, x, d, t,
               noise_key: Optional[jax.Array] = None):
    """(x, d, t) -> (rgb [N,3], sigma [N]). Train-time Gaussian noise on the
    raw density pre-relu (endonerf.py:367-370) when noise_key is given."""
    rgb, raw_sigma = _field_raw(spec, params, x, d, t)
    if noise_key is not None and spec.raw_noise_std > 0:
        raw_sigma = raw_sigma + spec.raw_noise_std * jax.random.normal(
            noise_key, raw_sigma.shape, raw_sigma.dtype)
    sigma = jax.nn.relu(raw_sigma)
    return rgb, sigma


def _raw_sigma_sampling(spec: DNeRFSpec, params: Params, x, t):
    """RAW (pre-relu, pre-noise) density for *sampling-only* consumers.

    Large TPU batches ride the fused Pallas chain kernel
    (kernels/fused_sdf.py::fused_density_raw — deform + density in one
    VMEM-resident dispatch, sigma head only); everything else falls back
    to the jnp chain. Mirrors endosurf.py::_sdf_sampling.
    """
    from endosurf_tpu.kernels.fused_sdf import (fused_density_raw,
                                                fused_sdf_available)
    if fused_sdf_available(x.shape[0]):
        from endosurf_tpu.models.endosurf import _sampling_compute_dtype
        return fused_density_raw(spec, params, x, t,
                                 compute_dtype=_sampling_compute_dtype())
    x_c = _warp(spec, params, x, t)
    return _density_feat(spec, params, x_c)[..., :1]


def density_observed(spec: DNeRFSpec, params: Params, x, t):
    """Density query for isosurface extraction (endonerf.py:450-467).

    Raw head value (the reference thresholds raw density); big batches
    (demo grids) dispatch to the fused Pallas kernel on TPU.
    """
    return _raw_sigma_sampling(spec, params, x, t)


def density_grad_observed(spec: DNeRFSpec, params: Params, x, t):
    """d sigma / d x through the warp; negated by callers for normals
    (endonerf.py:417-422, 428-448)."""
    def point(xi, ti):
        def f(xx):
            return density_observed(spec, params, xx[None, :],
                                    ti[None, :])[0, 0]
        return jax.grad(f)(xi)
    return jax.vmap(point)(x, t)


def render_on_depth(spec: DNeRFSpec, params: Params, rays: jnp.ndarray,
                    depth: jnp.ndarray, valid: jnp.ndarray):
    """Surface rendering at given depths (endonerf.py:198-225), masked:
    color from the radiance field and normals from -grad density."""
    rays_o, rays_d = rays[..., 0:3], rays[..., 3:6]
    t = rays[..., 8:9]
    rays_d_z = rays_d / (rays_d[..., 2:3] + 1e-5)
    pts = rays_o + rays_d_z * depth
    rgb, _ = field_eval(spec, params, pts, rays_d, t)
    grad = -density_grad_observed(spec, params, pts, t)
    normal = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-10)
    valid_f = valid.astype(pts.dtype)
    return rgb * valid_f, normal * valid_f


def raw2outputs(rgb, sigma, z_vals, rays_d):
    """Density compositing with disparity-normalized depth
    (endonerf.py:168-196)."""
    dists = jnp.diff(z_vals, axis=-1)
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dists = dists * d_norm
    alpha = 1.0 - jnp.exp(-sigma * dists)
    weights = exclusive_cumprod_weights(alpha, eps=1e-10)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_raw = jnp.sum(weights * z_vals * d_norm, axis=-1)
    disp = 1.0 / jnp.maximum(
        1e-10, depth_raw / (jnp.sum(weights, axis=-1) + 1e-6))
    depth_map = (1.0 / (disp + 1e-6))[..., None]
    return rgb_map, depth_map, weights


def render_rays(spec: DNeRFSpec, rspec: DNeRFRenderSpec, params: Params,
                rays: jnp.ndarray, key: Optional[jax.Array] = None,
                want_normals: bool = False) -> Dict[str, jnp.ndarray]:
    """Render a DNeRF ray batch (endonerf.py:56-120).

    key=None disables both sampling perturbation and density noise (eval).
    """
    n_rays = rays.shape[0]
    rays_o, rays_d = rays[..., 0:3], rays[..., 3:6]
    near_or_mean, far_or_std = rays[..., 6:7], rays[..., 7:8]
    t = rays[..., 8:9]
    rays_d_z = rays_d / (rays_d[..., 2:3] + 1e-5)

    if key is not None:
        k_z, k_noise_c, k_noise_f = jax.random.split(key, 3)
    else:
        k_z = k_noise_c = k_noise_f = None

    if rspec.use_depth_sampling:
        mean = jnp.broadcast_to(near_or_mean, (n_rays, rspec.n_samples))
        std = jnp.broadcast_to(far_or_std, (n_rays, rspec.n_samples))
        # The reference draws gaussian z even at eval (endonerf.py:68);
        # with key=None a fixed key keeps eval deterministic.
        kz = k_z if k_z is not None else jax.random.PRNGKey(0)
        z = mean + std * jax.random.normal(kz, mean.shape, mean.dtype)
        z_vals = jnp.sort(z, axis=-1)
    else:
        t_vals = jnp.linspace(0.0, 1.0, rspec.n_samples, dtype=rays.dtype)
        z_vals = near_or_mean * (1.0 - t_vals) + far_or_std * t_vals
        if k_z is not None and rspec.perturb:
            mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
            lower = jnp.concatenate([z_vals[..., :1], mids], -1)
            u = jax.random.uniform(k_z, z_vals.shape, z_vals.dtype)
            z_vals = lower + (upper - lower) * u

    def eval_at(z, noise_key):
        pts = rays_o[:, None, :] + rays_d_z[:, None, :] * z[..., None]
        dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
        tt = jnp.broadcast_to(t[:, None, :], (n_rays, z.shape[1], 1))
        rgb, sigma = field_eval(
            spec, params, pts.reshape(-1, 3), dirs.reshape(-1, 3),
            tt.reshape(-1, 1), noise_key)
        return (rgb.reshape(n_rays, z.shape[1], 3),
                sigma.reshape(n_rays, z.shape[1]), pts, tt)

    if rspec.n_importance > 0:
        # Sampling-only coarse pass (endonerf.py:82-91 under no_grad): runs at
        # the sampling matmul precision — it only shapes the importance CDF.
        # Only sigma matters (the coarse rgb is discarded by raw2outputs'
        # unused outputs), so the query is sigma-only and rides the fused
        # density chain kernel on TPU (kernels/fused_sdf.py). Noise + relu
        # stay outside the query, exactly as field_eval applies them.
        with sampling_precision_scope():
            sg_params = jax.lax.stop_gradient(params)
            pts_c = (rays_o[:, None, :]
                     + rays_d_z[:, None, :] * z_vals[..., None])
            tt_c = jnp.broadcast_to(t[:, None, :],
                                    (n_rays, z_vals.shape[1], 1))
            raw_c = _raw_sigma_sampling(
                spec, sg_params,
                jax.lax.stop_gradient(pts_c).reshape(-1, 3),
                tt_c.reshape(-1, 1))[:, 0]
            if k_noise_c is not None and spec.raw_noise_std > 0:
                raw_c = raw_c + spec.raw_noise_std * jax.random.normal(
                    k_noise_c, raw_c.shape, raw_c.dtype)
            sigma_c = jax.nn.relu(
                jax.lax.stop_gradient(raw_c)).reshape(n_rays, -1)
        # det=perturb quirk reproduced from endonerf.py:93: perturbed
        # training uses the deterministic midpoint rule for importance z.
        det_draws = rspec.perturb or k_z is None
        from endosurf_tpu.kernels.fused_sampler import (
            fine_resample_shape_supported,
            fused_fine_resample,
            sampler_kernel_available,
            sampler_mesh,
        )
        shapes_ok = det_draws and fine_resample_shape_supported(
            z_vals.shape[1], rspec.n_importance)
        rs_mesh = sampler_mesh(n_rays) if shapes_ok else None
        if shapes_ok and (sampler_kernel_available(n_rays)
                          or rs_mesh is not None):
            # Whole resampling stage (coarse weights -> inverse-CDF draws
            # -> 128-lane merge sort) as ONE Pallas dispatch — the
            # "pdf_glue" piece of the step attribution.
            from endosurf_tpu.models.endosurf import _sampler_interpret
            d_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

            def _rs(z, s, dn):
                return fused_fine_resample(
                    z, s, dn, interpret=_sampler_interpret())

            if rs_mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P
                _rs = shard_map(_rs, mesh=rs_mesh,
                                in_specs=(P("data"),) * 3,
                                out_specs=P("data"), check_vma=False)
            z_vals = jax.lax.stop_gradient(_rs(z_vals, sigma_c, d_norm))
        else:
            _, _, weights_c = raw2outputs(
                jnp.zeros(sigma_c.shape + (3,), sigma_c.dtype), sigma_c,
                z_vals, rays_d)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(
                z_mid, weights_c[..., 1:-1], rspec.n_importance,
                key=None if det_draws else k_z)
            z_vals = jnp.sort(
                jnp.concatenate(
                    [z_vals, jax.lax.stop_gradient(z_samples)], -1),
                axis=-1)

    rgb, sigma, pts, tt = eval_at(z_vals, k_noise_f)
    rgb_map, depth_map, weights = raw2outputs(rgb, sigma, z_vals, rays_d)
    out = {"color_map": rgb_map, "depth_map": depth_map, "weights": weights}

    if want_normals:
        grad = density_grad_observed(
            spec, params, pts.reshape(-1, 3), tt.reshape(-1, 1))
        grad = -grad.reshape(n_rays, -1, 3)
        grad = grad / (jnp.linalg.norm(grad, axis=-1, keepdims=True) + 1e-10)
        out["normal_map"] = jnp.sum(weights[..., None] * grad, axis=1)
    return out


def render_rays_inference(spec: DNeRFSpec, rspec: DNeRFRenderSpec,
                          params: Params, rays: jnp.ndarray,
                          use_importance: bool = True
                          ) -> Dict[str, jnp.ndarray]:
    """Forward-only DNeRF render for the serving paths (eval/test/demo).

    Dispatches the whole pipeline — coarse sigma sweep, importance
    resampling, fine field eval, raw2outputs composite — to ONE Pallas
    kernel per ray block on TPU (kernels/fused_render_dnerf.py); falls back
    to the differentiable :func:`render_rays` (key=None) elsewhere.
    Mirrors models/endosurf.py::render_rays_inference (reference eval path
    endonerf.py:56-120 via trainer_endonerf.py:153-225).
    """
    from endosurf_tpu.kernels.fused_render_dnerf import (
        dnerf_render_kernel_available,
        dnerf_render_mesh,
        dnerf_render_shape_supported,
        fused_render_rays_dnerf,
    )
    n_rays = rays.shape[0]
    shapes_ok = (use_importance and rspec.n_importance > 0
                 and dnerf_render_shape_supported(spec, rspec))
    mesh = dnerf_render_mesh(n_rays) if shapes_ok else None
    if shapes_ok and (dnerf_render_kernel_available(n_rays)
                      or mesh is not None):
        from endosurf_tpu.models.endosurf import (_sampler_interpret,
                                                  _sampling_compute_dtype)
        from endosurf_tpu.ops.mlp import get_matmul_precision
        prec = get_matmul_precision()
        main_dtype = jnp.bfloat16 if prec == "default" else jnp.float32
        main_prec = None if prec == "default" else (
            "high" if prec == "high" else "highest")
        with sampling_precision_scope():
            samp_dtype = _sampling_compute_dtype()

        def _render(p, r):
            return fused_render_rays_dnerf(
                spec, rspec, p, r,
                sampling_dtype=samp_dtype, main_dtype=main_dtype,
                main_precision=main_prec,
                interpret=_sampler_interpret())

        if mesh is not None:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            keys = ("color_map", "depth_map", "acc_map")
            _render = shard_map(
                _render, mesh=mesh,
                in_specs=(P(), P("data")),
                out_specs={k: P("data") for k in keys}, check_vma=False)
        return _render(params, rays)
    if not use_importance:
        rspec = dataclasses.replace(rspec, n_importance=0)
    out = render_rays(spec, rspec, params, rays, key=None,
                      want_normals=False)
    # Uniform serving contract with the kernel path (weights [R,128] are a
    # train-step output; eval consumers never read them).
    return {"color_map": out["color_map"], "depth_map": out["depth_map"],
            "acc_map": jnp.sum(out["weights"], axis=-1, keepdims=True)}
