"""EndoSurf neural fields: deformation, SDF, color, deviation.

Functional re-design of the reference's network container
(/root/reference/src/renderer/endosurf.py:524-852). The headline change is
:func:`fused_point_eval`: the reference evaluates its deform+SDF stack up to
three separate times per sample (forward pass with two internal autograd
graphs at endosurf.py:660-689, plus a second full observed-space gradient pass
at endosurf.py:165-166). Here one evaluation produces sdf, color, and both
gradients using the chain rule:

    x_c      = x + deform(x, t)
    J @ d, J^T @ grad_c                     (forward-mode Jacobian products:
                                             jacfwd, or linearize +
                                             linear_transpose — see
                                             _DEFORM_JAC_MODE)
    grad_c   = d sdf / d x_c                (one jax.vjp cotangent pass)
    grad_o   = J^T @ grad_c                 (chain rule — free)
    d_c      = J @ d / ||J @ d||            (canonical view direction)
    color    = color_net(x_c, grad_c, d_c, feat)

Everything is per-point and vmapped, so XLA sees clean [N, width] matmul
chains for the MXU. All functions are differentiable (the losses take second
derivatives through grad_o for Eikonal/angle terms).

Network hyperparameters mirror the reference YAML schema (configs/endosurf/
baseline/base_pull.yml net section) so configs carry over unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from endosurf_tpu.ops.encoding import freq_encode, freq_encode_dim
from endosurf_tpu.ops.mlp import init_skip_mlp, skip_mlp_apply

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    n_layers: int
    hidden_dim: int
    skips: Tuple[int, ...]
    out_dim: int


@dataclasses.dataclass(frozen=True)
class EndoSurfSpec:
    """Static network configuration (hashable: safe as a jit static arg)."""
    use_deform: bool = True
    bound: float = 1.0
    # frequency-encoding octaves
    deform_pos_freqs: int = 6
    deform_time_freqs: int = 6
    sdf_pos_freqs: int = 6
    color_pos_freqs: int = 10
    color_dir_freqs: int = 4
    deform: MLPSpec = MLPSpec(9, 256, (4,), 3)
    sdf: MLPSpec = MLPSpec(9, 256, (4,), 257)
    color: MLPSpec = MLPSpec(9, 256, (4,), 3)
    color_feat_dim: int = 256
    geometric_init: bool = True
    geometric_init_bias: float = 0.8
    deviation_init: float = 0.3

    @staticmethod
    def from_config(net_cfg: Dict[str, Any]) -> "EndoSurfSpec":
        """Build from the reference YAML ``net`` section."""
        def mlp_spec(section: Dict[str, Any]) -> MLPSpec:
            return MLPSpec(
                n_layers=section.get("n_layers", 9),
                hidden_dim=section.get("hidden_dim", 256),
                skips=tuple(section.get("skips", [4])),
                out_dim=section.get("out_dim", 3),
            )

        d = net_cfg.get("deform_network", {})
        s = net_cfg.get("sdf_network", {})
        c = net_cfg.get("color_network", {})
        return EndoSurfSpec(
            use_deform=net_cfg.get("use_deform", True),
            bound=net_cfg.get("bound", 1.0),
            deform_pos_freqs=d.get("enc_pos_cfg", {}).get("multires", 6),
            deform_time_freqs=d.get("enc_time_cfg", {}).get("multires", 6),
            sdf_pos_freqs=s.get("enc_pos_cfg", {}).get("multires", 6),
            color_pos_freqs=c.get("enc_pos_cfg", {}).get("multires", 10),
            color_dir_freqs=c.get("enc_dir_cfg", {}).get("multires", 4),
            deform=mlp_spec(d),
            sdf=dataclasses.replace(mlp_spec(s), out_dim=s.get("out_dim", 257)),
            color=mlp_spec(c),
            color_feat_dim=c.get("feat_dim", 256),
            geometric_init=s.get("geometric_init", True),
            geometric_init_bias=s.get("geometric_init_bias", 0.8),
            deviation_init=net_cfg.get("deviation_network", {}).get("init_val", 0.3),
        )


def init_endosurf_params(key: jax.Array, spec: EndoSurfSpec) -> Params:
    """Initialize all field parameters.

    Checkpoint keys mirror the reference state-dict layout
    (endosurf.py:559-568) so converted checkpoints map 1:1.
    """
    k_deform, k_sdf, k_color = jax.random.split(key, 3)
    params: Params = {}
    if spec.use_deform:
        in_dim = (freq_encode_dim(3, spec.deform_pos_freqs)
                  + freq_encode_dim(1, spec.deform_time_freqs))
        params["deform_network"] = init_skip_mlp(
            k_deform, spec.deform.n_layers, spec.deform.hidden_dim, in_dim,
            spec.deform.out_dim, spec.deform.skips, style="idr")
    params["sdf_network"] = init_skip_mlp(
        k_sdf, spec.sdf.n_layers, spec.sdf.hidden_dim,
        freq_encode_dim(3, spec.sdf_pos_freqs), spec.sdf.out_dim,
        spec.sdf.skips, style="nerf", geometric_init=spec.geometric_init,
        geometric_init_bias=spec.geometric_init_bias)
    color_in = (freq_encode_dim(3, spec.color_pos_freqs) + 3
                + freq_encode_dim(3, spec.color_dir_freqs)
                + spec.color_feat_dim)
    params["color_network"] = init_skip_mlp(
        k_color, spec.color.n_layers, spec.color.hidden_dim, color_in,
        spec.color.out_dim, spec.color.skips, style="nerf")
    params["deviation_network"] = {
        "variance": jnp.asarray(spec.deviation_init, jnp.float32)}
    return params


# ---------------------------------------------------------------------------
# sub-network applications (batched: [N, ...] in, [N, ...] out)
# ---------------------------------------------------------------------------

def deform_apply(spec: EndoSurfSpec, params: Params,
                 x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(x, t) -> canonical-space offset. x: [N,3], t: [N,1] -> [N,3]."""
    enc = jnp.concatenate([
        freq_encode(x, spec.deform_pos_freqs),
        freq_encode(t, spec.deform_time_freqs),
    ], axis=-1)
    return skip_mlp_apply(params["deform_network"], enc,
                          skips=spec.deform.skips, activation="relu")


def warp_to_canonical(spec: EndoSurfSpec, params: Params,
                      x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    if spec.use_deform:
        return x + deform_apply(spec, params, x, t)
    return x


def sdf_feat_apply(spec: EndoSurfSpec, params: Params,
                   x_c: jnp.ndarray) -> jnp.ndarray:
    """Canonical point -> [N, 1 + feat_dim] (sdf, geometric feature)."""
    enc = freq_encode(x_c, spec.sdf_pos_freqs)
    return skip_mlp_apply(params["sdf_network"], enc,
                          skips=spec.sdf.skips, activation="softplus100")


def sdf_observed(spec: EndoSurfSpec, params: Params,
                 x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Observed point -> sdf [N, 1] (reference endosurf.py:570-579)."""
    x_c = warp_to_canonical(spec, params, x, t)
    return sdf_feat_apply(spec, params, x_c)[..., :1]


def color_apply(spec: EndoSurfSpec, params: Params, x_c: jnp.ndarray,
                normal_c: jnp.ndarray, dir_c: jnp.ndarray,
                feat: jnp.ndarray) -> jnp.ndarray:
    """Canonical (point, normal, dir, feature) -> rgb in [0,1]."""
    enc = jnp.concatenate([
        freq_encode(x_c, spec.color_pos_freqs),
        normal_c,
        freq_encode(dir_c, spec.color_dir_freqs),
        feat,
    ], axis=-1)
    h = skip_mlp_apply(params["color_network"], enc,
                       skips=spec.color.skips, activation="relu")
    return jax.nn.sigmoid(h)


def inv_s(params: Params) -> jnp.ndarray:
    """NeuS sharpness: exp(10 * variance), clipped (endosurf.py:845-852,168)."""
    return jnp.clip(jnp.exp(params["deviation_network"]["variance"] * 10.0),
                    1e-6, 1e6)


# ---------------------------------------------------------------------------
# fused per-point evaluation
# ---------------------------------------------------------------------------

# How the deform Jacobian's two products (J @ d, J^T @ grad_c) are formed:
#   "jacfwd"    — materialize J via 3 basis tangents (primal + 3 tangent
#                 MLP passes), then two 3x3 matvecs;
#   "linearize" — jax.linearize (primal + 1 tangent pass for J @ d) and
#                 jax.linear_transpose of the tangent map (1 transpose
#                 pass for J^T @ grad_c) — one fewer full deform pass.
# Both are exact; which compiles cheaper under the outer double-backprop
# is an empirical question (tools/check_act_bytes.py / profile_step.py).
_DEFORM_JAC_MODE = "jacfwd"


def set_deform_jac_mode(mode: str) -> None:
    global _DEFORM_JAC_MODE
    assert mode in ("jacfwd", "linearize")
    _DEFORM_JAC_MODE = mode


# Megakernel dispatch for the fused evaluation: the Pallas fwd+bwd segment
# kernels (kernels/fused_train.py) replace XLA autodiff of the vmapped path
# on TPU at large point counts — same outputs/cotangents, activations kept
# in VMEM instead of round-tripping HBM. "auto" defers to the kernel gate
# (backend + batch size); "on" forces it (tests; interpret mode on CPU);
# "off" always uses the vmapped autodiff path.
_MEGAKERNEL_MODE = "auto"


def set_megakernel_mode(mode: str) -> None:
    global _MEGAKERNEL_MODE
    assert mode in ("auto", "on", "off")
    _MEGAKERNEL_MODE = mode


def _megakernel_serves(n_points: int) -> bool:
    if _MEGAKERNEL_MODE == "off":
        return False
    if _MEGAKERNEL_MODE == "on":
        return True
    from endosurf_tpu.kernels.fused_train import _use_kernel
    return _use_kernel(n_points)


def _megakernel_mesh(n_points: int):
    """Mesh to shard_map the megakernel over, or None.

    pallas_call has no GSPMD partitioning rule (parallel/mesh.py note), so
    on a >1-device mesh the kernel runs under shard_map: params replicated,
    points sharded on the ray/sample axis — batch-pointwise, no
    collectives. Requires an even split and a per-device shard still big
    enough for the kernel gate.
    """
    if _MEGAKERNEL_MODE == "off":
        return None
    from endosurf_tpu.kernels.fused_train import (_KERNEL_ENABLED,
                                                  _MIN_POINTS)
    from endosurf_tpu.parallel.mesh import current_mesh, mesh_active
    if not (mesh_active() and _KERNEL_ENABLED):
        return None
    mesh = current_mesh()
    if mesh is None or n_points % mesh.size != 0:
        return None
    if _MEGAKERNEL_MODE == "on":
        # Forced mode honors the mesh path on any backend (CPU tests run
        # the shard_map body with interpreted kernels) — same contract as
        # fused_sampler.kernel_mesh.
        return mesh
    if n_points // mesh.size < _MIN_POINTS:
        return None
    try:
        import jax as _jax
        if _jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:
        return None
    return mesh


def _sync_megakernel_precision():
    from endosurf_tpu.kernels import fused_train as ft
    from endosurf_tpu.ops.mlp import get_matmul_precision
    prec = get_matmul_precision()
    if prec == "default":
        ft.set_compute_mode(jnp.bfloat16, None)   # MXU bf16, f32 accum
    elif prec == "high":
        ft.set_compute_mode(jnp.float32, "high")  # bf16x3 passes
    else:
        ft.set_compute_mode(jnp.float32, "highest")


def _megakernel_eval(spec: EndoSurfSpec, params: Params, x: jnp.ndarray,
                     d: jnp.ndarray, t: jnp.ndarray):
    """Route through the megakernel with precision synced to ops.mlp."""
    from endosurf_tpu.kernels import fused_train as ft
    _sync_megakernel_precision()
    return ft.megakernel_point_eval(spec, params, x, d, t)


def _megakernel_eval_sharded(spec: EndoSurfSpec, params: Params,
                             x: jnp.ndarray, d: jnp.ndarray,
                             t: jnp.ndarray, mesh):
    """Megakernel under shard_map: each device runs the Pallas segments on
    its shard of the point batch (params replicated; no collectives — the
    evaluation is batch-pointwise). This is how the kernel composes with
    the data-parallel mesh, since pallas_call has no GSPMD rule."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from endosurf_tpu.kernels import fused_train as ft
    _sync_megakernel_precision()

    def body(p, xx, dd, tt):
        return ft.megakernel_point_eval(spec, p, xx, dd, tt,
                                        force_kernel=True)

    out_specs = {"sdf": P("data"), "color": P("data"),
                 "grad_o": P("data"), "grad_c": P("data")}
    f = shard_map(body, mesh=mesh,
                  in_specs=(P(), P("data"), P("data"), P("data")),
                  out_specs=out_specs, check_vma=False)
    return f(params, x, d, t)


def _point_eval(spec: EndoSurfSpec, params: Params, x: jnp.ndarray,
                d: jnp.ndarray, t: jnp.ndarray):
    """Single-point fused evaluation. x,d: [3], t: [1].

    The deform Jacobian products use forward-mode structures; the SDF
    spatial gradient uses ONE reverse-mode vjp. Measured alternatives on
    the flagship fwd+bwd (XLA cost analysis, 65k points): all-forward-mode
    gradients (linearize + basis tangents replacing the inner sdf vjp)
    push traffic from 20.7 GB to 44.2 GB per step because the outer
    reverse pass must differentiate through every tangent propagation;
    the single inner vjp is the cheapest structure for the sdf gradient.
    """
    def warp_fn(xi):
        return warp_to_canonical(spec, params, xi[None, :], t[None, :])[0]

    def sdf_fn(xc):
        return sdf_feat_apply(spec, params, xc[None, :])[0]

    if not spec.use_deform:
        x_c = x
        h, sdf_vjp = jax.vjp(sdf_fn, x_c)
        sdf, feat = h[:1], h[1:]
        cot = jnp.zeros_like(h).at[0].set(1.0)
        (grad_c,) = sdf_vjp(cot)
        grad_o = grad_c
        d_c = d
    elif _DEFORM_JAC_MODE == "linearize":
        x_c, jvp_fn = jax.linearize(warp_fn, x)
        h, sdf_vjp = jax.vjp(sdf_fn, x_c)
        sdf, feat = h[:1], h[1:]
        cot = jnp.zeros_like(h).at[0].set(1.0)
        (grad_c,) = sdf_vjp(cot)              # [3] canonical normal
        (grad_o,) = jax.linear_transpose(jvp_fn, x)(grad_c)  # J^T grad_c
        d_c = jvp_fn(d)                       # J d
    else:
        # jacfwd: primal + 3 tangent passes through the deform MLP.
        jac = jax.jacfwd(warp_fn)(x)          # [3, 3] = d x_c / d x
        x_c = warp_fn(x)
        h, sdf_vjp = jax.vjp(sdf_fn, x_c)
        sdf, feat = h[:1], h[1:]
        cot = jnp.zeros_like(h).at[0].set(1.0)
        (grad_c,) = sdf_vjp(cot)              # [3] canonical normal
        grad_o = jac.T @ grad_c               # chain rule: observed gradient
        d_c = jac @ d

    d_c = d_c / (jnp.linalg.norm(d_c) + 1e-10)
    color = color_apply(spec, params, x_c[None, :], grad_c[None, :],
                        d_c[None, :], feat[None, :])[0]
    return sdf[0], color, grad_o, grad_c


def fused_point_eval(spec: EndoSurfSpec, params: Params, x: jnp.ndarray,
                     d: jnp.ndarray, t: jnp.ndarray, remat: bool = False):
    """Batched fused field evaluation.

    Args:
      x: [N, 3] observed-space points.
      d: [N, 3] observed-space view directions (unit).
      t: [N, 1] times in [0, 1].
      remat: rematerialize activations on the backward pass (jax.checkpoint).
        The training step differentiates twice through ~64 samples/ray of
        9x256 MLPs; remat trades a recompute for an order of magnitude less
        live-activation HBM.

    Returns:
      dict with sdf [N], color [N,3], grad_o [N,3] (observed-space SDF
      gradient, equals the reference's get_sdf_grad_from_observed_space),
      grad_c [N,3] (canonical normal fed to the color net).
    """
    # Mesh first: under a >1-device mesh the kernel path is only valid via
    # shard_map (forced mode would otherwise route the global batch into
    # one pallas_call, which GSPMD cannot partition).
    mk_mesh = _megakernel_mesh(x.shape[0])
    if mk_mesh is not None:
        return _megakernel_eval_sharded(spec, params, x, d, t, mk_mesh)
    if _megakernel_serves(x.shape[0]):
        return _megakernel_eval(spec, params, x, d, t)

    def batched(p, xx, dd, tt):
        return jax.vmap(_point_eval, in_axes=(None, None, 0, 0, 0))(
            spec, p, xx, dd, tt)

    fn = jax.checkpoint(batched) if remat else batched
    sdf, color, grad_o, grad_c = fn(params, x, d, t)
    return {"sdf": sdf, "color": color, "grad_o": grad_o, "grad_c": grad_c}


def sdf_grad_observed(spec: EndoSurfSpec, params: Params,
                      x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Observed-space SDF gradient only (for depth/neighbour losses).

    One vjp through the full warp+sdf composition per point; differentiable
    (second order) like the reference's autograd-with-create_graph
    (endosurf.py:581-601). (Forward-mode basis tangents measure strictly
    worse under the outer reverse pass — see _point_eval docstring.)
    """
    def point(xi, ti):
        def f(xx):
            return sdf_observed(spec, params, xx[None, :], ti[None, :])[0, 0]
        return jax.grad(f)(xi)

    return jax.vmap(point)(x, t)
