"""Pallas TPU kernels for the fused fwd+bwd training megakernel.

Executes the segment math of kernels/fused_train.py on VMEM-resident blocks:
weights (and selector constants) are fetched once and stay resident across
the whole grid; each grid step streams one block of points through the full
segment — forward, or recompute+vjp for the backward — so no 256-wide
activation ever round-trips HBM. Parameter cotangents are accumulated across
grid steps directly in the VMEM-resident output block (constant index map +
revisiting; the grid is sequential on TPU).

The kernel bodies call the SAME math functions as the jnp oracle
(seg_*_math), and the backwards are jax.vjp of those functions traced inside
the kernel — Mosaic lowers the transposed matmuls and second-order
elementwise chains like any other kernel code. Numerical parity with the jnp
path is therefore structural, tested in tests/test_fused_train_pallas.py
(interpret mode on CPU; real hardware on TPU).

All 1-D parameter leaves (biases) are lifted to [1, n] before entering a
kernel (Mosaic prefers >=2-D operands); cotangents are reshaped back.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from endosurf_tpu.kernels.fused_train import (
    seg_color_math,
    seg_deform_math,
    seg_sdf_math,
)

# Block sizes are VMEM-bound: the fwd segments keep ~4 passes of 256-wide
# activations live, the bwd segments additionally hold vjp residuals +
# resident grad blocks (v5e: 128M physical VMEM, vmem_limit raised below).
# Env overrides for tuning sweeps (tools/mk_tpu_bringup.py).
# The round-3 sweep (fwd 256/512, bwd 128/256) measured flat and shipped
# 256/128; the D-NeRF megakernel's block findings prompted a re-sweep one
# octave up: 1024/512 cuts the flagship step 26.6 -> 23.3 ms (on/off ratio
# 1.06 -> 1.14) and the isolated fused-eval fwd+bwd now MATCHES XLA
# (10.4 vs 10.5 ms; was 12% slower); 2048/1024 regresses to 23.8 ms
# (logs/es_mk_blk1024.log, es_mk_blk2048.log).
import os as _os

BLOCK_FWD = int(_os.environ.get("ESN_MK_BLOCK_FWD", 1024))
BLOCK_BWD = int(_os.environ.get("ESN_MK_BLOCK_BWD", 512))

# None = auto (interpret when running on CPU, compiled on TPU).
_INTERPRET: Optional[bool] = None


def set_interpret(mode: Optional[bool]) -> None:
    global _INTERPRET
    _INTERPRET = mode


def _interpret() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return False


def _round_up(n: int, m: int = 128) -> int:
    return ((n + m - 1) // m) * m


def _to2d(tree):
    """Lift 1-D leaves to [1, n] (Mosaic-friendly operand ranks)."""
    return jax.tree_util.tree_map(
        lambda a: a[None, :] if a.ndim == 1 else a, tree)


def _from2d(tree, like):
    """Undo _to2d using the original tree's ranks."""
    return jax.tree_util.tree_map(
        lambda a, ref: a.reshape(ref.shape), tree, like)


def _const_spec(arr) -> pl.BlockSpec:
    return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                        memory_space=pltpu.VMEM)


def _seg_pallas(fn, res_tree, blocks: Sequence[jnp.ndarray],
                out_block_tpl: Sequence[jax.ShapeDtypeStruct],
                out_accum_tpl, block_n: int):
    """Run ``fn`` over point blocks with resident side inputs.

    Args:
      fn: (res_tree, *block_arrays) -> (list_of_block_outputs,
        accum_pytree_or_None). Traced inside the kernel.
      res_tree: pytree of resident arrays (weights/constants), every leaf
        >=2-D, fetched once (constant index maps).
      blocks: [N, L_i] per-point arrays, streamed block-by-block.
      out_block_tpl: ShapeDtypeStructs ([N, L_o]) for per-point outputs.
      out_accum_tpl: pytree of ShapeDtypeStructs for grid-accumulated
        outputs (parameter cotangents), or None.

    Returns (block_outputs, accum_pytree).
    """
    n = blocks[0].shape[0]
    bn = min(block_n, _round_up(n, 128))
    n_pad = (-n) % bn
    if n_pad:
        blocks = [jnp.concatenate(
            [b, jnp.zeros((n_pad,) + b.shape[1:], b.dtype)], 0)
            for b in blocks]
    nt = n + n_pad
    grid = (nt // bn,)

    res_leaves, res_def = jax.tree_util.tree_flatten(res_tree)
    acc_leaves_tpl, acc_def = jax.tree_util.tree_flatten(out_accum_tpl)
    n_res, n_blk, n_out = len(res_leaves), len(blocks), len(out_block_tpl)

    def body(*refs):
        res_refs = refs[:n_res]
        blk_refs = refs[n_res:n_res + n_blk]
        out_refs = refs[n_res + n_blk:n_res + n_blk + n_out]
        acc_refs = refs[n_res + n_blk + n_out:]
        res = jax.tree_util.tree_unflatten(
            res_def, [r[...] for r in res_refs])
        blk = [r[...] for r in blk_refs]
        # Mosaic has no HIGH dot precision; promote to "highest" for the
        # in-kernel trace (an accuracy superset of the bf16x3 passes) and
        # restore afterwards — the jnp oracle path keeps "high".
        from endosurf_tpu.kernels import fused_train as _ft
        prev = (_ft._COMPUTE_DTYPE, _ft._PRECISION)
        if _ft._PRECISION == "high":
            _ft.set_compute_mode(_ft._COMPUTE_DTYPE, "highest")
        try:
            b_outs, a_out = fn(res, *blk)
        finally:
            _ft.set_compute_mode(*prev)
        for r, v in zip(out_refs, b_outs):
            r[...] = v.astype(r.dtype)
        if acc_refs:
            a_leaves = jax.tree_util.tree_leaves(a_out)
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                for r, v in zip(acc_refs, a_leaves):
                    r[...] = v.astype(r.dtype)

            @pl.when(i > 0)
            def _accum():
                for r, v in zip(acc_refs, a_leaves):
                    r[...] = r[...] + v.astype(r.dtype)

    in_specs = [_const_spec(a) for a in res_leaves]
    in_specs += [pl.BlockSpec((bn, b.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for b in blocks]
    out_specs = [pl.BlockSpec((bn, o.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
                 for o in out_block_tpl]
    out_specs += [_const_spec(a) for a in acc_leaves_tpl]
    out_shape = [jax.ShapeDtypeStruct((nt, o.shape[1]), o.dtype)
                 for o in out_block_tpl]
    out_shape += [jax.ShapeDtypeStruct(a.shape, a.dtype)
                  for a in acc_leaves_tpl]

    results = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
        # v5e has 128M VMEM; XLA's default 16M scoped-vmem budget is far
        # below what the resident weights + recompute chain need.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*res_leaves, *blocks)
    if not isinstance(results, (tuple, list)):
        results = (results,)
    block_outs = [r[:n] for r in results[:n_out]]
    accum = jax.tree_util.tree_unflatten(acc_def, list(results[n_out:]))
    return block_outs, accum


def _sds_like(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, jnp.float32), tree)


def _np_consts(consts) -> Dict[str, jnp.ndarray]:
    return {k: jnp.asarray(v) for k, v in consts.items()}


# ---------------------------------------------------------------------------
# deform segment
# ---------------------------------------------------------------------------

def deform_fwd(spec, consts, eff_d, xt):
    res = {"w": _to2d(eff_d), "c": _np_consts(consts)}
    lanes = xt.shape[1]

    def fn(r, xt_blk):
        x_c, jrows = seg_deform_math(r["w"], r["c"], xt_blk)
        return [x_c] + jrows, None

    tpl = [jax.ShapeDtypeStruct((xt.shape[0], lanes), jnp.float32)] * 4
    outs, _ = _seg_pallas(fn, res, [xt], tpl, None, BLOCK_FWD)
    return outs[0], outs[1:4]


def deform_bwd(spec, consts, eff_d, xt, ct):
    ct_xc, ct_jrows = ct
    eff2 = _to2d(eff_d)
    res = {"w": eff2, "c": _np_consts(consts)}

    def fn(r, xt_blk, cxc, cj0, cj1, cj2):
        def f(wt):
            return seg_deform_math(wt, r["c"], xt_blk)
        _, pull = jax.vjp(f, r["w"])
        (dw,) = pull((cxc, [cj0, cj1, cj2]))
        return [], dw

    _, dacc = _seg_pallas(fn, res, [xt, ct_xc, *ct_jrows], [],
                          _sds_like(eff2), BLOCK_BWD)
    return _from2d(dacc, eff_d)


# ---------------------------------------------------------------------------
# sdf segment
# ---------------------------------------------------------------------------

def sdf_fwd(spec, consts, eff_s, head, featw, x_c):
    res = {"w": {"eff": _to2d(eff_s), "head": _to2d(head),
                 "feat": _to2d(featw)},
           "c": _np_consts(consts)}
    n = x_c.shape[0]
    feat_dim = featw["w"].shape[1]

    def fn(r, xc_blk):
        w = r["w"]
        sdf, feat, grad_c = seg_sdf_math(w["eff"], w["head"], w["feat"],
                                         r["c"], xc_blk)
        return [sdf, feat, grad_c], None

    tpl = [jax.ShapeDtypeStruct((n, 1), jnp.float32),
           jax.ShapeDtypeStruct((n, feat_dim), jnp.float32),
           jax.ShapeDtypeStruct((n, x_c.shape[1]), jnp.float32)]
    outs, _ = _seg_pallas(fn, res, [x_c], tpl, None, BLOCK_FWD)
    return outs[0], outs[1], outs[2]


def sdf_bwd(spec, consts, eff_s, head, featw, x_c, ct):
    ct_sdf, ct_feat, ct_gc = ct
    w2 = {"eff": _to2d(eff_s), "head": _to2d(head), "feat": _to2d(featw)}
    res = {"w": w2, "c": _np_consts(consts)}

    def fn(r, xc_blk, csdf, cfeat, cgc):
        def f(wt, xc):
            return seg_sdf_math(wt["eff"], wt["head"], wt["feat"],
                                r["c"], xc)
        _, pull = jax.vjp(f, r["w"], xc_blk)
        dw, dxc = pull((csdf, cfeat, cgc))
        return [dxc], dw

    tpl = [jax.ShapeDtypeStruct((x_c.shape[0], x_c.shape[1]), jnp.float32)]
    outs, dacc = _seg_pallas(fn, res, [x_c, ct_sdf, ct_feat, ct_gc], tpl,
                             _sds_like(w2), BLOCK_BWD)
    d_eff = _from2d(dacc["eff"], eff_s)
    d_head = _from2d(dacc["head"], head)
    d_featw = _from2d(dacc["feat"], featw)
    return d_eff, d_head, d_featw, outs[0]


# ---------------------------------------------------------------------------
# color segment
# ---------------------------------------------------------------------------

def color_fwd(spec, consts, eff_c, x_c, grad_c, d_c, feat):
    res = {"w": _to2d(eff_c), "c": _np_consts(consts)}

    def fn(r, xc_blk, gc_blk, dc_blk, ft_blk):
        color = seg_color_math(r["w"], r["c"], xc_blk, gc_blk, dc_blk,
                               ft_blk)
        return [color], None

    tpl = [jax.ShapeDtypeStruct((x_c.shape[0], x_c.shape[1]), jnp.float32)]
    outs, _ = _seg_pallas(fn, res, [x_c, grad_c, d_c, feat], tpl, None,
                          BLOCK_FWD)
    return outs[0]


def color_bwd(spec, consts, eff_c, x_c, grad_c, d_c, feat, ct):
    eff2 = _to2d(eff_c)
    res = {"w": eff2, "c": _np_consts(consts)}
    n = x_c.shape[0]

    def fn(r, xc_blk, gc_blk, dc_blk, ft_blk, ct_blk):
        def f(wt, xc, gc, dc, ft):
            return seg_color_math(wt, r["c"], xc, gc, dc, ft)
        _, pull = jax.vjp(f, r["w"], xc_blk, gc_blk, dc_blk, ft_blk)
        dw, dxc, dgc, ddc, dft = pull(ct_blk)
        return [dxc, dgc, ddc, dft], dw

    tpl = [jax.ShapeDtypeStruct((n, x_c.shape[1]), jnp.float32),
           jax.ShapeDtypeStruct((n, grad_c.shape[1]), jnp.float32),
           jax.ShapeDtypeStruct((n, d_c.shape[1]), jnp.float32),
           jax.ShapeDtypeStruct((n, feat.shape[1]), jnp.float32)]
    outs, dacc = _seg_pallas(fn, res, [x_c, grad_c, d_c, feat, ct], tpl,
                             _sds_like(eff2), BLOCK_BWD)
    d_eff = _from2d(dacc, eff_c)
    return d_eff, outs[0], outs[1], outs[2], outs[3]
