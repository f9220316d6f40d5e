"""Megakernel TPU bring-up: compile + run each segment kernel in isolation.

Usage: python tools/mk_tpu_bringup.py [--n 65536] [--mode bf16|f32]
                                      [--seg deform_fwd,sdf_fwd,...]

Prints per-kernel wall times (host-fenced; axon's block_until_ready returns
prematurely) and max-abs differences vs the jnp oracle on a small slice.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from endosurf_tpu.kernels import fused_train as ft
from endosurf_tpu.kernels import fused_train_pallas as ftp
from endosurf_tpu.models.fields import EndoSurfSpec, init_endosurf_params


def fence(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--mode", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--seg", default="deform_fwd,sdf_fwd,color_fwd,"
                                     "deform_bwd,sdf_bwd,color_bwd")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.mode == "bf16":
        ft.set_compute_mode(jnp.bfloat16, None)
    else:
        ft.set_compute_mode(jnp.float32, "highest")

    spec = EndoSurfSpec()
    params = init_endosurf_params(jax.random.PRNGKey(0), spec)
    eff = jax.jit(lambda p: ft.prepare_effective(spec, p))(params)
    consts = ft.selectors(spec)

    n = args.n
    key = jax.random.PRNGKey(1)
    kx, kd, kt, kc = jax.random.split(key, 4)
    x = jax.random.uniform(kx, (n, 3), minval=-0.8, maxval=0.8)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jax.random.uniform(kt, (n, 1))
    xt = ft.pad_lanes(x, t)
    d_pad = ft.pad_lanes(d)

    # forward boundary values from the jnp path (small compile)
    x_c, jrows = jax.jit(
        lambda e, a: ft.seg_deform_math(e, consts, a))(eff["deform"], xt)
    sdf, feat, grad_c = jax.jit(
        lambda e, h, fw, a: ft.seg_sdf_math(e, h, fw, consts, a))(
        eff["sdf"], eff["sdf_head"], eff["sdf_feat"], x_c)
    _, d_c = jax.jit(
        lambda j, g, dd: ft.coupling_math(j, g, dd))(jrows, grad_c, d_pad)
    fence((x_c, sdf, d_c))
    print(f"boundary values ready (jnp path), n={n}", flush=True)

    ct_xc = jnp.ones_like(x_c) * 1e-3
    ct_j = [jnp.ones_like(j) * 1e-3 for j in jrows]
    ct_sdf = jnp.ones_like(sdf)
    ct_feat = jnp.ones_like(feat) * 1e-3
    ct_gc = jnp.ones_like(grad_c) * 1e-3
    ct_col = jnp.ones_like(x_c) * 1e-3

    runs = {
        "deform_fwd": lambda: ftp.deform_fwd(spec, consts, eff["deform"],
                                             xt),
        "sdf_fwd": lambda: ftp.sdf_fwd(spec, consts, eff["sdf"],
                                       eff["sdf_head"], eff["sdf_feat"],
                                       x_c),
        "color_fwd": lambda: ftp.color_fwd(spec, consts, eff["color"], x_c,
                                           grad_c, d_c, feat),
        "deform_bwd": lambda: ftp.deform_bwd(spec, consts, eff["deform"],
                                             xt, (ct_xc, ct_j)),
        "sdf_bwd": lambda: ftp.sdf_bwd(spec, consts, eff["sdf"],
                                       eff["sdf_head"], eff["sdf_feat"],
                                       x_c, (ct_sdf, ct_feat, ct_gc)),
        "color_bwd": lambda: ftp.color_bwd(spec, consts, eff["color"], x_c,
                                           grad_c, d_c, feat, ct_col),
    }

    for name in args.seg.split(","):
        fn = jax.jit(runs[name])
        print(f"--- {name}: compiling...", flush=True)
        t0 = time.time()
        out = fn()
        fence(out)
        print(f"    compile+first run {time.time() - t0:.1f}s", flush=True)
        # Burst timing: dispatches queue on the device stream in order, so
        # one final host fetch fences the whole burst — per-call tunnel RTT
        # is amortized instead of paid per iteration.
        fence(fn())   # warm queue
        t0 = time.time()
        for _ in range(args.iters):
            out = fn()
        fence(out)
        ms = 1e3 * (time.time() - t0) / args.iters
        print(f"    burst mean {ms:.2f} ms over {args.iters} "
              f"({n / (ms / 1e3) / 1e6:.1f} Mpts/s)", flush=True)


if __name__ == "__main__":
    main()
