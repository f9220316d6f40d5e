#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (ckpt.tar) to endosurf_tpu params.

The reference stores per-subnetwork torch state dicts
(trainer_endosurf.py:85-92 / endosurf.py:559-568 for EndoSurf;
trainer_endonerf.py:76-84 for EndoNeRF). Torch layouts map to ours as:

  weight_v [out, in]  ->  v [in, out]        (weight-norm direction)
  weight_g [out, 1]   ->  g [out]            (weight-norm magnitude)
  weight   [out, in]  ->  w [in, out]        (plain linear, EndoNeRF)
  bias     [out]      ->  b [out]
  variance scalar     ->  deviation_network.variance

Usage:
    python tools/convert_reference_checkpoint.py \
        --ckpt logs/endosurf/base-endonerf-pulling_soft_tissues/ckpt.tar \
        --model endosurf --out converted_ckpt/

The output directory is an orbax checkpoint loadable by
endosurf_tpu.train.checkpoint.load_checkpoint (params only; optimizer state
does not transfer across frameworks — resume re-initializes Adam moments).
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def _mlp_from_torch_state(state: dict, prefix: str = "net."):
    """Torch ModuleList state dict -> our layer list pytree."""
    layer_ids = sorted({int(k.split(".")[1]) for k in state
                        if k.startswith(prefix)})
    layers = []
    for l in layer_ids:
        base = f"{prefix}{l}."
        if base + "weight_v" in state:
            v = np.asarray(state[base + "weight_v"]).T        # [in, out]
            g = np.asarray(state[base + "weight_g"]).reshape(-1)
            b = np.asarray(state[base + "bias"])
            layers.append({"v": v.astype(np.float32),
                           "g": g.astype(np.float32),
                           "b": b.astype(np.float32)})
        else:
            w = np.asarray(state[base + "weight"]).T
            b = np.asarray(state[base + "bias"])
            layers.append({"w": w.astype(np.float32),
                           "b": b.astype(np.float32)})
    return {"layers": layers}


def convert_endosurf(ckpt: dict) -> dict:
    params = {}
    if "deform_network" in ckpt:
        params["deform_network"] = _mlp_from_torch_state(
            {k: v for k, v in ckpt["deform_network"].items()})
    params["sdf_network"] = _mlp_from_torch_state(ckpt["sdf_network"])
    params["color_network"] = _mlp_from_torch_state(ckpt["color_network"])
    params["deviation_network"] = {
        "variance": np.float32(np.asarray(
            ckpt["deviation_network"]["variance"]))}
    return params


def convert_endonerf(ckpt: dict) -> dict:
    state = ckpt["network"]
    params = {}
    if any(k.startswith("net_deform.") for k in state):
        params["deform"] = _mlp_from_torch_state(state, "net_deform.")
    params["density"] = _mlp_from_torch_state(state, "net_density.")
    params["color"] = _mlp_from_torch_state(state, "net_color.")
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference ckpt.tar path")
    ap.add_argument("--model", choices=["endosurf", "endonerf"],
                    default="endosurf")
    ap.add_argument("--out", required=True,
                    help="output experiment dir (orbax checkpoint created "
                         "under <out>/ckpt)")
    args = ap.parse_args()

    import torch
    ckpt = torch.load(args.ckpt, map_location="cpu")
    ckpt = {k: ({kk: vv.numpy() if hasattr(vv, "numpy") else vv
                 for kk, vv in v.items()} if isinstance(v, dict) else
                (v.numpy() if hasattr(v, "numpy") else v))
            for k, v in ckpt.items()}

    if args.model == "endosurf":
        params = convert_endosurf(ckpt)
    else:
        params = convert_endonerf(ckpt)

    from endosurf_tpu.train.checkpoint import save_checkpoint
    step = int(ckpt.get("n_iter", 0))
    path = save_checkpoint(args.out, step, params, opt_state={})
    print(f"converted (n_iter={step}) -> {path}")


if __name__ == "__main__":
    main()
