#!/usr/bin/env python
"""Convert torchvision VGG16 + lpips linear weights to the npz consumed by
endosurf_tpu/evaluation/lpips_jax.py.

Run in an environment WITH network access / the `lpips` and `torchvision`
packages installed:

    python tools/convert_lpips_weights.py --out endosurf_tpu/weights/lpips_vgg16.npz
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import lpips as lpips_pkg

    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    conv_idx = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 + \
            model.net.slice4 + model.net.slice5:
        import torch.nn as nn
        if isinstance(layer, nn.Conv2d):
            w = layer.weight.detach().numpy()        # [O,I,kh,kw]
            out[f"conv{conv_idx}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
            out[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
            conv_idx += 1
    for li, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()    # [1,C,1,1]
        out[f"lin{li}_w"] = w[0, :, 0, 0]

    # Self-check against the consumer's schema before writing, so a
    # torchvision/lpips layout change can't produce a silently-wrong file.
    import os.path as osp
    import sys
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from endosurf_tpu.evaluation.lpips_jax import validate_weights
    validate_weights(out)

    np.savez(args.out, **out)
    print(f"wrote {args.out} with {conv_idx} convs and {len(model.lins)} heads")


if __name__ == "__main__":
    main()
