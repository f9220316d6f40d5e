"""Reference-checkpoint conversion: torch state dicts -> our params.

Builds a reference-layout torch model (weight-normed ModuleList under `net.`),
converts its state dict, and verifies our functional apply reproduces the
torch forward exactly.
"""

import math
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

sys.path.insert(0, "tools")
from convert_reference_checkpoint import (  # noqa: E402
    convert_endonerf,
    convert_endosurf,
)

from endosurf_tpu.ops.mlp import skip_mlp_apply


def make_torch_wn_mlp(dims):
    layers = nn.ModuleList()
    for d0, d1 in dims:
        layers.append(nn.utils.weight_norm(nn.Linear(d0, d1)))
    return layers


def torch_forward(layers, x, skips, act, skip_scale):
    h = x
    for l, lin in enumerate(layers):
        if l in skips:
            h = torch.cat([h, x], -1) * skip_scale
        h = lin(h)
        if l != len(layers) - 1:
            h = act(h)
    return h


def test_endosurf_ckpt_roundtrip():
    torch.manual_seed(0)
    in_dim, hidden, out_dim, skips = 10, 16, 5, [1]
    dims = [(10, 16), (26, 16), (16, 5)]
    sdf_net = make_torch_wn_mlp(dims)
    dev = nn.ParameterDict({"variance": nn.Parameter(torch.tensor(0.3))})

    ckpt = {
        "sdf_network": {f"net.{k[0]}.{k[1]}": v for k, v in
                        [((i, name.split(".")[-1]), p) for i, lin in
                         enumerate(sdf_net) for name, p in
                         lin.state_dict().items()]},
        "color_network": {f"net.{i}.{n}": p for i, lin in
                          enumerate(make_torch_wn_mlp([(8, 8), (8, 3)]))
                          for n, p in lin.state_dict().items()},
        "deviation_network": {"variance": dev["variance"].detach()},
    }
    ckpt_np = {k: {kk: vv.numpy() for kk, vv in v.items()}
               for k, v in ckpt.items()}
    params = convert_endosurf(ckpt_np)

    x = np.random.default_rng(1).normal(size=(7, in_dim)).astype(np.float32)
    ours = np.asarray(skip_mlp_apply(
        {"layers": params["sdf_network"]["layers"]}, jnp.asarray(x),
        skips=skips, activation="softplus100"))
    with torch.no_grad():
        theirs = torch_forward(sdf_net, torch.from_numpy(x), skips,
                               nn.Softplus(beta=100),
                               1.0 / math.sqrt(2.0)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(params["deviation_network"]["variance"]),
                               0.3, rtol=1e-6)


def test_endonerf_ckpt_roundtrip():
    torch.manual_seed(1)
    density = nn.ModuleList([nn.Linear(6, 12), nn.Linear(12, 4)])
    color = nn.ModuleList([nn.Linear(5, 8), nn.Linear(8, 3)])
    state = {}
    for prefix, net in (("net_density", density), ("net_color", color)):
        for i, lin in enumerate(net):
            for n, p in lin.state_dict().items():
                state[f"{prefix}.{i}.{n}"] = p.numpy()
    params = convert_endonerf({"network": state})
    assert "deform" not in params  # static variant (use_deform False)

    x = np.random.default_rng(2).normal(size=(4, 6)).astype(np.float32)
    ours = np.asarray(skip_mlp_apply(params["density"], jnp.asarray(x),
                                     skips=[], activation="relu",
                                     skip_scale=1.0))
    with torch.no_grad():
        theirs = torch_forward(density, torch.from_numpy(x), [],
                               torch.relu, 1.0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
