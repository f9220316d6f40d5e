"""Multi-process (multi-host analog) tests: two OS processes, one global
mesh over loopback gRPC — the same jax.distributed path a TPU pod uses
over DCN, exercised with 4 virtual CPU devices per process."""

import os
import os.path as osp
import socket
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["ESN_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from endosurf_tpu.parallel.distributed import initialize, put_global_batch
from endosurf_tpu.parallel.mesh import make_mesh, ray_sharding

assert initialize()  # from JAX_* env vars
import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 2 procs x 4 devices

mesh = make_mesh()
assert mesh.shape["data"] == 8

# Same-seed global batch on both processes -> global sharded array.
batch = {"rays": np.arange(64 * 9, dtype=np.float32).reshape(64, 9),
         "frame_id": np.float32(3.0)}
g = put_global_batch(batch, mesh)
assert g["rays"].shape == (64, 9)
assert g["rays"].sharding.is_equivalent_to(ray_sharding(mesh), 2)
assert len(g["rays"].addressable_shards) == 4  # this process's devices

# A cross-process collective: global sum over the sharded ray axis.
total = jax.jit(
    lambda r: jnp.sum(r),
    out_shardings=jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()),
)(g["rays"])
expected = float(np.sum(batch["rays"]))
assert abs(float(np.asarray(total)) - expected) < 1e-3, float(
    np.asarray(total))
print("DIST_OK", jax.process_index(), flush=True)
"""


def test_two_process_global_mesh(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "ESN_REPO": REPO,
            "PYTHONPATH": REPO,
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "DIST_OK" in out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
