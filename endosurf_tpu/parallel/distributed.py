"""Multi-host (multi-process) runtime initialization.

The reference is strictly single-GPU — no distributed code of any kind
(SURVEY.md §2.6: no torch.distributed/NCCL/MPI anywhere). On TPU,
single-host multi-chip needs nothing beyond `mesh.py`: XLA emits ICI
collectives for the sharded ray batch. Scaling past one host adds exactly
two ingredients, both here:

  1. `initialize()` — bring up the JAX distributed runtime (gRPC
     coordinator over DCN) BEFORE any backend is touched, after which
     `jax.devices()` is the global device list and `mesh.make_mesh()`
     builds a global ("data",) mesh transparently.
  2. `put_global_batch()` — turn a host-local (fully replicated) batch
     into a global array sharded over the data axis. Endoscope scenes are
     small (every host holds all frames), so each process samples the SAME
     global batch from the SAME PRNG key and keeps only its addressable
     shards; no host-to-host data movement is needed and the math is
     bitwise-identical to the single-host run.

Gradient reduction stays an XLA-inserted psum (ICI within a host, DCN
across hosts); there is no hand-written communication anywhere.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> bool:
    """Bring up the multi-process runtime; no-op for single-process runs.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — also
    auto-detected on Cloud TPU pods). Returns True if the distributed
    runtime was initialized by this call.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or (num_processes or 1) <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def is_main_process() -> bool:
    """True on the process that owns host-side writes (ckpt/logs/eval).

    Two processes sharing an exp_dir must not race on checkpoint replaces
    or JSONL appends; every writer in the train/eval path is gated on this.
    Single-process runs are trivially the main process.
    """
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def put_global_batch(batch: Dict[str, Any], mesh) -> Dict[str, Any]:
    """Shard a host-local batch over the global ('data',) mesh.

    Every process must hold the SAME full batch (guaranteed by sampling
    with the same PRNG key — the trainer's key chain is seed-derived and
    identical on all processes). `jax.device_put` with a global sharding
    then places only the shards addressable from this process; arrays
    whose leading axis is not divisible by the mesh (i.e. not the ray
    axis — scalars like frame_id, odd tails) stay replicated, mirroring
    mesh.constrain_axis0.
    """
    from endosurf_tpu.parallel.mesh import ray_sharding, replicated_sharding
    ray_sh = ray_sharding(mesh)
    rep_sh = replicated_sharding(mesh)

    def put(x):
        if (hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] % mesh.size == 0):
            return jax.device_put(x, ray_sh)
        return jax.device_put(x, rep_sh)

    return {k: put(v) for k, v in batch.items()}
