"""Device-mesh data parallelism over the ray axis.

The reference is strictly single-GPU (SURVEY.md §2.6: no torch.distributed /
NCCL anywhere). Per-ray rendering is embarrassingly parallel, so the TPU
design shards the ray batch across chips on a 1-D ("data",) mesh and keeps
parameters replicated:

  * the sampled batch gets a ``with_sharding_constraint`` along axis 0;
  * every loss reduction is a masked global sum, which XLA turns into psums
    over ICI automatically;
  * the Adam update runs replicated (params are small: ~2M floats).

No hand-written collectives are required — this module only pins layouts.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    mesh = Mesh(np.asarray(devs), ("data",))
    # >1 device: register the mesh so kernel-dispatch sites shard_map
    # their kernels over it (or fall back to the XLA path) — see the
    # kernel/mesh interaction note at the bottom of this module.
    if mesh.size > 1:
        set_mesh_active(True, mesh)
    return mesh


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_axis0(x, mesh: Optional[Mesh]):
    """Pin an array's leading axis to the data mesh (inference paths).

    Used by the eval/demo render closures so full-frame rendering and demo
    grid extraction also fan out over all chips when data_parallel is on.
    No-op when there is no mesh or the axis doesn't divide evenly (odd
    grid tails) — the math is identical either way, only the layout moves.
    """
    if mesh is None or x.shape[0] % mesh.size != 0:
        return x
    return jax.lax.with_sharding_constraint(x, ray_sharding(mesh))


def replicate_outputs(tree, mesh: Optional[Mesh]):
    """Constrain a jitted computation's outputs to fully-replicated layout.

    Inference closures (eval/demo renders) shard their inputs over the data
    axis; on a MULTI-PROCESS mesh the outputs would then not be addressable
    from any single host, so `np.asarray` on the result would fail. Pinning
    the outputs replicated makes XLA emit the all-gather inside the program
    (ICI/DCN), after which every process holds the full result. No-op for
    single-process runs — the outputs are addressable anyway and the extra
    layout pins would only constrain XLA.
    """
    if mesh is None or jax.process_count() == 1:
        return tree
    rep = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, rep), tree)


def shard_ray_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Pin per-ray tensors to the data axis; scalars stay replicated."""
    ray_sh = ray_sharding(mesh)
    rep_sh = replicated_sharding(mesh)

    def constrain(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.lax.with_sharding_constraint(x, ray_sh)
        return jax.lax.with_sharding_constraint(x, rep_sh)

    return {k: constrain(v) for k, v in batch.items()}


# ---------------------------------------------------------------------------
# kernel/mesh interaction
# ---------------------------------------------------------------------------

# Pallas kernels (kernels/fused_sdf.py, kernels/fused_train*.py) have no
# GSPMD partitioning rule: under a sharded computation the SPMD partitioner
# replicates their operands (measured: 18 all-gathers around the megakernel
# on an 8-device mesh), running the FULL batch on every device — silent
# de-parallelization. Kernel dispatch sites therefore either (a) run the
# kernel under shard_map on the registered mesh (batch-pointwise: params
# replicated, points sharded, no collectives — see
# fields.fused_point_eval), or (b) where the batch doesn't divide the
# mesh, fall back to the XLA path, which GSPMD shards correctly.
_MESH_ACTIVE = False
_CURRENT_MESH: Optional[Mesh] = None


def set_mesh_active(active: bool, mesh: Optional[Mesh] = None) -> None:
    global _MESH_ACTIVE, _CURRENT_MESH
    _MESH_ACTIVE = bool(active)
    _CURRENT_MESH = mesh if active else None


def mesh_active() -> bool:
    return _MESH_ACTIVE


def current_mesh() -> Optional[Mesh]:
    return _CURRENT_MESH
