"""Checkpoint save/restore via Orbax, with reference-compatible semantics.

Mirrors the reference's crash-safety protocol (trainer_basic.py:109-113 and
trainer_endosurf.py:76-92): before each save the previous checkpoint is
preserved as a backup, and the stored tree carries the iteration counter plus
per-subnetwork parameter groups and optimizer state under the same top-level
keys as the reference state dicts (endosurf.py:559-568).
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


CKPT_NAME = "ckpt"
BACKUP_NAME = "ckpt_backup"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _local_checkpointer():
    """Orbax checkpointer scoped to THIS process only.

    Trees are materialized to host numpy before save (every process holds a
    full replica under the data mesh), so save/restore is plain local file
    I/O and the Trainer owns all cross-process coordination (process-0-only
    saves, everyone restores at startup). The default PyTreeCheckpointer
    would instead run a GLOBAL sync_global_processes barrier inside save()
    — a process-0-only save then deadlocks the pod (observed: Gloo context
    init DEADLINE_EXCEEDED). Scoping active_processes to the caller keeps
    orbax's barriers trivially local.
    """
    if jax.process_count() == 1:
        return ocp.PyTreeCheckpointer()
    pid = jax.process_index()
    opts = ocp.options.MultiprocessingOptions(
        primary_host=pid, active_processes={pid},
        barrier_sync_key_prefix=f"esn_local_p{pid}")
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                            multiprocessing_options=opts)


def save_checkpoint(exp_dir: str, step: int, params: Dict[str, Any],
                    opt_state: Any) -> str:
    """Atomically save {params, opt_state, n_iter}; keep previous as backup."""
    exp_dir = osp.abspath(exp_dir)  # orbax requires absolute paths
    ckpt_dir = osp.join(exp_dir, CKPT_NAME)
    backup_dir = osp.join(exp_dir, BACKUP_NAME)
    tmp_dir = osp.join(exp_dir, CKPT_NAME + ".tmp")

    tree = {"n_iter": step, "params": _to_host(params),
            "opt_state": _to_host(opt_state)}
    if osp.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    _local_checkpointer().save(tmp_dir, tree)

    if osp.exists(ckpt_dir):
        if osp.exists(backup_dir):
            shutil.rmtree(backup_dir)
        os.replace(ckpt_dir, backup_dir)
    os.replace(tmp_dir, ckpt_dir)
    return ckpt_dir


def load_checkpoint(exp_dir: str,
                    opt_state_template: Optional[Any] = None
                    ) -> Optional[Dict[str, Any]]:
    """Restore the latest checkpoint (falling back to the backup copy)."""
    for name in (CKPT_NAME, BACKUP_NAME):
        path = osp.join(osp.abspath(exp_dir), name)
        if osp.exists(path):
            restored = _local_checkpointer().restore(path)
            if opt_state_template is not None:
                # Orbax restores raw containers; rebuild the optax pytree
                # structure (NamedTuples) from the template.
                leaves = jax.tree_util.tree_leaves(restored["opt_state"])
                treedef = jax.tree_util.tree_structure(opt_state_template)
                restored["opt_state"] = jax.tree_util.tree_unflatten(
                    treedef, leaves)
            return restored
    return None
