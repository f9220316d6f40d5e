"""Checkpoint crash-safety semantics (backup-before-save, fallback load)."""

import os
import os.path as osp
import shutil

import numpy as np
import pytest

from endosurf_tpu.train.checkpoint import (
    BACKUP_NAME,
    CKPT_NAME,
    load_checkpoint,
    save_checkpoint,
)


def params_of(v):
    return {"net": {"layers": [{"w": np.full((2, 2), float(v), np.float32),
                                "b": np.zeros(2, np.float32)}]}}


def test_backup_created_on_second_save(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, 1, params_of(1), {})
    assert osp.exists(osp.join(d, CKPT_NAME))
    assert not osp.exists(osp.join(d, BACKUP_NAME))
    save_checkpoint(d, 2, params_of(2), {})
    assert osp.exists(osp.join(d, BACKUP_NAME))
    # Main has step 2, backup has step 1.
    restored = load_checkpoint(d)
    assert restored["n_iter"] == 2
    assert float(restored["params"]["net"]["layers"][0]["w"][0, 0]) == 2.0


def test_fallback_to_backup_when_main_lost(tmp_path):
    d = str(tmp_path)
    save_checkpoint(d, 1, params_of(1), {})
    save_checkpoint(d, 2, params_of(2), {})
    shutil.rmtree(osp.join(d, CKPT_NAME))  # simulate a torn/lost save
    restored = load_checkpoint(d)
    assert restored is not None
    assert restored["n_iter"] == 1
    assert float(restored["params"]["net"]["layers"][0]["w"][0, 0]) == 1.0


def test_load_missing_returns_none(tmp_path):
    assert load_checkpoint(str(tmp_path)) is None


def test_relative_exp_dir(tmp_path, monkeypatch):
    """Relative exp dirs must work (orbax itself requires absolute paths)."""
    monkeypatch.chdir(tmp_path)
    os.makedirs("logs/exp", exist_ok=True)
    save_checkpoint("logs/exp", 5, params_of(5), {})
    restored = load_checkpoint("logs/exp")
    assert restored["n_iter"] == 5


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
