"""End-to-end CLI tests: train then test via ``python -m endosurf_tpu``."""

import os
import os.path as osp
import subprocess
import sys

import pytest
import yaml

from endosurf_tpu.data.scene_data import make_synthetic_scene

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def cli(args, cwd, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "-m", "endosurf_tpu", *args, "--platform", "cpu"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    pkl = make_synthetic_scene(str(d / "scene"), n_frames=4, h=20, w=24)
    cfg = {
        "exp": {"project_name": "cli", "exp_name": "t", "exp_dir": "logs/",
                "seed": 0},
        "data": {"info_dir": pkl, "normalize_time": True},
        "render": {"type": "endosurf", "anneal_end": 10, "n_samples": 6,
                   "n_importance": 6, "important_begin_iter": 0,
                   "up_sample_steps": 2, "perturb": True},
        "train": {"n_iter": 3, "ray_batch": 24,
                  "mask_guided_ray_sampling": True,
                  "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                  "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
                  "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
                  "surf_neig_rad": 0.1, "resume": False,
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
                "i_eval": 0, "i_save": 3},
        "demo": {"fps": 4, "ray_batch": 240, "net_chunk": 4096,
                 "marching_cubes_resolution": 24, "marching_cubes_thresh": 0},
    }
    cfg_path = d / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return d, str(cfg_path)


def test_cli_train(workdir):
    d, cfg_path = workdir
    r = cli(["--cfg", cfg_path, "--mode", "train"], cwd=str(d))
    assert r.returncode == 0, r.stderr[-3000:]
    exp = d / "logs" / "cli" / "t-synthetic-pulsating_sphere"
    assert (exp / "ckpt").exists()
    assert (exp / "cfg.yml").exists()
    assert (exp / "logs" / "metrics.jsonl").exists()


def test_cli_test_mode(workdir):
    d, cfg_path = workdir
    r = cli(["--cfg", cfg_path, "--mode", "test_2d"], cwd=str(d))
    assert r.returncode == 0, r.stderr[-3000:]
    exp = d / "logs" / "cli" / "t-synthetic-pulsating_sphere"
    stats = list((exp / "demo").rglob("stats_out.txt"))
    assert stats, "test_2d must write stats_out.txt"
    content = stats[0].read_text()
    assert "psnr_rgb_vr" in content


def test_cli_lpips_e2e_with_weights(workdir, tmp_path):
    """With a weights file present (the tiny synthetic-schema npz from
    test_metrics — real converted weights are just a bigger instance of
    the same schema), LPIPS flows end-to-end: the CLI eval writes
    lpips_rgb_vr into stats_out.txt. Proves the one environment-blocked
    metric needs strictly a weights file (pointed at via
    $ESN_LPIPS_WEIGHTS), no code changes. Reference consumer:
    src/trainer/trainer_endosurf.py:267,356."""
    import numpy as np
    from test_metrics import _tiny_vgg_npz

    d, cfg_path = workdir
    wpath = str(tmp_path / "lpips_tiny.npz")
    _tiny_vgg_npz(np.random.default_rng(0), wpath)
    r = cli(["--cfg", cfg_path, "--mode", "test_2d"], cwd=str(d),
            env_extra={"ESN_LPIPS_WEIGHTS": wpath})
    assert r.returncode == 0, r.stderr[-3000:]
    exp = d / "logs" / "cli" / "t-synthetic-pulsating_sphere"
    stats = list((exp / "demo").rglob("stats_out.txt"))
    assert stats
    content = stats[0].read_text()
    assert "lpips_rgb_vr" in content, content


def test_cli_raw_to_pkl_to_train_demo3d(tmp_path):
    """The full user journey as one assertion: fabricate a raw ENDONERF
    capture, run the offline preprocessor to the info pkl, then drive the
    real CLI on that pkl — train to a checkpoint, then demo_3d mesh
    extraction. Mirrors the reference workflow (scripts.sh:
    data/endonerf/preprocess.py -> train -> demo)."""
    from test_preprocess import make_raw_endonerf

    from endosurf_tpu.data.preprocess_endonerf import create_endonerf_info

    raw = str(tmp_path / "pulling_soft_tissues")
    # Denser than the roundtrip fixture: the preprocessor's 0.005 downsample
    # needs enough pixels for meaningful per-frame bboxes (real captures are
    # 512x640; 64x80 keeps ~16 pts/frame and the test under 2 min).
    make_raw_endonerf(raw, h=64, w=80)
    pkl = create_endonerf_info(raw, str(tmp_path / "info"), test_every=4)

    cfg = {
        "exp": {"project_name": "journey", "exp_name": "j",
                "exp_dir": "logs/", "seed": 0},
        "data": {"info_dir": pkl, "normalize_time": True},
        "render": {"type": "endosurf", "anneal_end": 10, "n_samples": 6,
                   "n_importance": 6, "important_begin_iter": 0,
                   "up_sample_steps": 2, "perturb": True},
        "train": {"n_iter": 3, "ray_batch": 24,
                  "mask_guided_ray_sampling": True,
                  "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                  "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
                  "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
                  "surf_neig_rad": 0.1, "resume": False,
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
                "i_eval": 0, "i_save": 3},
        "demo": {"fps": 4, "ray_batch": 240, "net_chunk": 4096,
                 "marching_cubes_resolution": 24,
                 "marching_cubes_thresh": 0},
    }
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    r = cli(["--cfg", str(cfg_path), "--mode", "train"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    exps = list((tmp_path / "logs" / "journey").glob("j-*"))
    assert exps, "train must create the experiment dir"
    assert (exps[0] / "ckpt").exists()

    r = cli(["--cfg", str(cfg_path), "--mode", "demo_3d"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    plys = list(exps[0].rglob("*_geometry.ply"))
    assert plys, "demo_3d must extract per-frame meshes from the raw capture"


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
