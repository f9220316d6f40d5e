#!/usr/bin/env python
"""End-to-end learning validation on the synthetic pulsating-sphere scene.

Trains EndoSurf for N steps, then reports eval PSNR/SSIM/depth-RMSE on the
test frames and the demo-3D geometric error (gt point cloud -> extracted
mesh, mm). This is the framework's "does it actually reconstruct" check in
the absence of the (non-redistributable) surgical datasets.

    python tools/validate_synthetic.py --steps 4000
"""

import argparse
import json
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--precision", default="default")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--model", default="endosurf",
                    choices=["endosurf", "endonerf"])
    args = ap.parse_args()

    from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene

    scene_dir = tempfile.mkdtemp(prefix="validate_scene_")
    pkl = make_synthetic_scene(scene_dir, n_frames=args.frames, h=96, w=128)
    scene = SceneData.load(pkl)
    tmp_root = tempfile.mkdtemp(prefix="validate_run_")

    steps = args.steps
    if args.model == "endosurf":
        from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer
        cfg = {
            "exp": {"project_name": "validate", "exp_name": args.model,
                    "exp_dir": tmp_root, "seed": 0},
            "render": {"type": "endosurf", "anneal_end": steps / 2.0,
                       "n_samples": 32, "n_importance": 32,
                       "important_begin_iter": 0, "up_sample_steps": 4,
                       "perturb": True},
            "train": {"n_iter": steps, "ray_batch": 1024,
                      "mask_guided_ray_sampling": True,
                      "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                      "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
                      "eikonal_loss_weight": 0.1,
                      "surf_neig_loss_weight": 0.1, "surf_neig_rad": 0.1,
                      "resume": False, "matmul_precision": args.precision,
                      "remat": False,
                      "optim": {"lr": 5e-4, "lr_alpha": 0.05,
                                "warm_up_end": max(1, steps // 20)},
                      "eval": {"ray_chunk": 4096}},
            "net": {"bound": 1.0, "use_deform": True, "deform_network": {},
                    "sdf_network": {}, "color_network": {},
                    "deviation_network": {"init_val": 0.3}},
            "log": {"i_eval": 0, "i_save": 0},
            "demo": {"fps": 10, "ray_batch": 4096, "net_chunk": 65536,
                     "marching_cubes_resolution": 96,
                     "marching_cubes_thresh": 0},
        }
        trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    else:
        from endosurf_tpu.train.trainer_endonerf import EndoNeRFTrainer
        cfg = {
            "exp": {"project_name": "validate", "exp_name": args.model,
                    "exp_dir": tmp_root, "seed": 0},
            "render": {"type": "endonerf", "n_samples": 64,
                       "n_importance": 64, "perturb": True,
                       "use_depth_sampling": True,
                       "depth_sampling_sigma": 1.0},
            "train": {"n_iter": steps, "ray_batch": 2048,
                      "mask_guided_ray_sampling": True,
                      "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                      "resume": False,
                      "optim": {"lr": 5e-4, "lr_decay": 250},
                      "eval": {"ray_batch": 4096}},
            "net": {"use_deform": True, "raw_noise_std": 1.0},
            "log": {"i_eval": 0, "i_save": 0},
            "demo": {"fps": 10, "ray_batch": 4096, "net_chunk": 65536,
                     "marching_cubes_resolution": 96,
                     "marching_cubes_thresh": 5, "depth_filter": "None",
                     "marching_cubes_filter": 30},
        }
        trainer = EndoNeRFTrainer(cfg, mode="train", scene=scene)

    t0 = time.perf_counter()
    for step in range(1, steps + 1):
        m = trainer.train_step(step)
    train_psnr = float(np.asarray(m["psnr_color"]))  # host fetch = fence
    train_s = time.perf_counter() - t0

    eval_stats = trainer.eval(steps)
    demo_stats = trainer.demo(steps, test_mode=True, visualize=False,
                              demo_2d=False, demo_3d=True)
    print(json.dumps({
        "model": args.model, "steps": steps, "precision": args.precision,
        "train_s": round(train_s, 1),
        "rays_per_sec": round(steps * cfg["train"]["ray_batch"] / train_s, 1),
        "final_train_psnr": round(train_psnr, 2),
        **{k: round(float(v), 4) for k, v in eval_stats.items()},
        "geo_err_mean_mm": round(demo_stats.get("geo_err_mean", float("nan")),
                                 4),
    }), flush=True)


if __name__ == "__main__":
    main()
