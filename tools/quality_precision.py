#!/usr/bin/env python
"""Training-quality check for the TPU numeric modes.

Trains the full-size EndoSurf model on the synthetic pulsating-sphere scene
for N steps in each mode and reports eval PSNR / depth-RMSE on a test frame.
Decides which numeric configuration is quality-safe for shipping.

A mode is "main[:sampling[:activation]]":
  main        matmul precision for differentiated passes
              (highest | high | default)
  sampling    matmul precision for stop-gradient sampling paths
              (default: same as main)
  activation  hidden-activation storage dtype (float32 | bfloat16)

    python tools/quality_precision.py --steps 2000 \
        --modes highest high:default default:default \
        default:default:bfloat16
"""

import argparse
import json
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def run(mode: str, steps: int, scene, tmp_root: str):
    from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer

    parts = mode.split(":")
    main = parts[0]
    sampling = parts[1] if len(parts) > 1 else main
    act = parts[2] if len(parts) > 2 else None
    cfg = {
        "exp": {"project_name": "quality",
                "exp_name": f"mode_{mode.replace(':', '_')}",
                "exp_dir": tmp_root, "seed": 0},
        "render": {"type": "endosurf", "anneal_end": steps / 2.0,
                   "n_samples": 32, "n_importance": 32,
                   "important_begin_iter": 0, "up_sample_steps": 4,
                   "perturb": True},
        "train": {
            "n_iter": steps, "ray_batch": 1024,
            "mask_guided_ray_sampling": True,
            "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
            "sdf_loss_weight": 1.0, "angle_loss_weight": 0.1,
            "eikonal_loss_weight": 0.1, "surf_neig_loss_weight": 0.1,
            "surf_neig_rad": 0.1, "resume": False,
            "matmul_precision": main, "sampling_precision": sampling,
            "activation_dtype": act, "remat": False,
            "optim": {"lr": 5e-4, "lr_alpha": 0.05,
                      "warm_up_end": max(1, steps // 20)},
            "eval": {"ray_chunk": 4096},
        },
        "net": {"bound": 1.0, "use_deform": True,
                "deform_network": {}, "sdf_network": {},
                "color_network": {}, "deviation_network": {"init_val": 0.3}},
        "log": {"i_eval": 0, "i_save": 0},
    }
    trainer = EndoSurfTrainer(cfg, mode="train", scene=scene)
    t0 = time.perf_counter()
    last = {}
    for step in range(1, steps + 1):
        last = trainer.train_step(step)
    train_psnr = float(np.asarray(last.get("psnr_color", float("nan"))))
    dt = time.perf_counter() - t0
    stats = trainer.eval(steps)
    return {"mode": mode, "steps": steps,
            "train_s": round(dt, 1),
            "rays_per_sec": round(steps * 1024 / dt, 1),
            "final_train_psnr": round(train_psnr, 3),
            **{k: round(v, 4) for k, v in stats.items()}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--modes", nargs="+",
                    default=["highest", "high:default", "default:default",
                             "default:default:bfloat16"])
    ap.add_argument("--orbit", type=float, default=0.0)
    args = ap.parse_args()

    from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene
    scene_dir = tempfile.mkdtemp(prefix="quality_scene_")
    pkl = make_synthetic_scene(scene_dir, n_frames=8, h=96, w=128,
                               orbit_deg=args.orbit)
    scene = SceneData.load(pkl)

    tmp_root = tempfile.mkdtemp(prefix="quality_runs_")
    for mode in args.modes:
        res = run(mode, args.steps, scene, tmp_root)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
