#!/usr/bin/env python
"""End-to-end learning validation on the synthetic pulsating-sphere scene.

Trains EndoSurf (or EndoNeRF) for N steps, then reports eval
PSNR/SSIM/depth-RMSE on the test frames and the demo-3D geometric error
(gt point cloud -> extracted mesh, mm). This is the framework's "does it
actually reconstruct" check in the absence of the (non-redistributable)
surgical datasets.

Long runs on the tunneled TPU must be chunked (the tunnel can wedge after
~5k dispatches; CLAUDE.md): pass --exp-dir and --chunk and re-invoke until
the final JSON line appears — each invocation resumes from the checkpoint.

    python tools/validate_synthetic.py --steps 8000 --orbit 30 \
        --exp-dir /tmp/val8k --chunk 4500     # run repeatedly until done
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
    ap.add_argument("--megakernel", default="auto",
                    choices=["auto", "on", "off"],
                    help="Pallas fwd+bwd megakernel dispatch (off = the "
                         "XLA-autodiff path; controls must not mix paths "
                         "mid-run)")
    ap.add_argument("--precision", default="default")
    ap.add_argument("--sampling-precision", default="default")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--orbit", type=float, default=0.0,
                    help="camera orbit arc in degrees (0 = fixed camera)")
    ap.add_argument("--size", type=int, nargs=2, default=(96, 128),
                    metavar=("H", "W"))
    ap.add_argument("--model", default="endosurf",
                    choices=["endosurf", "endonerf"])
    ap.add_argument("--exp-dir", default=None,
                    help="persistent run dir (enables chunked resume)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="max train steps this process (0 = all remaining)")
    ap.add_argument("--mc-res", type=int, default=96)
    ap.add_argument("--i-eval", type=int, default=0,
                    help="mid-training eval cadence (reference: 20000)")
    ap.add_argument("--sampler-kernel", default=None,
                    choices=["auto", "on", "off"],
                    help="Pallas sampler megakernels (upsample + ray "
                         "march). Default: follow --megakernel, so "
                         "precision-control runs stay on one code path "
                         "across resumes.")
    ap.add_argument("--march-kernel", default=None,
                    choices=["auto", "on", "off"],
                    help="ray-march kernel's own gate (default: follow "
                         "--sampler-kernel resolution)")
    ap.add_argument("--steps-per-call", type=int, default=5,
                    help="optimizer steps per device dispatch (lax.scan "
                         "window; bit-equivalent to K=1). K=20 keeps a "
                         "single-process 100k run under ~5k dispatches "
                         "(the tunnel's observed wedge threshold).")
    ap.add_argument("--ablation", default=None,
                    choices=["no_sdf", "no_angle", "no_eikonal",
                             "no_surf_neig"],
                    help="EndoSurf loss-term ablation: zero the named "
                         "loss weight, mirroring the reference's "
                         "configs/endosurf/ablation/*.yml (loss wiring "
                         "reference trainer_endosurf.py:157-162; zeroed "
                         "terms are compiled out of the step)")
    # Deform-capacity sweep knobs (EndoSurf only): vary the deform net
    # against the reference architecture (9x256, 6 time octaves, shared LR
    # — endosurf.py:692-738 / base_pull.yml net.deform_network).
    ap.add_argument("--depth-noise-mm", type=float, default=0.0,
                    help="Gaussian noise sigma (mm) added to the TRAINING "
                         "depth supervision only (fixed seed, valid pixels); "
                         "eval/demo metrics stay against the clean scene. "
                         "Models realistic stereo-matching error — the "
                         "regime the paper motivates the sdf-on-depth loss "
                         "for (reference endosurf.py:289-317).")
    ap.add_argument("--march-reuse", action="store_true",
                    help="surf_march_reuse: localize the surface on the "
                         "render's own importance samples instead of the "
                         "fresh 128-eval sphere trace (round-5 lever; "
                         "the SHIPPING default since the round-5 flip — "
                         "this flag pins it on for older-default configs).")
    ap.add_argument("--no-march-reuse", action="store_true",
                    help="pin surf_march_reuse OFF (the pre-round-5 march "
                         "chain) for A/B comparisons against older runs.")
    ap.add_argument("--march-reuse-secant", type=int, default=0)
    ap.add_argument("--deform-width", type=int, default=None)
    ap.add_argument("--deform-layers", type=int, default=None)
    ap.add_argument("--time-octaves", type=int, default=None)
    ap.add_argument("--deform-lr-mult", type=float, default=None)
    args = ap.parse_args()

    from endosurf_tpu.data.scene_data import SceneData, make_synthetic_scene

    tmp_root = args.exp_dir or tempfile.mkdtemp(prefix="validate_run_")
    scene_dir = osp.join(tmp_root, "scene")
    pkl = make_synthetic_scene(scene_dir, n_frames=args.frames,
                               h=args.size[0], w=args.size[1],
                               orbit_deg=args.orbit)
    scene = SceneData.load(pkl)

    train_scene = scene
    if args.depth_noise_mm > 0.0:
        # Perturb ONLY the training supervision: same-seed Gaussian noise on
        # valid depth pixels, sigma in mm converted to normalized units.
        # Eval/demo below run against the untouched clean scene.
        import dataclasses

        import jax.numpy as jnp
        d = np.asarray(scene.device_arrays["depths"])
        rng = np.random.default_rng(12345)
        sigma = args.depth_noise_mm / scene.depth_scale
        noisy = np.where(d > 0, d + rng.normal(0, sigma, d.shape), d)
        train_scene = dataclasses.replace(
            scene, device_arrays={**scene.device_arrays,
                                  "depths": jnp.asarray(
                                      noisy.astype(np.float32))})

    steps = args.steps
    if args.model == "endosurf":
        from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer
        cfg = {
            "exp": {"project_name": "validate", "exp_name": args.model,
                    "exp_dir": tmp_root, "seed": 0},
            # info_dir makes the saved cfg.yml usable by the CLI afterwards
            # (python -m endosurf_tpu --cfg <exp>/cfg.yml --mode demo).
            "data": {"info_dir": pkl, "normalize_time": True},
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
                      "resume": True, "matmul_precision": args.precision,
                      "sampling_precision": args.sampling_precision,
                      "megakernel": args.megakernel,
                      "sampler_kernel": (args.sampler_kernel
                                         or args.megakernel),
                      "march_kernel": (args.march_kernel
                                       or args.sampler_kernel
                                       or args.megakernel),
                      "remat": False,
                      # K optimizer steps per device dispatch: amortizes
                      # the tunnel's dispatch latency (bit-equivalent to
                      # K=1; tests/test_train_smoke.py).
                      "steps_per_call": args.steps_per_call,
                      "optim": {"lr": 5e-4, "lr_alpha": 0.05,
                                "warm_up_end": max(1, steps // 20)},
                      "eval": {"ray_chunk": 4096}},
            "net": {"bound": 1.0, "use_deform": True, "deform_network": {},
                    "sdf_network": {}, "color_network": {},
                    "deviation_network": {"init_val": 0.3}},
            "log": {"i_eval": args.i_eval, "i_save": 2500},
            "demo": {"fps": 10, "ray_batch": 4096, "net_chunk": 65536,
                     "marching_cubes_resolution": args.mc_res,
                     "marching_cubes_thresh": 0},
        }
        if args.ablation:
            key = {"no_sdf": "sdf_loss_weight",
                   "no_angle": "angle_loss_weight",
                   "no_eikonal": "eikonal_loss_weight",
                   "no_surf_neig": "surf_neig_loss_weight"}[args.ablation]
            cfg["train"][key] = 0.0
        if args.march_reuse:
            cfg["train"]["surf_march_reuse"] = True
            cfg["train"]["surf_march_reuse_secant"] = args.march_reuse_secant
        if args.no_march_reuse:
            cfg["train"]["surf_march_reuse"] = False
        dn = cfg["net"]["deform_network"]
        if args.deform_width:
            dn["hidden_dim"] = args.deform_width
        if args.deform_layers:
            dn["n_layers"] = args.deform_layers
        if args.time_octaves:
            dn["enc_time_cfg"] = {"multires": args.time_octaves}
        if args.deform_lr_mult:
            cfg["train"]["optim"]["deform_lr_mult"] = args.deform_lr_mult
        trainer = EndoSurfTrainer(cfg, mode="train", scene=train_scene)
        trainer_cls = EndoSurfTrainer
    else:
        from endosurf_tpu.train.trainer_endonerf import EndoNeRFTrainer
        cfg = {
            "exp": {"project_name": "validate", "exp_name": args.model,
                    "exp_dir": tmp_root, "seed": 0},
            "data": {"info_dir": pkl, "normalize_time": True},
            "render": {"type": "endonerf", "n_samples": 64,
                       "n_importance": 64, "perturb": True,
                       "use_depth_sampling": True,
                       "depth_sampling_sigma": 1.0},
            "train": {"n_iter": steps, "ray_batch": 2048,
                      "mask_guided_ray_sampling": True,
                      "color_loss_weight": 1.0, "depth_loss_weight": 1.0,
                      "resume": True, "matmul_precision": args.precision,
                      "sampling_precision": args.sampling_precision,
                      "steps_per_call": args.steps_per_call,
                      "optim": {"lr": 5e-4, "lr_decay": 250},
                      "eval": {"ray_batch": 4096}},
            "net": {"use_deform": True, "raw_noise_std": 1.0},
            "log": {"i_eval": args.i_eval, "i_save": 2500},
            "demo": {"fps": 10, "ray_batch": 4096, "net_chunk": 65536,
                     "marching_cubes_resolution": args.mc_res,
                     "marching_cubes_thresh": 5, "depth_filter": "None",
                     "marching_cubes_filter": 30},
        }
        trainer = EndoNeRFTrainer(cfg, mode="train", scene=train_scene)
        trainer_cls = EndoNeRFTrainer

    step0 = trainer.step_start
    if step0 <= steps:
        stop_after = (step0 + args.chunk - 1) if args.chunk else None
        t0 = time.perf_counter()
        trainer.start(log_every=500, stop_after=stop_after)
        train_s = time.perf_counter() - t0
        done_steps = trainer.step_start - step0
        if trainer.step_start <= steps:
            print(json.dumps({
                "model": args.model, "status": "paused",
                "at_step": trainer.step_start - 1, "of": steps,
                "chunk_s": round(train_s, 1),
                "rays_per_sec": round(
                    done_steps * cfg["train"]["ray_batch"] / train_s, 1),
            }), flush=True)
            return
    else:
        train_s = 0.0
        done_steps = 0

    if args.depth_noise_mm > 0.0:
        # Metrics against the CLEAN scene: fresh trainer in test mode (loads
        # the checkpoint the noisy-supervision training just saved).
        trainer = trainer_cls(cfg, mode="test", scene=scene)
    eval_stats = trainer.eval(steps)
    demo_stats = trainer.demo(steps, test_mode=True, visualize=False,
                              demo_2d=False, demo_3d=True)
    out = {
        "model": args.model, "status": "done", "steps": steps,
        "precision": args.precision,
        "sampling_precision": args.sampling_precision,
        "orbit_deg": args.orbit, "frames": args.frames,
        **{k: round(float(v), 4) for k, v in eval_stats.items()},
        "geo_err_mean_mm": round(demo_stats.get("geo_err_mean", float("nan")),
                                 4),
        # extreme-vs-neutral split: test frames sit at t=0.2/0.47/0.73/1.0
        # (radius offsets +9.5%/+2.1%/-9.9%/0% — VALIDATION.md).
        "geo_err_per_frame_mm": [round(float(e), 4) for e in
                                 demo_stats.get("geo_err_per_frame", [])],
    }
    for k in ("deform_width", "deform_layers", "time_octaves",
              "deform_lr_mult", "ablation"):
        if getattr(args, k) is not None:
            out[k] = getattr(args, k)
    if args.depth_noise_mm > 0.0:
        out["depth_noise_mm"] = args.depth_noise_mm
    if done_steps:
        out["rays_per_sec"] = round(
            done_steps * cfg["train"]["ray_batch"] / train_s, 1)
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    main()
