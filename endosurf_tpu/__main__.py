"""CLI: python -m endosurf_tpu --cfg <yaml> --mode <mode>

Mode surface matches the reference trainers' __main__ dispatch
(trainer_endosurf.py:557-588):
  train    — run/resume training
  test     — demo on the test split (2D + 3D)
  test_2d  — test split, view synthesis only
  test_3d  — test split, mesh extraction only
  demo     — all frames, 2D + 3D
  demo_2d  — all frames, view synthesis only
  demo_3d  — all frames, mesh extraction only
The model family is selected by the config's render.type
(endosurf | endonerf), so one CLI covers both verticals.
"""

from __future__ import annotations

import argparse


def build_trainer(cfg, mode):
    render_type = cfg["render"].get("type", "endosurf")
    if render_type == "endosurf":
        from endosurf_tpu.train.trainer_endosurf import EndoSurfTrainer
        return EndoSurfTrainer(cfg, mode)
    elif render_type == "endonerf":
        from endosurf_tpu.train.trainer_endonerf import EndoNeRFTrainer
        return EndoNeRFTrainer(cfg, mode)
    raise ValueError(f"unknown render type {render_type!r}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--cfg", required=True, help="config yaml path")
    parser.add_argument(
        "--mode", default="train",
        choices=["train", "test", "test_2d", "test_3d",
                 "demo", "demo_2d", "demo_3d"])
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the jax platform (some environments pin a platform "
             "plugin that plain env vars cannot override)")
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    # Multi-host: bring up the jax.distributed runtime BEFORE any backend
    # initializes, driven purely by the standard env vars
    # (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — also
    # auto-set on Cloud TPU pods). No-op for single-process runs. After
    # this, jax.devices() is the global device list, the trainers build a
    # global ("data",) mesh, and every host-side write (config, ckpt,
    # logs, eval artifacts) is process-0 guarded.
    from endosurf_tpu.parallel.distributed import initialize
    if initialize():
        import jax
        print(f"DIST|process {jax.process_index()}/{jax.process_count()}"
              f"|local_devices:{jax.local_device_count()}"
              f"|global_devices:{jax.device_count()}", flush=True)

    from endosurf_tpu.config import load_config
    cfg = load_config(args.cfg)
    trainer = build_trainer(cfg, args.mode)

    if args.mode == "train":
        trainer.start()
        return

    step = trainer.step_start - 1
    test_mode = args.mode.startswith("test")
    suffix = args.mode.split("_")[-1]
    demo_2d = suffix in ("test", "demo", "2d")
    demo_3d = suffix in ("test", "demo", "3d")
    trainer.demo(step, test_mode=test_mode, visualize=True,
                 demo_2d=demo_2d, demo_3d=demo_3d)


if __name__ == "__main__":
    main()
