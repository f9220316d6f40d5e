#!/usr/bin/env python
"""Round-3 recovery driver: run many TPU validation jobs in ONE process.

The tunneled TPU wedges for 10-45 min after EVERY process exit (CLAUDE.md
round-2 data), so the per-variant subprocess pattern of run_deform_sweep.sh
pays ~5 wedges. This driver sequences the remaining round-3 evidence runs
inside a single long-lived process:

  stage sweep  — deform-capacity variants (VERDICT r2 item 4)
                 + EndoNeRF 8k orbit at shipping precision (item 5)
  stage demos  — reference-resolution demos (res 128 full, res 256 3D)
                 against the 100k-high checkpoint (item 6)

Each unit writes logs/r3_results/<name>.json on completion and is skipped
on re-invocation, so a crash mid-way resumes at the failed unit.
"""

import json
import os
import os.path as osp
import sys
import time
import traceback

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
RESULTS = osp.join(REPO, "logs", "r3_results")
HIGH_EXP = osp.join(REPO, "logs", "es100k_high")


def run_validate(name, argv):
    """One validate_synthetic run, skipped if its result file exists."""
    out_path = osp.join(RESULTS, name + ".json")
    if osp.exists(out_path):
        print(f"[driver] skip {name} (done)", flush=True)
        return True
    print(f"[driver] === {name} start {time.ctime()} ===", flush=True)
    import validate_synthetic
    old_argv = sys.argv
    try:
        sys.argv = ["validate_synthetic.py"] + argv
        out = validate_synthetic.main()
    except Exception:
        traceback.print_exc()
        return False
    finally:
        sys.argv = old_argv
    if out is None:  # paused (chunked) — treat as incomplete
        return False
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[driver] === {name} done {time.ctime()} ===", flush=True)
    return True


def stage_sweep():
    base = ["--steps", "8000", "--orbit", "30", "--frames", "16",
            "--mc-res", "96", "--precision", "default",
            "--steps-per-call", "20", "--megakernel", "off"]
    units = [
        ("sweep_width512", base + ["--deform-width", "512",
                                   "--exp-dir", "logs/sweep_width512"]),
        ("sweep_oct12", base + ["--time-octaves", "12",
                                "--exp-dir", "logs/sweep_oct12"]),
        ("sweep_lr2x", base + ["--deform-lr-mult", "2.0",
                               "--exp-dir", "logs/sweep_lr2x"]),
        ("sweep_w512lr2", base + ["--deform-width", "512",
                                  "--deform-lr-mult", "2.0",
                                  "--exp-dir", "logs/sweep_w512lr2"]),
        ("en8k_default", ["--model", "endonerf", "--steps", "8000",
                          "--orbit", "30", "--frames", "16", "--mc-res",
                          "96", "--precision", "default",
                          "--steps-per-call", "20",
                          "--exp-dir", "logs/en8k_default"]),
    ]
    ok = True
    for name, argv in units:
        ok = run_validate(name, [a if a.startswith("-") or "/" not in a
                                 else a for a in argv]) and ok
    return ok


def stage_en100k():
    """EndoNeRF at the full reference budget (100k steps, eval every 20k) —
    the baseline vertical's analog of the EndoSurf 100k runs, at shipping
    precision. Single process, steps_per_call=20 (the round-3 zero-wedge
    recipe)."""
    return run_validate("en100k_default", [
        "--model", "endonerf", "--steps", "100000", "--orbit", "30",
        "--frames", "16", "--mc-res", "96", "--precision", "default",
        "--steps-per-call", "20", "--i-eval", "20000",
        "--exp-dir", "logs/en100k_default"])


def stage_quality():
    """Round-3 closing controls:

    * es8k_kernels — the 8k orbit quality gate at the TRUE shipping config
      (megakernel + sampler + march kernels all auto): every earlier
      quality run pinned the kernels off for control consistency, while
      the 40.4k bench headline has them on. Baseline to match (kernels
      off): PSNR 22.55 / SSIM 0.444 / geo 10.21 mm.
    * en8k_high — EndoNeRF 8k at "high": separates precision from seed in
      the round-2 (11.18 mm @high) vs round-3 (7.43 mm @default) gap.
    """
    ok = run_validate("es8k_kernels", [
        "--steps", "8000", "--orbit", "30", "--frames", "16",
        "--mc-res", "96", "--precision", "default",
        "--steps-per-call", "20", "--megakernel", "auto",
        "--exp-dir", "logs/es8k_kernels"])
    ok = run_validate("en8k_high", [
        "--model", "endonerf", "--steps", "8000", "--orbit", "30",
        "--frames", "16", "--mc-res", "96", "--precision", "high",
        "--steps-per-call", "20", "--exp-dir", "logs/en8k_high"]) and ok
    ok = _run_en_eval_bench() and ok
    return ok


def _run_en_eval_bench():
    """EndoNeRF serving-path throughput (the vertical had no eval
    measurement); in-process like everything else in this driver."""
    out_path = osp.join(RESULTS, "en_eval_bench.json")
    if osp.exists(out_path):
        print("[driver] skip en_eval_bench (done)", flush=True)
        return True
    print(f"[driver] === en_eval_bench start {time.ctime()} ===", flush=True)
    import contextlib
    import io
    import bench_eval
    old_argv = sys.argv
    buf = io.StringIO()
    try:
        sys.argv = ["bench_eval.py", "--model", "endonerf",
                    "--chunks", "2048", "--chunks-per-call", "1", "8",
                    "--frames", "4"]
        with contextlib.redirect_stdout(buf):
            bench_eval.main()
    except Exception:
        traceback.print_exc()
        return False
    finally:
        sys.argv = old_argv
    rows = [json.loads(l) for l in buf.getvalue().splitlines()
            if l.startswith("{")]
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"[driver] === en_eval_bench done {time.ctime()} ===", flush=True)
    return True


def _find_cfg(exp_root):
    for root, _dirs, files in os.walk(exp_root):
        if "cfg.yml" in files:
            return osp.join(root, "cfg.yml")
    raise FileNotFoundError(f"no cfg.yml under {exp_root}")


def stage_demos():
    """Reference-resolution demos vs the 100k-high checkpoint.

    Reference demo defaults: marching res 128 (base_pull.yml), 256 for
    d6k1 (configs/endosurf/baseline/base_d6k1.yml).
    """
    from endosurf_tpu.config import load_config
    from endosurf_tpu.__main__ import build_trainer

    cfg_path = _find_cfg(HIGH_EXP)
    units = [("demo128", 128, True, True), ("demo256_3d", 256, False, True)]
    ok = True
    for name, res, d2, d3 in units:
        out_path = osp.join(RESULTS, name + ".json")
        if osp.exists(out_path):
            print(f"[driver] skip {name} (done)", flush=True)
            continue
        print(f"[driver] === {name} start {time.ctime()} ===", flush=True)
        try:
            cfg = load_config(cfg_path)
            cfg["demo"]["marching_cubes_resolution"] = res
            trainer = build_trainer(cfg, f"demo_{res}")
            step = trainer.step_start - 1
            stats = trainer.demo(step, test_mode=False, visualize=True,
                                 demo_2d=d2, demo_3d=d3)
            with open(out_path, "w") as f:
                json.dump({k: (v if isinstance(v, (int, float, str, list))
                               else str(v))
                           for k, v in (stats or {}).items()}, f,
                          default=str, indent=1)
            print(f"[driver] === {name} done {time.ctime()} ===", flush=True)
        except Exception:
            traceback.print_exc()
            ok = False
    return ok


def main():
    os.makedirs(RESULTS, exist_ok=True)
    os.chdir(REPO)
    stages = sys.argv[1:] or ["sweep"]
    ok = True
    for st in stages:
        ok = {"sweep": stage_sweep, "demos": stage_demos,
              "en100k": stage_en100k, "quality": stage_quality}[st]() and ok
    print(json.dumps({"driver_status": "ok" if ok else "incomplete",
                      "stages": stages}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
