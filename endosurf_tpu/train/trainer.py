"""Base trainer: experiment management, main loop, checkpoint cadence.

Template-method skeleton mirroring the reference Trainer
(/root/reference/src/trainer/trainer_basic.py:16-163): subclasses provide the
jitted train step, eval, and demo; the base owns directories, resume logic,
the train loop with eval/save hooks, and logging.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import numpy as np

from endosurf_tpu.config import load_config, save_config
from endosurf_tpu.data.scene_data import SceneData
from endosurf_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from endosurf_tpu.train.logging import MetricsWriter


class Trainer:
    def __init__(self, cfg: Any, mode: str = "train",
                 scene: Optional[SceneData] = None):
        if isinstance(cfg, str):
            cfg = load_config(cfg)
        self.cfg = cfg
        self.mode = mode

        if scene is not None:
            self.scene = scene
        else:
            data_cfg = cfg["data"]
            self.scene = SceneData.load(
                data_cfg["info_dir"],
                normalize_time=data_cfg.get("normalize_time", True))

        exp_cfg = cfg["exp"]
        self.proj_name = exp_cfg["project_name"]
        self.exp_name = (f"{exp_cfg['exp_name']}-{self.scene.dset_name}"
                         f"-{self.scene.scene_name}")
        self.exp_dir = osp.join(exp_cfg.get("exp_dir", "logs/"),
                                self.proj_name, self.exp_name)
        os.makedirs(self.exp_dir, exist_ok=True)

        self.train_cfg = cfg["train"]
        self.n_iter = self.train_cfg["n_iter"]
        self.resume = self.train_cfg.get("resume", False)

        log_cfg = cfg.get("log", {})
        self.i_eval = log_cfg.get("i_eval", 20000)
        self.i_save = log_cfg.get("i_save", 2500)

        self.step_start = 1
        self.writer: Optional[MetricsWriter] = None

        self.setup()  # subclass: model/optimizer/jitted step

        # Multi-process runs share one exp_dir: only process 0 writes
        # (config, TB/JSONL, checkpoints, eval artifacts); every process
        # restores, so resume state is identical everywhere.
        from endosurf_tpu.parallel.distributed import is_main_process
        self.is_main = is_main_process()

        if mode != "train":
            restored = load_checkpoint(self.exp_dir, self.opt_state_template())
            assert restored is not None, (
                f"no checkpoint found in {self.exp_dir}")
            self.restore(restored)
        else:
            if self.is_main:
                save_config(cfg, osp.join(self.exp_dir, "cfg.yml"))
            if self.resume:
                restored = load_checkpoint(self.exp_dir,
                                           self.opt_state_template())
                if restored is not None:
                    self.restore(restored)
            if self.is_main:
                writer_cfg = log_cfg.get("summary_writer", {})
                self.writer = MetricsWriter(
                    self.exp_dir, cfg,
                    backend=writer_cfg.get("type", "tensorboard"),
                    project=self.proj_name, name=self.exp_name)

    # -- subclass interface -------------------------------------------------
    def setup(self) -> None:
        raise NotImplementedError

    def opt_state_template(self):
        raise NotImplementedError

    def restore(self, restored: Dict[str, Any]) -> None:
        raise NotImplementedError

    def checkpoint_state(self):
        """Return (params, opt_state) to persist."""
        raise NotImplementedError

    def train_step(self, step: int) -> Dict[str, float]:
        raise NotImplementedError

    def train_step_window(self, step: int, kk: int) -> Dict[str, float]:
        """Run steps [step, step+kk-1]; return the last step's metrics.

        Base fallback is a per-step loop; subclasses override with a
        single multi-step device dispatch (train.steps_per_call)."""
        metrics: Dict[str, float] = {}
        for s in range(step, step + kk):
            metrics = self.train_step(s)
        return metrics

    def window_boundaries(self):
        """Steps that must START a dispatch window (subclass hook)."""
        return ()

    def eval(self, step: int) -> Dict[str, float]:
        raise NotImplementedError

    # -- main loop ----------------------------------------------------------
    def start(self, log_every: int = 100,
              stop_after: Optional[int] = None) -> None:
        """Run the train loop from step_start to n_iter.

        stop_after: optional step to pause at (a checkpoint is saved there).
        Long runs on the tunneled TPU should be chunked into <=5k-dispatch
        processes (the tunnel can wedge mid-run; see CLAUDE.md) — resume with
        train.resume=True picks up from the saved step.
        """
        t0 = time.time()
        rays_done = 0
        ray_batch = self.train_cfg.get("ray_batch", 1024)
        # Optional device profiling window (no reference equivalent):
        # train.profile: {start: N, stop: M} captures a jax.profiler trace
        # into <exp_dir>/profile for xprof/tensorboard inspection.
        prof_cfg = self.train_cfg.get("profile") or {}
        prof_start = prof_cfg.get("start", 0)
        prof_stop = prof_cfg.get("stop", 0)
        end = self.n_iter if stop_after is None else min(stop_after,
                                                         self.n_iter)
        # Dispatch-window size (train.steps_per_call): K optimizer steps per
        # device call via lax.scan in the subclass step. On a high-latency
        # link (the tunneled TPU) this amortizes the per-dispatch round trip
        # K-fold. Cadence semantics at K>1: eval steps are window BOUNDARIES
        # (the window is shortened so an eval step starts its own window),
        # so evals fire at their exact step — K>1 runs are eval-curve
        # identical to K=1 regardless of divisibility. Logs/saves fire at
        # the window's last step with that step's label (the state they
        # describe), at most K-1 steps later than a K=1 run would emit them.
        K = max(1, int(self.train_cfg.get("steps_per_call", 1)))

        def in_window(cadence, a, b):
            """Is some multiple of `cadence` within [a, b]?"""
            return cadence > 0 and (b // cadence) > ((a - 1) // cadence)

        def eval_boundaries(step):
            """Steps > step at which an eval must fire (they start windows)."""
            if self.i_eval <= 0:
                return ()
            nxt = (step // self.i_eval + 1) * self.i_eval
            return (nxt, self.n_iter)

        try:
            from tqdm import tqdm
            pbar = tqdm(total=end - self.step_start + 1, desc="TRAIN",
                        leave=True)
        except ImportError:
            pbar = None
        step = self.step_start
        while step <= end:
            kk = min(K, end - step + 1)
            # Never cross a boundary mid-window: subclass boundaries (e.g.
            # important_begin_iter flips the compiled step) and eval steps
            # (so evals fire at their exact step even at K>1).
            for bnd in (*self.window_boundaries(), *eval_boundaries(step)):
                if step < bnd <= step + kk - 1:
                    kk = bnd - step
            s_last = step + kk - 1

            if prof_start and step <= prof_start <= s_last:
                import jax
                jax.profiler.start_trace(osp.join(self.exp_dir, "profile"))
            if self.i_eval > 0 and (step == 1 or step % self.i_eval == 0
                                    or step == self.n_iter):
                # Exact reference cadence: eval BEFORE training step `step`
                # (trainer_basic.py:85-115); eval_boundaries() guarantees
                # such steps start their own window.
                self.eval(step)

            metrics = self.train_step_window(step, kk)
            rays_done += ray_batch * kk

            if prof_stop and step <= prof_stop <= s_last:
                import jax
                jax.profiler.stop_trace()

            if self.writer is not None and (step == 1
                                            or in_window(log_every, step,
                                                         s_last)):
                # Metrics are device arrays; materialize them only at log
                # points — a per-step host fetch would serialize the input
                # pipeline against device round-trips.
                metrics = {k: float(np.asarray(v))
                           for k, v in metrics.items()}
                if pbar is not None:
                    pbar.set_description(
                        f"TRAIN|loss:{metrics.get('loss_total', 0.0):.5g}|")
                self.writer.add_scalars("train", metrics, s_last)
                if hasattr(self, "lr_schedule"):
                    # Reference logs the LR per step (trainer_endosurf.py:203).
                    self.writer.add_scalar(
                        "train/lr", float(np.asarray(
                            self.lr_schedule(s_last - 1))), s_last)
                dt = time.time() - t0
                self.writer.add_scalar("perf/rays_per_sec", rays_done / dt,
                                       s_last)
                if in_window(log_every * 10, step, s_last):
                    print(f"TRAIN|iter:{s_last}/{self.n_iter}"
                          f"|loss:{metrics.get('loss_total', float('nan')):.5g}"
                          f"|rays/s:{rays_done / dt:,.0f}", flush=True)

            if (self.is_main and self.i_save > 0
                    and (in_window(self.i_save, step, s_last)
                         or s_last in (self.n_iter, end))):
                params, opt_state = self.checkpoint_state()
                path = save_checkpoint(self.exp_dir, s_last, params,
                                       opt_state)
                print(f"SAVE|iter:{s_last}/{self.n_iter}|path:{path}",
                      flush=True)
            if pbar is not None:
                pbar.update(kk)
            step = s_last + 1
        if pbar is not None:
            pbar.close()
        self.step_start = end + 1
        if self.writer is not None:
            self.writer.flush()
        print("Training complete!" if end == self.n_iter
              else f"Paused at {end}/{self.n_iter}.", flush=True)
