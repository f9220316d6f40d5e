"""Learning-rate schedules matching the reference trainers.

  * EndoSurf: linear warmup then cosine decay to a floor alpha
    (/root/reference/src/trainer/trainer_endosurf.py:183-203).
  * EndoNeRF: exponential decay 0.1^(step / (decay_k * 1000))
    (/root/reference/src/trainer/trainer_endonerf.py:141-151).

Schedules are functions of the optax update count. The reference updates its
LR *after* each optimizer step, so its very first step runs at the full
initial LR even inside warmup; here warmup starts from step 1's factor
(count+1), matching the reference from step 2 onward and avoiding that
first-step spike.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(lr_init: float, warm_up_end: int, n_iter: int,
                  alpha: float):
    def schedule(count):
        step = count + 1.0
        warm = step / warm_up_end
        # max(.., 1): tiny runs may have n_iter == warm_up_end; the cosine
        # branch is then constant and must not divide by zero (the schedule
        # is also called eagerly for LR logging).
        progress = jnp.clip(
            (step - warm_up_end) / max(n_iter - warm_up_end, 1), 0.0, 1.0)
        cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return lr_init * jnp.where(step < warm_up_end, warm, cos)
    return schedule


def exponential(lr_init: float, lr_decay_k: float, decay_rate: float = 0.1):
    decay_steps = lr_decay_k * 1000.0

    def schedule(count):
        step = count + 1.0
        return lr_init * decay_rate ** (step / decay_steps)
    return schedule
