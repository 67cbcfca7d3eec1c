"""LR schedules mirroring the reference ``scheduler.py``.

``Scheduler`` semantics (scheduler.py:16-52): exponential decay
``start * decay_rate**(step / decay_steps)`` where ``decay_steps`` is
derived so the end lr is reached exactly at ``iterations``; lr is zeroed
outside the [start_itr, end_itr) window. With the default
``end = 0.1*start`` and ``decay_rate = 0.1`` this reduces to
``start * (end/start)**(step/iterations)``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def exp_window_schedule(
    start_eta: float,
    end_eta: float,
    iterations: int,
    decay_rate: float = 0.1,
    start_itr: int = 0,
    end_itr: int = 10**8,
):
    """optax-compatible schedule fn: step -> lr."""
    decay_steps = iterations / math.log(end_eta / start_eta, decay_rate)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        eta = start_eta * decay_rate ** (step / decay_steps)
        inside = (step >= start_itr) & (step < end_itr)
        return jnp.where(inside, eta, 0.0)

    return schedule
