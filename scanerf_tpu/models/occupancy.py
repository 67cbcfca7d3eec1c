"""Occupancy-grid pruning with progressive subdivision.

Rebuild of ``HashGrid.pruning_grid`` / ``pruning_tile_grid``
(``hashgrid/__init__.py:138-225``): every ADJUST_STEP steps the occupancy
grid is re-derived from the live density field — each currently-occupied
cell (optionally subdivided 2x per axis) is sampled on an internal lattice
and kept when its max alpha = 1 - exp(-sigma) exceeds the threshold.

Runs host-orchestrated between jitted train segments (it changes the grid
resolution, which is a static shape — a recompile every 2000 steps, as
scheduled by ``TRAINING.GRID_LOG2DIM``/``ADJUST_STEP``). Density queries
are chunked through a fixed-shape jitted evaluator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import field as field_lib
from scanerf_tpu.models.field import FieldParams, FieldState


@partial(jax.jit, static_argnames=("backend",))
def _max_alpha_chunk(
    params: FieldParams,
    state: FieldState,
    pts: jax.Array,  # [C, S, 3] in [-2, 2] (contract space)
    step: jax.Array,
    backend: str = "xla",
) -> jax.Array:
    sigma = field_lib.field_inference_sigma(
        params, state, pts, step, backend=backend
    )[..., 0]
    alpha = 1.0 - jnp.exp(-1.0 * sigma)
    return jnp.max(alpha, axis=-1)  # [C]


def prune_occupancy(
    params: FieldParams,
    state: FieldState,
    step: int,
    finest_resolution: np.ndarray,
    sub_split: bool | int,
    pruning_th: float,
    chunk_cells: int = 4096,
    backend: str = "xla",
) -> FieldState:
    """Return a new FieldState with the re-derived occupancy grid.

    Mirrors pruning_tile_grid semantics (:139-214): ``sub_split`` is the
    number of 2x-per-axis subdivisions toward the target log2dim (the
    ladder can jump several rungs between events, e.g. the default
    GRID_LOG2DIM=[4..9] with ADJUST_STEP=2000 targets log2dim 6 at the
    first 5000-step event — two doublings at once); internal sample
    lattice per cell is
    ((finest/4 if step<10000 else finest/2) / 2) / grid_resolution.
    """
    grid = np.asarray(state.occupied_grid)
    for _ in range(int(sub_split)):
        grid = (
            grid.repeat(2, axis=0).repeat(2, axis=1).repeat(2, axis=2)
        )
    res = np.array(grid.shape, np.int64)

    total_res = finest_resolution / (4.0 if step < 10000 else 2.0)
    sample_res = np.maximum((total_res / 2.0 / res).astype(np.int64), 1)

    locs = np.stack(np.nonzero(grid), axis=-1)  # [C, 3]
    if len(locs) == 0:
        new_grid = np.zeros(tuple(res), bool)
        return state.replace(occupied_grid=jnp.asarray(new_grid))

    # internal lattice per cell, in units of the HALF (foreground) domain
    sx, sy, sz = (int(s) for s in sample_res)
    gx, gy, gz = np.meshgrid(
        np.arange(sx), np.arange(sy), np.arange(sz), indexing="ij"
    )
    lattice = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    lattice = lattice / (sample_res.astype(np.float32) * res.astype(np.float32))

    # cell corner as a fraction of the inner bbox
    corners = locs.astype(np.float32) / res.astype(np.float32)  # [C, 3]

    keep = np.zeros(len(locs), bool)
    S = lattice.shape[0]
    pad_to = chunk_cells
    step_arr = jnp.asarray(float(step))
    for i in range(0, len(locs), chunk_cells):
        c = corners[i : i + chunk_cells]
        n = c.shape[0]
        if n < pad_to:
            c = np.pad(c, ((0, pad_to - n), (0, 0)))
        # fractions of the inner bbox -> contract space [-1, 1] is
        # frac*2-1 (contract_fore maps inner bbox to [-1,1])
        pts = (c[:, None, :] + lattice[None, :, :]) * 2.0 - 1.0
        alpha = np.asarray(
            _max_alpha_chunk(
                params, state, jnp.asarray(pts), step_arr, backend=backend
            )
        )
        keep[i : i + chunk_cells] = alpha[:n] > pruning_th

    new_grid = np.zeros(tuple(res), bool)
    kept = locs[keep]
    new_grid[kept[:, 0], kept[:, 1], kept[:, 2]] = True
    return state.replace(occupied_grid=jnp.asarray(new_grid))


class PruningSchedule:
    """GRID_LOG2DIM / PRUNING_TH ladder, mirroring ``tile.py:866-877``:
    a pruning event fires at every ``dynamic_step`` (hard-coded 5000,
    ``tile.py:65``) multiple inside the window [dynamic_start=0,
    TOTAL_STEP - 10000] (``tile.py:62-64``, end inclusive); the target
    log2dim and threshold are indexed by ``step // ADJUST_STEP``, each
    clamped to its own last list entry (``tile.py:869-872``)."""

    def __init__(
        self,
        grid_log2dims: list[int],
        pruning_ths: list[float],
        adjust_step: int,
        total_step: int | None = None,
        dynamic_step: int = 5000,
    ):
        self.log2dims = list(grid_log2dims)
        self.ths = list(pruning_ths)
        self.adjust_step = adjust_step
        self.dynamic_step = dynamic_step
        # dynamic_end = TOTAL_STEP - 10000 (tile.py:64); None = no cap
        self.dynamic_end = total_step - 10000 if total_step else None
        self._last_log2dim = self.log2dims[0]

    def should_prune(self, step: int, round_size: int = 1) -> bool:
        """True when a dynamic_step multiple falls inside the round
        (step - round_size, step]. The trainer only observes round
        boundaries (every SYN_ITERS steps), which need not divide 5000 —
        checking exact multiples would silently skip events
        (the reference checks every step, tile.py:866)."""
        if step <= 0:
            return False
        lo = max(step - round_size, 0)
        if step // self.dynamic_step <= lo // self.dynamic_step:
            return False
        # gate on the event multiple itself, not the round boundary: the
        # reference's per-step check is ``step <= dynamic_end``
        # (tile.py:866), so an event multiple strictly past dynamic_end
        # must not fire even when the round containing it starts before
        m = (step // self.dynamic_step) * self.dynamic_step
        return self.dynamic_end is None or m <= self.dynamic_end

    def params_at(self, step: int) -> tuple[int, float]:
        """(log2dim, threshold) of the event at ``step`` (tile.py:869-872)."""
        i = min(step // self.adjust_step, len(self.log2dims) - 1)
        j = min(step // self.adjust_step, len(self.ths) - 1)
        return self.log2dims[i], self.ths[j]

    def next_at(self, step: int) -> tuple[int, float]:
        """(n_subdivisions, threshold) for this event: how many 2x
        splits bring the grid from the last applied rung to the target
        (the ladder can jump several rungs between events)."""
        log2dim, th = self.params_at(step)
        n_split = max(log2dim - self._last_log2dim, 0)
        self._last_log2dim = max(log2dim, self._last_log2dim)
        return n_split, th
