"""Checkpoint/resume and inference-export formats.

Mirrors the reference's two artifact families:

- **Full checkpoint** (``tile.py:534-572``): global step + hash features +
  occupancy grid + ADMM variables + decoder + BOTH optimizer states.
  Stored as a flat ``.npz`` of pytree leaves (path-keyed), so resume is
  exact including Adam moments.
- **Inference export** (``tile.py:510-531``, ``hashgrid/__init__.py:
  248-257``): per-tile directory with ``feature.npz`` (fp16 hash tables,
  occupancy grid, bbox, per-level resolutions), ``decoder.npz`` (packed
  PARAMSIZE vector — the layout of ``hashgrid/include/decoder.h:48-67``),
  and ``cams.npz`` (refined c2ws + ks + view ids).
"""

from __future__ import annotations

import glob
import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.models import decoder as decoder_lib
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train.tile import TrainState


# ---------------------------------------------------------------------------
# flat pytree <-> npz
# ---------------------------------------------------------------------------

def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_checkpoint(path: str, state: TrainState) -> None:
    arrays, _ = _flatten_with_paths(state)
    np.savez(path, **arrays)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into a structurally-identical template state."""
    data = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = "/".join(str(q) for q in p)
        arr = data[key]
        tmpl = np.asarray(leaf)
        if arr.shape != tmpl.shape and arr.size == tmpl.size:
            # layout migration: hash tables were [L, H, F] before the
            # flat [L, H*F] canonical form (hash_encode.as_3d)
            arr = arr.reshape(tmpl.shape)
        # when sizes genuinely differ (e.g. the occupancy grid was
        # re-split by a pruning event after the template was built), the
        # STORED shape wins: the trainer rebuilds its jitted round fn
        # from the loaded state, so downstream shapes follow the data
        leaves.append(jnp.asarray(arr, dtype=tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(ckp_dir: str, tile_idx: int) -> str | None:
    """Newest checkpoint-{step}-{tile}.npz (tile.py:37-45 glob+sort)."""
    files = glob.glob(os.path.join(ckp_dir, f"checkpoint-*-{tile_idx}.npz"))
    if not files:
        return None

    def step_of(f):
        m = re.search(r"checkpoint-(\d+)-", os.path.basename(f))
        return int(m.group(1)) if m else -1

    return max(files, key=step_of)


def checkpoint_path(out_dir: str, step: int, tile_idx: int) -> str:
    return os.path.join(out_dir, f"checkpoint-{step}-{tile_idx}.npz")


# ---------------------------------------------------------------------------
# inference export
# ---------------------------------------------------------------------------

def export_tile(
    out_dir: str,
    state: TrainState,
    cams: cam_lib.Cameras,
    visible_poses: list[int],
    hash_layout: str = "global",
) -> None:
    """hash_layout records which table layout the tile was trained with:
    "global" (reference prime-XOR, hash_backend="xla") or "windowed"
    (hierarchical window hash, hash_backend="windowed"). The renderer
    must look features up with the matching hash."""
    os.makedirs(out_dir, exist_ok=True)
    fs = state.field_state
    log2dim = np.log2(np.array(fs.occupied_grid.shape)).astype(np.int32)
    np.savez(
        os.path.join(out_dir, "feature.npz"),
        features=np.asarray(state.params.field.features).astype(np.float16),
        occupied_grid=np.asarray(fs.occupied_grid),
        block_corner=np.asarray(fs.min_bbox),
        block_size=np.asarray(fs.bbox_size),
        grid_log2dim=log2dim,
        resolution=np.asarray(fs.resolutions),
        hash_layout=np.array(hash_layout),
    )
    packed = np.asarray(decoder_lib.pack_params(state.params.field.decoder))
    np.savez(os.path.join(out_dir, "decoder.npz"), params=packed)
    c2ws = np.asarray(
        cam_lib.get_rts(cams, state.params.se3_refine)
    )
    from scanerf_tpu.utils import lie

    c2ws = np.asarray(lie.invert(jnp.asarray(c2ws)))
    np.savez(
        os.path.join(out_dir, "cams.npz"),
        c2ws=c2ws,
        ks=np.asarray(cams.ks),
        idxs=np.array(visible_poses),
    )


def load_tile_export(tile_dir: str) -> dict:
    """Load one exported tile (rendering.py:115-163 consumer side)."""
    feat = np.load(os.path.join(tile_dir, "feature.npz"))
    dec = np.load(os.path.join(tile_dir, "decoder.npz"))
    cams = np.load(os.path.join(tile_dir, "cams.npz"))
    return {
        "hash_layout": (
            str(feat["hash_layout"]) if "hash_layout" in feat else "global"
        ),
        # renderer-side consumers expect [L, H, F]; training state (and
        # hence new exports) is canonically flat [L, H*F]
        "features": (
            feat["features"].reshape(feat["features"].shape[0], -1, 2)
            if feat["features"].ndim == 2 else feat["features"]
        ),
        "occupied_grid": feat["occupied_grid"],
        "block_corner": feat["block_corner"],
        "block_size": feat["block_size"],
        "grid_log2dim": feat["grid_log2dim"],
        "resolution": feat["resolution"],
        "decoder_params": dec["params"],
        "c2ws": cams["c2ws"],
        "ks": cams["ks"],
        "idxs": cams["idxs"],
    }
