"""End-to-end training orchestration (the ``admm_trainer.py`` CLI rebuilt).

One SPMD program replaces the reference's master + per-GPU worker
processes (``admm_trainer.py:312-337``): tiles are stacked pytrees sharded
over the device mesh, sync rounds run SYN_ITERS steps + the consensus
collective inside jit, and everything the master did (z-update, residual
logging to ``admm_error.txt``, ``refined_camera.log``) happens in-program
or on the host between rounds.

Host-side duties per round boundary (matching ``tile.py``):
- eval renders with PSNR/SSIM every ``EVAL_STEP`` (tile.py:810-864),
- occupancy pruning on the GRID_LOG2DIM ladder every ADJUST_STEP
  (:866-877) — a static shape change, so the round function is rebuilt,
- checkpoints + pose snapshots (:800-808), final per-tile export and
  ``refined_camera.log`` (admm_trainer.py:182-184).
"""

from __future__ import annotations

import dataclasses
import glob
import os
import time
from datetime import datetime


def dataclass_replace(dc, **kw):
    return dataclasses.replace(dc, **kw)

import jax
import jax.numpy as jnp
import numpy as np

from scanerf_tpu.data import io as data_io
from scanerf_tpu.geometry.mesh_engine import ProxyMesh
from scanerf_tpu.models import field as field_lib
from scanerf_tpu.models import occupancy as occupancy_lib
from scanerf_tpu.parallel import tile_parallel as tp
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import checkpoint as ckpt_lib
from scanerf_tpu.train import tile as tile_lib
from scanerf_tpu.train.tile import TileData, TrainConfig
from scanerf_tpu.utils import lie, metrics
from scanerf_tpu.utils import rays as rays_mod


def read_block_idx_file(path: str) -> dict[int, list[int]]:
    """blocks/test.txt / novel.txt: "tile v0 v1 ..." lines
    (admm_trainer.py:43-66)."""
    out: dict[int, list[int]] = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) >= 1 and parts[0]:
                out[int(parts[0])] = [int(x) for x in parts[1:]]
    return out


class Trainer:
    def __init__(self, cfg, mesh_devices=None):
        self.cfg = cfg
        self.tc = TrainConfig.from_cfg(cfg)
        if self.tc.permute_mode != "sort":
            from scanerf_tpu.ops.pallas import hash_encode as _hw

            _hw.set_permute_mode(self.tc.permute_mode)
            _hw.set_run_cap_frac(self.tc.run_cap_frac)
        self.datadir = cfg.DATADIR
        self.tile_idxs: list[int] = list(cfg.TILES)

        runtime = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
        prefix = f"{cfg.PREFIX}-{runtime}" if cfg.PREFIX else runtime
        self.logdir = os.path.join(self.datadir, "logs", prefix)
        # two Trainers in the same second must not share a logdir (their
        # training.log lines would interleave): suffix until unique
        n = 0
        while os.path.exists(self.logdir):
            n += 1
            self.logdir = os.path.join(self.datadir, "logs", f"{prefix}.{n}")
        os.makedirs(self.logdir)

        # scene-level metadata
        self.ks_all, self.c2ws_all, self.H, self.W = data_io.read_campara(
            os.path.join(self.datadir, "camera.log"), return_shape=True
        )
        self.num_global_cams = self.ks_all.shape[0]
        self.tile_infos = data_io.read_tile_info(
            os.path.join(self.datadir, "tiles", "tile_info.txt")
        )
        self.training_views = data_io.read_training_views(
            os.path.join(self.datadir, "tiles", "training_views.txt")
        )
        self.test_idxs = read_block_idx_file(
            os.path.join(self.datadir, "blocks", "test.txt")
        )

        mesh_path = os.path.join(self.datadir, "mesh", "mesh.ply")
        self.fmesh = ProxyMesh(mesh_path) if os.path.exists(mesh_path) else None

        # pose noise table over ALL cameras (admm_trainer.py:112-115)
        noise_scale = float(cfg.TRAINING.CAMOPT.NOISE)
        rng = np.random.RandomState(cfg.SEED)
        self.noise_table = (
            noise_scale * rng.randn(self.num_global_cams, 6).astype(np.float32)
        )

        try:
            _, gt_c2ws = data_io.read_campara(
                os.path.join(self.datadir, "camera-gt.log")
            )
        except FileNotFoundError:
            gt_c2ws = None
        self.gt_c2ws = gt_c2ws

        self.mesh_devices = mesh_devices
        self.pruning = occupancy_lib.PruningSchedule(
            list(cfg.TRAINING.GRID_LOG2DIM),
            list(cfg.TRAINING.PRUNING_TH),
            cfg.TRAINING.ADJUST_STEP,
            total_step=cfg.TRAINING.TOTAL_STEP,
        )
        self._build_tiles()

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _views_for(self, tile_idx: int) -> list[int]:
        """Visible view list: MAX_POSES cap + test views (tile.py:164-170)."""
        views = list(dict.fromkeys(self.training_views[tile_idx]))
        views = views[: self.cfg.MAX_POSES]
        test = self.test_idxs.get(tile_idx, [])
        return list(dict.fromkeys(views + test))

    def _build_one_tile(self, tile_idx: int, max_cams: int):
        info = self.tile_infos[tile_idx]
        views = self._views_for(tile_idx)

        scene = data_io.load_scene(
            self.datadir, views,
            mono_depth=self.tc.w_depth > 0 or self.tc.w_smooth > 0,
            mono_normal=self.tc.w_smooth > 0,
        )
        views = scene.idx_list
        H, W = scene.H, scene.W

        # occupancy from the proxy mesh over the INNER bbox
        center = info.corner + info.size / 2.0
        size2 = info.size * 2.0
        min_bbox = center - size2 / 2.0
        log2 = int(self.cfg.TRAINING.GRID_LOG2DIM[0])
        if self.fmesh is not None:
            occ, _ = self.fmesh.voxelize(
                np.array([log2] * 3), min_bbox + size2 / 4.0, size2 / 2.0,
                init_outside=info.init_outside,
            )
        else:
            occ = None

        params, fstate = field_lib.create_field(
            jax.random.PRNGKey(self.cfg.SEED + tile_idx),
            bbox_corner=info.corner,
            bbox_size=info.size,
            log2_hashmap_size=self.cfg.HASHGRID.LOG2_HASHMAP_SIZE,
            grid_resolution=info.resolution,
            sampler_log2dim=log2,
            occupied_grid=occ,
            cubic_grid=True,
        )

        gt = (
            jnp.asarray(self.gt_c2ws[views]) if self.gt_c2ws is not None else None
        )
        cams = cam_lib.make_cameras(
            jnp.asarray(scene.ks), jnp.asarray(scene.c2ws),
            noise_se3=jnp.asarray(self.noise_table[views]),
            gt_c2ws=gt,
        )

        if self.fmesh is not None:
            self.fmesh.set(center, info.size / 2.0)
            occl = np.zeros((len(views), H, W), bool)
            rts = np.asarray(cams.rts)
            for i in range(len(views)):
                o, d = rays_mod.get_all_rays(
                    H, W, jnp.asarray(rts[i]), jnp.asarray(scene.ks[i])
                )
                occl[i] = np.asarray(
                    self.fmesh.render_mask(np.asarray(o), np.asarray(d))
                ).reshape(H, W)
        else:
            occl = np.ones((len(views), H, W), bool)

        zeros_hw = np.zeros((len(views), H, W), np.float32)
        # BG_MODE="BS": precompute per-camera mesh background depths
        # (FastMesh.compute_bgdepth) so the jitted step samples the mesh
        # window without host round-trips
        bg_depths = None
        if self.cfg.TRAINING.BG_MODE == "BS" and self.fmesh is not None:
            self.fmesh.set(center, info.size)  # full (doubled) half-size
            rts0 = np.asarray(cams.rts)
            bg_depths = np.zeros((len(views), H, W), np.float32)
            for i in range(len(views)):
                o, dvec = rays_mod.get_all_rays(
                    H, W, jnp.asarray(rts0[i]), jnp.asarray(scene.ks[i])
                )
                bg_z, has_bg, _ = self.fmesh.compute_bgdepth_batch(
                    np.asarray(o), np.asarray(dvec)
                )
                bg_depths[i] = np.where(has_bg, bg_z, 0.0).reshape(H, W)
            self.fmesh.set(center, info.size / 2.0)
        data = TileData(
            images=jnp.asarray(scene.images),
            occlusions=jnp.asarray(occl),
            cameras=cams,
            mono_depths=jnp.asarray(
                scene.mono_depths if scene.mono_depths is not None else zeros_hw
            ),
            mono_normals=jnp.asarray(
                scene.mono_normals
                if scene.mono_normals is not None
                else np.zeros((len(views), H, W, 3), np.float32)
            ),
            bg_depths=jnp.asarray(bg_depths) if bg_depths is not None else None,
        )
        # pad the camera dimension so all tiles share one pytree structure
        # (padded cameras are fully occluded -> contribute nothing)
        data = _pad_data_cams(data, max_cams)
        state = tile_lib.create_train_state(params, fstate, max_cams, self.tc)

        # resume: an explicit CKP directory (reference tile.py:37-45
        # globs cfg.CKP for checkpoint-*-{tile}.pt), else the datadir
        ckp_dir = str(self.cfg.get("CKP", "") or "") or self.datadir
        ckp = ckpt_lib.latest_checkpoint(ckp_dir, tile_idx)
        if ckp:
            state = ckpt_lib.load_checkpoint(ckp, state)
            print(f"tile {tile_idx}: resumed from {ckp}")
        return state, data, views, info

    def _build_tiles(self):
        max_cams = max(len(self._views_for(t)) for t in self.tile_idxs)
        self.states, self.datas, self.infos, self.view_lists = [], [], [], []
        for t in self.tile_idxs:
            state, data, views, info = self._build_one_tile(t, max_cams)
            self.states.append(state)
            self.datas.append(data)
            self.infos.append(info)
            self.view_lists.append(views)  # post ignore.log filtering
        self.cam_maps = tp.make_cam_maps(self.view_lists, max_cams)
        self.tx = tile_lib.build_optimizer(self.tc)

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------

    def run(self):
        cfg = self.cfg
        enable_admm = cfg.RHO > 0
        total = self.tc.total_step
        eval_step = int(cfg.get("EVAL_STEP", 1000))
        # independent mode still rounds at the eval cadence so periodic
        # eval renders / pose snapshots fire (the reference evaluates
        # inside its train loop every 1000 steps, tile.py:810-864).
        # MAX_ROUND_STEPS caps the steps fused into ONE device dispatch:
        # dispatches longer than ~1-2 minutes get killed by the transport
        # on some fabrics (observed as "TPU worker process crashed"); the
        # limit is wall-time, so the cap must hold for the EXPENSIVE
        # full-recipe step too. A boundary costs only dispatch overhead
        # (~ms).
        round_cap = int(cfg.get("MAX_ROUND_STEPS", 100))
        if enable_admm:
            # the round IS the consensus period — capping it would change
            # ADMM semantics, so only warn via config choice
            syn = cfg.SYN_ITERS
        else:
            syn = max(min(total, eval_step, round_cap), 1)

        mesh = tp.make_tile_mesh(
            self.mesh_devices, n_table=self.tc.table_shards,
            n_rays=self.tc.ray_shards,
        )
        self.mesh = mesh
        # pad tile count to a multiple of the TILE-axis size (the table
        # axis shares one tile's work; it does not consume tiles)
        n_dev = int(mesh.shape["tiles"])
        while len(self.states) % n_dev != 0:
            self.states.append(self.states[-1])
            self.datas.append(self.datas[-1])
            self.cam_maps = np.concatenate(
                [self.cam_maps, np.full((1, self.cam_maps.shape[1]), -1, np.int32)]
            )

        tiles = tp.stack_tiles(self.states, self.cam_maps)
        data = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *self.datas)
        tiles, data = tp.shard_parallel(mesh, tiles, data)

        round_fn = tp.build_admm_round(
            mesh, self.tc, self.tx, syn, self.num_global_cams,
            tiles_example=tiles,
        )
        key = jax.random.PRNGKey(cfg.SEED)
        step = int(tiles.state.step[0])
        log_path = os.path.join(self.logdir, "training.log")
        admm_path = os.path.join(self.logdir, "admm_error.txt")

        while step < total:
            key, sub = jax.random.split(key)
            t0 = time.time()
            tiles, losses, aux = round_fn(tiles, data, sub)
            losses = np.asarray(losses)
            step = int(tiles.state.step[0])
            dt = time.time() - t0
            with open(log_path, "a") as f:
                f.write(
                    f"step {step}\tloss {losses[:len(self.tile_idxs)].mean():.6f}\t"
                    f"{dt:.1f}s/round\n"
                )
            if enable_admm:
                with open(admm_path, "a") as f:
                    f.write(
                        f"primal_residual: {float(aux.primal_residual):.8f}\t"
                        f"dual_residual: {float(aux.dual_residual):.8f}\n"
                    )

            if self.pruning.should_prune(step, round_size=syn):
                tiles, round_fn = self._prune(tiles, mesh, syn, step)

            update_mask_step = int(cfg.get("UPDATE_MASK_STEP", 10000))
            if step % update_mask_step < syn and step >= update_mask_step:
                data = self._refresh_occlusion_masks(tiles, data)

            if step % eval_step < syn and step > 0:
                self._eval(tiles, step)

            # periodic checkpoints so a killed long run resumes via CKP
            # (the reference only checkpoints at export, tile.py:534-572;
            # this fabric kills long jobs, so opt-in mid-run saves)
            ckpt_step = int(cfg.get("CKPT_STEP", 0))
            if ckpt_step > 0 and step % ckpt_step < syn and step < total:
                self._save_round_checkpoints(tiles, step)

        self._export(tiles)
        return tiles

    def _save_round_checkpoints(self, tiles, step: int):
        """Write checkpoint-{step}-{tile}.npz for every real tile and
        drop older periodic saves (one live generation per tile)."""
        states = _unstack(tiles.state, len(self.tile_idxs))
        for i, tile_idx in enumerate(self.tile_idxs):
            path = ckpt_lib.checkpoint_path(self.logdir, step, tile_idx)
            ckpt_lib.save_checkpoint(path, states[i])
            for old in glob.glob(
                os.path.join(self.logdir, f"checkpoint-*-{tile_idx}.npz")
            ):
                if old != path:
                    os.remove(old)

    # ------------------------------------------------------------------

    def _prune(self, tiles, mesh, syn, step):
        """Re-derive every tile's occupancy; rebuild the round fn (the
        grid is a static shape)."""
        sub_split, th = self.pruning.next_at(step)
        states = _unstack(tiles.state, len(self.tile_idxs))
        new_states = []
        for i, s in enumerate(states):
            finest = np.asarray(s.field_state.resolutions[-1])
            fs = occupancy_lib.prune_occupancy(
                s.params.field, s.field_state, step, finest, sub_split, th,
                # features here are global-shaped (outside shard_map), so
                # H is already the full table size
                backend=field_lib.effective_backend(
                    self.tc.hash_backend, field_lib.table_rows(s.params.field.features)
                ),
            )
            new_states.append(s.replace(field_state=fs))
        n_pad = tiles.cam_map.shape[0] - len(new_states)
        new_states += [new_states[-1]] * n_pad
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *new_states)
        tiles = tiles.replace(state=stacked)
        round_fn = tp.build_admm_round(
            mesh, self.tc, self.tx, syn, self.num_global_cams,
            tiles_example=tiles,
        )
        print(f"step {step}: pruned occupancy (n_split={sub_split}, th={th})")
        return tiles, round_fn

    def _refresh_occlusion_masks(self, tiles, data):
        """Cross-tile occlusion-mask refresh (tile.py:366-475).

        Each tile renders half-res depth from its LIVE field for its
        overlap cameras whose center lies inside the tile and publishes it
        per global camera id (``render_shared_depth``); every other tile
        then re-derives the occlusion mask of such cameras — a pixel stays
        trainable only when the published depth lies beyond this tile's
        entry — eroded with the reference's 91-wide box kernel
        (``update_occlusion_mask``). Host-orchestrated between sync
        rounds; the published maps are tiny (half resolution).
        """
        import cv2

        H, W = self.H, self.W
        states = _unstack(tiles.state, len(self.tile_idxs))
        shared_depth: dict[int, np.ndarray] = {}

        # phase 1: publish half-res depths — all qualifying views of a
        # tile render in ONE packed chunk stream (render_depth_batch)
        for i, tile_idx in enumerate(self.tile_idxs):
            s = states[i]
            info = self.infos[i]
            center = info.corner + info.size / 2.0
            half = info.size / 2.0
            cams = self.datas[i].cameras
            rts = np.asarray(cam_lib.get_rts(cams, s.params.se3_refine))
            inside = []
            for li, gv in enumerate(self.view_lists[i]):
                eye = -rts[li][:, :3].T @ rts[li][:, 3]
                if np.all(np.abs(eye - center) < half):
                    inside.append((li, gv))
            if not inside:
                continue
            depths = tile_lib.render_depth_batch(
                s, cams, [li for li, _ in inside], H // 2, W // 2,
                dataclass_replace(self.tc, num_march=min(self.tc.num_march, 256)),
                chunk=2**14,
                # scale intrinsics to the half-res raster: without this
                # the half-res grid covers only the top-left quadrant of
                # the image plane (review finding); per-axis ratios keep
                # odd native resolutions exact
                k_scale=((W // 2) / W, (H // 2) / H),
            )
            for k, (_, gv) in enumerate(inside):
                shared_depth[gv] = depths[k]

        if not shared_depth:
            return data

        # phase 2: update masks on tiles NOT containing those cameras
        kernel = np.ones((91, 91), np.uint8)
        new_datas = []
        changed = False
        for i, tile_idx in enumerate(self.tile_idxs):
            d = self.datas[i]
            info = self.infos[i]
            center = info.corner + info.size / 2.0
            half = info.size / 2.0
            occl = np.asarray(d.occlusions).copy()
            s = states[i]
            cams = d.cameras
            rts = np.asarray(cam_lib.get_rts(cams, s.params.se3_refine))
            for li, gv in enumerate(self.view_lists[i]):
                if gv not in shared_depth:
                    continue
                eye = -rts[li][:, :3].T @ rts[li][:, 3]
                if np.all(np.abs(eye - center) < half):
                    continue  # the publishing tile itself
                o, rd = rays_mod.get_all_rays(
                    H, W, jnp.asarray(rts[li]), jnp.asarray(cams.ks[li])
                )
                from scanerf_tpu.ops.intersect import ray_aabb

                b = np.asarray(
                    ray_aabb(o, rd, jnp.asarray(center), jnp.asarray(half))
                )
                up = np.repeat(
                    np.repeat(shared_depth[gv], 2, axis=0), 2, axis=1
                )
                # odd native dims: 2*(H//2) = H-1 — edge-pad to full res
                if up.shape[0] < H or up.shape[1] < W:
                    up = np.pad(
                        up,
                        ((0, H - up.shape[0]), (0, W - up.shape[1])),
                        mode="edge",
                    )
                depth = up[:H, :W].reshape(-1)
                mask = (depth > b[:, 0]) & (b[:, 0] != -1)
                mask = mask.reshape(H, W).astype(np.uint8)
                # reference: dilate the INVALID region with a 91-box
                mask = 1 - cv2.dilate(1 - mask, kernel)
                occl[li] = mask.astype(bool)
                changed = True
            new_datas.append(d.replace(occlusions=jnp.asarray(occl)))
        if not changed:
            return data
        self.datas = new_datas
        n_pad = tiles.cam_map.shape[0] - len(new_datas)
        stack = new_datas + [new_datas[-1]] * n_pad
        new_data = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stack)
        _, new_data = tp.shard_parallel(self.mesh, tiles, new_data)
        print(f"refreshed occlusion masks from {len(shared_depth)} shared depths")
        return new_data

    def _eval(self, tiles, step):
        import cv2

        states = _unstack(tiles.state, len(self.tile_idxs))
        for i, tile_idx in enumerate(self.tile_idxs):
            views = self.view_lists[i]
            test = self.test_idxs.get(tile_idx, [])
            eval_local = [views.index(v) for v in test if v in views] or [0]
            data = self.datas[i]
            s = states[i]
            for li in eval_local[:1]:
                out = tile_lib.render_image(
                    s, data.cameras, li, self.H, self.W, self.tc
                )
                gt = np.asarray(data.images[li])
                p = float(metrics.psnr(jnp.asarray(out["rgb"]), jnp.asarray(gt)))
                ss = float(metrics.ssim(jnp.asarray(out["rgb"]), jnp.asarray(gt)))
                panel = np.concatenate([out["rgb"], gt], axis=1)
                cv2.imwrite(
                    os.path.join(
                        self.logdir,
                        f"eval-tile{tile_idx}-{step}-{p:.2f}-{ss:.4f}.png",
                    ),
                    (np.clip(panel, 0, 1) * 255).astype(np.uint8),
                )
                with open(
                    os.path.join(self.logdir, "training.log"), "a"
                ) as f:
                    f.write(
                        f"step {step} tile {tile_idx} "
                        f"eval_psnr {p:.4f} eval_ssim {ss:.6f}\n"
                    )
            # pose snapshot (tile.py:800-808)
            np.savez(
                os.path.join(self.logdir, f"cams-tile{tile_idx}-{step}.npz"),
                se3_refine=np.asarray(s.params.se3_refine),
            )
            # pose error vs GT when camera-gt.log exists (CAM.evaluate,
            # camera_utils.py:115-121; upstream call commented out)
            if self.gt_c2ws is not None:
                n_real = len(views)
                r_deg, t_err = cam_lib.evaluate_camera_alignment(
                    _slice_cams(data.cameras, n_real),
                    s.params.se3_refine[:n_real],
                )
                with open(os.path.join(self.logdir, "training.log"), "a") as f:
                    f.write(
                        f"step {step} tile {tile_idx} pose_err "
                        f"R {float(r_deg):.4f}deg t {float(t_err):.6f}\n"
                    )

    def _export(self, tiles):
        states = _unstack(tiles.state, len(self.tile_idxs))
        shared_avg = np.zeros((self.num_global_cams, 6), np.float32)
        counts = np.zeros(self.num_global_cams, np.float32)
        for i, tile_idx in enumerate(self.tile_idxs):
            s = states[i]
            out_dir = os.path.join(self.logdir, f"tile-{tile_idx}")
            n_real = len(self.view_lists[i])
            cams = _slice_cams(self.datas[i].cameras, n_real)
            s_real = _slice_state_cams(s, n_real)
            eff = field_lib.effective_backend(
                self.tc.hash_backend, field_lib.table_rows(s.params.field.features)
            )
            ckpt_lib.export_tile(
                out_dir, s_real, cams, self.view_lists[i],
                hash_layout="windowed" if eff == "windowed" else "global",
            )
            ckpt_lib.save_checkpoint(
                ckpt_lib.checkpoint_path(self.logdir, int(s.step), tile_idx),
                s,
            )
            se3 = np.asarray(s.params.se3_refine)[:n_real]
            for j, v in enumerate(self.view_lists[i]):
                shared_avg[v] += se3[j]
                counts[v] += 1
        # refined_camera.log (admm_trainer.py:182-184). Documented fix
        # over the reference: training poses are exp(refine) o exp(noise)
        # o ori (camera_utils.py:56 applies the noise table to the base),
        # but admm_trainer.py:182 writes exp(refine) o ori — under
        # injected noise the log misaligns from the trained geometry by
        # exactly the noise (measured -3.5 dB on the 8-tile city render,
        # PERF.md). Compose the known noise in; zero noise reduces to the
        # reference composition bit-for-bit.
        shared_avg /= np.maximum(counts, 1)[:, None]
        ori_rts = lie.invert(jnp.asarray(self.c2ws_all))
        base_rts = lie.compose(
            [lie.se3_to_SE3(jnp.asarray(self.noise_table)), ori_rts]
        )
        refined_rts = lie.compose(
            [lie.se3_to_SE3(jnp.asarray(shared_avg)), base_rts]
        )
        refined_c2ws = np.asarray(lie.invert(refined_rts))
        data_io.write_campara(
            os.path.join(self.logdir, "refined_camera.log"),
            self.ks_all, refined_c2ws, self.H, self.W,
        )
        print(f"exported tiles + refined cameras to {self.logdir}")


# ---------------------------------------------------------------------------
# padding / slicing helpers
# ---------------------------------------------------------------------------

def _pad_data_cams(data: TileData, max_cams: int) -> TileData:
    n = data.images.shape[0]
    if n == max_cams:
        return data
    pad = max_cams - n

    def padx(x, identity=False):
        if identity:
            extra = jnp.broadcast_to(x[-1:], (pad, *x.shape[1:]))
        else:
            extra = jnp.zeros((pad, *x.shape[1:]), x.dtype)
        return jnp.concatenate([x, extra])

    cams = data.cameras
    cams = cams.replace(
        ks=padx(cams.ks, True), rts=padx(cams.rts, True), gt_rts=padx(cams.gt_rts, True)
    )
    return TileData(
        images=padx(data.images),
        occlusions=padx(data.occlusions),
        cameras=cams,
        mono_depths=padx(data.mono_depths),
        mono_normals=padx(data.mono_normals),
        # BS-mode mesh background depths must pad too: dropping the field
        # crashes jnp.stack over tiles with unequal camera counts (some
        # tiles None, some arrays) or silently falls back to IZ sampling
        bg_depths=(
            padx(data.bg_depths) if data.bg_depths is not None else None
        ),
    )


def _slice_cams(cams, n):
    return cams.replace(ks=cams.ks[:n], rts=cams.rts[:n], gt_rts=cams.gt_rts[:n])


def _slice_state_cams(state, n):
    params = state.params.replace(se3_refine=state.params.se3_refine[:n])
    return state.replace(params=params)


def _unstack(stacked, n):
    return [
        jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)
    ]
