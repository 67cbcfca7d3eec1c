"""Per-tile training: state, optimizers, and the jitted train step.

JAX rebuild of ``tile.py`` (class ``TILE``). One tile's trainables are a
single pytree (hash features + decoder + se3 pose refinements) updated by
an optax ``multi_transform`` that mirrors the reference's two Adam
optimizers (``tile.py:299-343``):

- hash features: Adam(lr=ETA.HASH_FEATURE, betas=(0.9, 0.99), eps=1e-15),
- decoder: Adam(lr=ETA.DECODER, defaults, additive weight decay 1e-6),
- se3_refine: Adam(lr=ETA.CAM, defaults), gated by CAMOPT.START_STEPS,

each with the exponential decay schedule of ``scheduler.py`` ending at
0.1x the base lr at TOTAL_STEP.

The training step (``tile.py:880-1015``) samples 2x2 pixel patches (the
same patch set replicated across cameras, a reference quirk we preserve —
``tile.py:907-915``), renders fg+bg, and applies the loss registry of
``criterions.py`` with its warm-up/decay schedules. Everything is one jit
region; there is no host round-trip inside the step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from scanerf_tpu.models import field as field_lib
from scanerf_tpu.models.field import FieldParams, FieldState
from scanerf_tpu.train import cameras as cam_lib
from scanerf_tpu.train import losses
from scanerf_tpu.train.cameras import Cameras
from scanerf_tpu.train.scheduler import exp_window_schedule


# ---------------------------------------------------------------------------
# static training config (hashable -> usable as jit static arg)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_sample: int = 128
    num_bg_sample: int = 128
    batch_log2: int = 14
    total_step: int = 40000
    num_march: int = 512
    # loss weights (0 disables the loss branch entirely — static)
    w_rgb: float = 1.0
    w_warp: float = 0.0
    w_depth: float = 0.0
    w_smooth: float = 0.0
    warp_warming: bool = True
    rgb_start: int = 0
    warp_start: int = 0
    depth_start: int = 0
    smooth_start: int = 0
    alpha: float = 10.0
    gamma: float = 20.0
    # The documented TPU recipe deviates from the reference on two
    # warp-loss cost knobs, each validated by a full-weight (warm-up
    # disabled, weight 1.0 from step 0) 1200-step A/B:
    # - WARP_TOP_K 5 (reference: 10, warp_loss.py top-K neighbor
    #   selection): PSNR identical to 0.004 dB, pose within noise, at
    #   1.74x wall speed (PERF.md r4d);
    # - vis gate re-render at 16/8/64 (reference re-renders at the full
    #   training counts, warp_loss.py:355-377): PSNR identical to
    #   0.002 dB at every eval (PERF.md r5a).
    # Set WARP_TOP_K: 10 and WARP_VIS_* = the main sample counts for
    # exact reference parity.
    warp_top_k: int = 5
    warp_vis_sample: int = 16
    warp_vis_bg_sample: int = 8
    warp_vis_march: int = 64
    rho: float = 0.0
    syn_start: int = 0
    invalid_underground: bool = False
    bg_mode: str = "IZ"  # "IZ" inverse-z | "BS" mesh-guided window
    # optimizer
    eta_hash: float = 1e-3
    eta_decoder: float = 1e-3
    eta_cam: float = 1e-4
    cam_enable: bool = True
    cam_start_steps: int = 0
    l2_specular_weight: float = 0.01  # hard-coded in the step (tile.py:999)
    # TPU perf knob for the "xla" backend: unbiased stochastic-corner
    # table gradients cut the backward scatter rows 8x
    # (ops/hash_encode.py; PERF.md). Forward is exactly trilinear either
    # way. OFF by default: exact reference gradients; the production
    # "windowed" backend computes exact gradients regardless.
    stochastic_hash_grad: bool = False
    # sparse Adam for the hash table (the reference's vdbAdam capability:
    # zero-grad entries are fully skipped — cuda/adam_kernel.cu:46-51).
    # Off by default for parity with the shipped trainer's dense Adam.
    sparse_adam: bool = False
    # Route occlusion-masked / zero-occupancy rays' points to the
    # stream's sentinel window so whole-dead chunks skip the hash
    # kernels and decoder (ops/pallas/hash_encode.py sort_pack ``dead``;
    # reference role: boolean compression at tile.py:940). Loss-exact —
    # dead outputs were multiplied by zero before, are zeros now.
    compact_dead_rays: bool = True
    # "xla" = global prime-XOR hash via XLA gather (reference semantics);
    # "windowed" = merged fg+bg sorted-stream Pallas kernel (TPU prod path).
    # The YAML path (config.DEFAULTS / from_cfg) resolves to "windowed" —
    # the production default; this DATACLASS default stays "xla" only for
    # direct constructors (CPU tests and oracle comparisons, where the
    # windowed kernel would run in slow Pallas interpret mode).
    hash_backend: str = "xla"
    # >1 shards the hash table (and its Adam moments) along H over a
    # "table" device-mesh axis (parallel/table_parallel.py) — the
    # reference-default 2^24 tables don't fit one 16G chip with moments.
    # Requires hash_backend="windowed" and the train step to run inside a
    # shard_map over a mesh with a "table" axis of this size
    # (tile_parallel.make_mesh(n_table=...)).
    table_shards: int = 1
    # >1 replicates each tile over a "rays" mesh axis for ray-batch data
    # parallelism (parallel/ray_parallel.py): independent batches per
    # replica, gradients pmean'd — effective batch n_rays * 2**batch_log2
    ray_shards: int = 1
    # backward one-hot scatter in bf16 with f32 accumulation (windowed
    # backend; ops/pallas/hash_encode._bwd_kernel) — only the per-point
    # weighted-gradient operand rounds (2^-8 relative)
    hash_bwd_bf16: bool = False
    # run the ShallowMLP inside the windowed hash kernels (exact fwd+bwd,
    # ops/pallas/fused_train.py); ignored off the windowed backend and
    # under table sharding (sharded streams psum FEATURES)
    fused_decoder: bool = True
    # permutation machinery for the sorted stream: "sort" | "gather" |
    # "gather_narrow" | "runs" (hash_encode.set_permute_mode;
    # bitwise-identical outputs, per-fabric winner). Applied
    # process-wide at Trainer init.
    permute_mode: str = "sort"
    # static run-table capacity for permute_mode="runs", as a fraction
    # of the stream length (hash_encode.set_run_cap_frac; overflowing
    # streams fall back to the sorted path inside a lax.cond)
    run_cap_frac: float = 0.25

    @classmethod
    def from_cfg(cls, cfg) -> "TrainConfig":
        T = cfg.TRAINING
        L = T.LOSS
        return cls(
            num_sample=T.NUM_SAMPLE,
            num_bg_sample=T.NUM_BG_SAMPLE,
            batch_log2=T.BS_LOG2DIM,
            total_step=T.TOTAL_STEP,
            num_march=T.get("NUM_MARCH", 512),
            w_rgb=L.WEIGHT_RGB_LOSS,
            w_warp=L.WEIGHT_WARP_LOSS,
            w_depth=L.WEIGHT_DEPTH_LOSS,
            w_smooth=L.WEIGHT_DEPTH_SMOOTH_LOSS,
            warp_warming=L.WARP_WARPING,
            rgb_start=L.RGB_LOSS_START,
            warp_start=L.WARP_LOSS_START,
            depth_start=L.DEPTH_LOSS_START,
            smooth_start=L.DEPTH_SMOOTH_LOSS_START,
            alpha=L.ALPHA,
            gamma=L.GAMMA,
            rho=cfg.RHO,
            syn_start=cfg.SYN_START,
            invalid_underground=cfg.INVALID_UNDERGROUND,
            bg_mode=T.BG_MODE,
            eta_hash=T.ETA.HASH_FEATURE,
            eta_decoder=T.ETA.DECODER,
            eta_cam=T.ETA.CAM,
            cam_enable=T.CAMOPT.ENABLE,
            cam_start_steps=T.CAMOPT.START_STEPS,
            hash_backend=T.get("HASH_BACKEND", "windowed"),
            table_shards=T.get("TABLE_SHARDS", 1),
            ray_shards=T.get("RAY_SHARDS", 1),
            hash_bwd_bf16=T.get("HASH_BWD_BF16", False),
            fused_decoder=T.get("FUSED_DECODER", True),
            compact_dead_rays=T.get("COMPACT_DEAD_RAYS", True),
            permute_mode=T.get("PERMUTE_MODE", "sort"),
            run_cap_frac=T.get("RUN_CAP_FRAC", 0.25),
            stochastic_hash_grad=T.get("STOCHASTIC_HASH_GRAD", False),
            warp_vis_sample=L.get("WARP_VIS_SAMPLE", 16),
            warp_vis_bg_sample=L.get("WARP_VIS_BG_SAMPLE", 8),
            warp_vis_march=L.get("WARP_VIS_MARCH", 64),
            warp_top_k=L.get("WARP_TOP_K", 5),
        )


# ---------------------------------------------------------------------------
# pytrees
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class TileParams:
    field: FieldParams
    se3_refine: jax.Array  # [N_cam, 6]


@flax.struct.dataclass
class AdmmState:
    """Per-tile ADMM variables (consensus.py:16-21)."""

    shared_se3: jax.Array  # z  [N, 6]
    delta_se3: jax.Array  # scaled dual u  [N, 6]
    overlap_flags: jax.Array  # [N] bool
    rho: jax.Array  # [6]


@flax.struct.dataclass
class TrainState:
    params: TileParams
    opt_state: Any
    field_state: FieldState
    admm: AdmmState
    step: jax.Array  # int32 scalar


@flax.struct.dataclass
class TileData:
    """Per-tile training data, resident in device memory."""

    images: jax.Array  # [N, H, W, 3] float32
    occlusions: jax.Array  # [N, H, W] bool
    cameras: Cameras
    mono_depths: jax.Array  # [N, H, W] (zeros if unused)
    mono_normals: jax.Array  # [N, H, W, 3] (zeros if unused)
    # mesh background depths for BG_MODE="BS" (FastMesh.compute_bgdepth);
    # zeros when unused (IZ mode)
    bg_depths: jax.Array = None


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------

def build_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    hash_sched = exp_window_schedule(tc.eta_hash, 0.1 * tc.eta_hash, tc.total_step)
    dec_sched = exp_window_schedule(tc.eta_decoder, 0.1 * tc.eta_decoder, tc.total_step)
    cam_sched = exp_window_schedule(
        tc.eta_cam, 0.1 * tc.eta_cam, tc.total_step,
        start_itr=tc.cam_start_steps, end_itr=tc.total_step,
    )
    if tc.sparse_adam:
        from scanerf_tpu.train.sparse_adam import scale_by_sparse_adam

        hash_moments = scale_by_sparse_adam(b1=0.9, b2=0.99, eps=1e-15)
    else:
        hash_moments = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    tx_hash = optax.chain(
        hash_moments,
        optax.scale_by_learning_rate(hash_sched),
    )
    # torch Adam weight_decay adds wd*param to the gradient BEFORE moments
    tx_dec = optax.chain(
        optax.add_decayed_weights(1e-6),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(dec_sched),
    )
    tx_cam = (
        optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(cam_sched),
        )
        if tc.cam_enable
        else optax.set_to_zero()
    )

    def label_fn(params: TileParams):
        return TileParams(
            field=FieldParams(
                features="hash",
                decoder=jax.tree_util.tree_map(lambda _: "decoder", params.field.decoder),
            ),
            se3_refine="cam",
        )

    return optax.multi_transform(
        {"hash": tx_hash, "decoder": tx_dec, "cam": tx_cam}, label_fn
    )


def create_train_state(
    field_params: FieldParams,
    field_state: FieldState,
    num_camera: int,
    tc: TrainConfig,
) -> TrainState:
    params = TileParams(
        field=field_params, se3_refine=cam_lib.init_se3_refine(num_camera)
    )
    tx = build_optimizer(tc)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        field_state=field_state,
        admm=AdmmState(
            shared_se3=jnp.zeros((num_camera, 6)),
            delta_se3=jnp.zeros((num_camera, 6)),
            overlap_flags=jnp.zeros((num_camera,), bool),
            rho=jnp.full((6,), tc.rho, jnp.float32),
        ),
        step=jnp.asarray(0, jnp.int32),
    )


# ---------------------------------------------------------------------------
# loss computation
# ---------------------------------------------------------------------------

def _gate(step, start, end=10**9):
    """LossItem window: active when start < step < end (criterions.py:76)."""
    return ((step > start) & (step < end)).astype(jnp.float32)


def compute_losses(
    params: TileParams,
    field_state: FieldState,
    admm: AdmmState,
    data: TileData,
    ray_idx: jax.Array,
    pixel_locs: jax.Array,
    step: jax.Array,
    tc: TrainConfig,
) -> tuple[jax.Array, dict]:
    """Render the sampled rays and evaluate the loss registry."""
    N_cam, H, W = data.images.shape[:3]
    B = ray_idx.shape[0]
    stepf = step.astype(jnp.float32)

    xy = jnp.stack(
        [(ray_idx % W).astype(jnp.float32) + 0.5, (ray_idx // W).astype(jnp.float32) + 0.5],
        axis=-1,
    )  # [B, 2]
    rays_o, rays_d = cam_lib.get_rays(data.cameras, params.se3_refine, xy)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)

    gt_color = data.images.reshape(N_cam, H * W, 3)[:, ray_idx].reshape(-1, 3)
    occl = data.occlusions.reshape(N_cam, H * W)[:, ray_idx].reshape(-1)

    bg_z = None
    if tc.bg_mode == "BS" and data.bg_depths is not None:
        from scanerf_tpu.ops.sampling import background_window_sampling

        bgd = data.bg_depths.reshape(N_cam, H * W)[:, ray_idx].reshape(-1)
        bg_z = background_window_sampling(
            rays_o, rays_d, bgd,
            field_state.min_bbox + field_state.bbox_size / 2.0,
            field_state.bbox_size,
            tc.num_bg_sample,
            # bbox_size.max()/10 (hashgrid/__init__.py:299)
            jnp.max(field_state.bbox_size) / 10.0,
        )
    out = field_lib.render_rays(
        params.field, field_state, rays_o, rays_d,
        tc.num_sample, tc.num_bg_sample, stepf,
        occlusion_mask=occl, train=True,
        invalid_underground=tc.invalid_underground,
        num_march=tc.num_march,
        stochastic_grad=tc.stochastic_hash_grad,
        bg_z=bg_z,
        backend=tc.hash_backend,
        table_axis="table" if tc.table_shards > 1 else None,
        table_shards=tc.table_shards,
        bwd_onehot_bf16=tc.hash_bwd_bf16,
        fused_decoder=tc.fused_decoder,
        compact_dead=tc.compact_dead_rays,
    )
    valid = out["fore_valid"] | out["bg_valid"]

    aux = {}
    loss = tc.l2_specular_weight * out["l2_reg_specular"]

    if tc.w_rgb > 0:
        l_rgb = losses.rgb_loss(out["pred_color"], gt_color, valid)
        loss = loss + tc.w_rgb * _gate(stepf, tc.rgb_start) * l_rgb
        aux["rgb_loss"] = l_rgb

    if tc.w_depth > 0:
        mono_d = data.mono_depths.reshape(N_cam, H * W)[:, ray_idx][..., None]
        rend_d = out["pred_depth"].reshape(N_cam, B, 1)
        mask = valid.reshape(N_cam, B, 1).astype(jnp.float32)
        l_d = losses.depth_consistency_loss(rend_d, mono_d, mask)
        w = losses.depth_weight_decay(tc.w_depth, jnp.maximum(stepf - tc.depth_start, 0.0))
        loss = loss + w * _gate(stepf, tc.depth_start, tc.total_step) * l_d
        aux["depth_loss"] = l_d

    if tc.w_smooth > 0:
        mono_n = data.mono_normals.reshape(N_cam, H * W, 3)[:, ray_idx]
        rend_d = out["pred_depth"].reshape(N_cam, B, 1)
        mask = valid.reshape(N_cam, B, 1)
        l_s = losses.depth_smooth_loss(
            data.cameras.ks, pixel_locs, rend_d, mono_n, mask
        )
        w = losses.depth_weight_decay(tc.w_smooth, jnp.maximum(stepf - tc.smooth_start, 0.0))
        loss = loss + w * _gate(stepf, tc.smooth_start, tc.total_step) * l_s
        aux["smooth_loss"] = l_s

    if tc.w_warp > 0:
        l_w = _warp_loss(params, field_state, data, out, gt_color, valid, stepf, tc)
        w = (
            losses.warp_warmup(tc.w_warp, jnp.maximum(stepf - tc.warp_start, 0.0))
            if tc.warp_warming
            else tc.w_warp
        )
        loss = loss + w * _gate(stepf, tc.warp_start) * l_w
        aux["warp_loss"] = l_w

    if tc.rho > 0:
        l_admm = losses.admm_penalty(
            params.se3_refine, admm.shared_se3, admm.delta_se3,
            admm.overlap_flags, admm.rho,
        )
        loss = loss + _gate(stepf, tc.syn_start, tc.total_step) * l_admm
        aux["admm_loss"] = l_admm

    aux["total_loss"] = loss
    aux["psnr_batch"] = -10.0 * jnp.log10(
        jnp.maximum(losses.rgb_loss(out["pred_color"], gt_color, valid), 1e-10)
    )
    # per-camera photometric score for the ADMM confidence EMA
    # (update_confidence, tile.py:354-360; disabled by default upstream)
    err = jnp.mean(jnp.abs(out["pred_color"] - gt_color), axis=-1)  # [N*B]
    vc = valid.reshape(N_cam, B).astype(err.dtype)
    score = 1.0 - jnp.sum(err.reshape(N_cam, B) * vc, axis=1) / jnp.maximum(
        jnp.sum(vc, axis=1), 1.0
    )
    aux["confidence_score"] = score
    return loss, aux


def _warp_loss(params, field_state, data, out, gt_color, valid, stepf, tc):
    """Multi-view photometric warp loss (warp_loss.py:523-660)."""
    N_cam, H, W = data.images.shape[:3]
    rays_o, rays_d = out["rays_o"], out["rays_d"]
    depth = out["pred_depth"]
    pts = rays_o + depth * rays_d  # grads -> depth -> field, and poses

    rts = cam_lib.get_rts(data.cameras, params.se3_refine)
    # tiles with fewer cameras than the reference K=10 clamp K (the
    # cost-threshold validity mask already rejects bad neighbors)
    top_k = min(tc.warp_top_k, N_cam)
    nei_views, nei_valid = losses.view_selection(
        jax.lax.stop_gradient(pts), rays_o, rays_d,
        data.cameras.ks, jax.lax.stop_gradient(rts), H, W, top_k,
    )
    grid, nei_o, nei_d, proj_depth = losses.project_to_neighbors(
        pts, data.cameras.ks, rts, nei_views
    )
    nei_color, nei_valid = losses.sample_neighbor_color(
        grid, nei_views, nei_valid, data.images, data.occlusions
    )

    # no-grad visibility re-render along neighbor rays (warp_loss.py:355-377)
    B, K = nei_views.shape
    flat_o = jax.lax.stop_gradient(nei_o.reshape(-1, 3))
    flat_d = jax.lax.stop_gradient(nei_d.reshape(-1, 3))
    nei_out = field_lib.render_rays(
        jax.tree_util.tree_map(jax.lax.stop_gradient, params.field),
        field_state, flat_o, flat_d,
        tc.warp_vis_sample, tc.warp_vis_bg_sample, stepf,
        train=False, invalid_underground=tc.invalid_underground,
        num_march=tc.warp_vis_march,
        backend=tc.hash_backend,
        table_axis="table" if tc.table_shards > 1 else None,
        table_shards=tc.table_shards,
        fused_decoder=tc.fused_decoder,
        compact_dead=tc.compact_dead_rays,
    )
    # voxel size = max(tile_size / finest hash resolution) (warp_loss.py:150)
    voxel = jnp.max(
        field_state.bbox_size / jnp.max(field_state.resolutions[-1]).astype(jnp.float32)
    )
    vis = jnp.exp(
        -tc.alpha
        * jnp.abs(nei_out["pred_depth"].reshape(B, K, 1) - proj_depth)
        / voxel
    )
    nei_diffuse = losses.soft_diffuse(
        nei_out["pred_specular"].reshape(B, K, 3), tc.gamma
    )
    score = jnp.where(nei_valid[..., None], vis * nei_diffuse, 0.0)
    ref_diffuse = jax.lax.stop_gradient(
        losses.soft_diffuse(out["pred_specular"], tc.gamma)
    )
    score = score * ref_diffuse[:, None, :]

    pred_color = jnp.clip(out["pred_diffuse"] + out["pred_specular"], 0.0, 1.0)
    return losses.warp_loss_value(pred_color, nei_color, score, valid, top_k)


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------

def sample_patches(key: jax.Array, H: int, W: int, num_patch: int):
    """Patch sampling as tile.py:902-915: independent x/y permutations."""
    kx, ky = jax.random.split(key)
    if num_patch <= W - 2:
        patch_x = jax.random.permutation(kx, W - 2)[:num_patch]
    else:  # more patches than columns: sample with replacement
        patch_x = jax.random.randint(kx, (num_patch,), 0, W - 2)
    if num_patch <= H - 2:
        patch_y = jax.random.permutation(ky, H - 2)[:num_patch]
    else:
        patch_y = jax.random.randint(ky, (num_patch,), 0, H - 2)
    patch_idx = patch_y * W + patch_x
    offsets = jnp.array([0, 1, W, W + 1], dtype=patch_idx.dtype)
    ray_idx = (patch_idx[:, None] + offsets[None, :]).reshape(-1)
    loc_x = ray_idx % W
    loc_y = ray_idx // W
    pixel_locs = jnp.stack([loc_x, loc_y], axis=-1)
    return ray_idx, pixel_locs


def compute_grads(
    state: TrainState, data: TileData, key: jax.Array, tc: TrainConfig
):
    """Sample a ray batch and return ``((loss, aux), grads)`` — the
    differentiation half of ``train_step``, split out so ray-data-parallel
    wrappers (parallel/ray_parallel.py) and tests can average gradients
    across batch shards before the optimizer update."""
    N_cam, H, W = data.images.shape[:3]
    num_rays = (2**tc.batch_log2) // N_cam
    num_patch = max(num_rays // 4, 1)
    ray_idx, pixel_locs = sample_patches(key, H, W, num_patch)
    pixel_locs = jnp.broadcast_to(
        pixel_locs[None], (N_cam, *pixel_locs.shape)
    )

    def loss_fn(params):
        return compute_losses(
            params, state.field_state, state.admm, data, ray_idx, pixel_locs,
            state.step, tc,
        )

    return jax.value_and_grad(loss_fn, has_aux=True)(state.params)


# donate the state: without it the old AND new TrainState (hash table +
# both Adam moments = 3 table-sized buffers) are live simultaneously,
# which is what keeps the reference-default 2^24 tables from fitting a
# 16G chip
@partial(
    jax.jit,
    static_argnames=("tc", "tx", "grad_axis"),
    donate_argnames=("state",),
)
def train_step(
    state: TrainState,
    data: TileData,
    key: jax.Array,
    tc: TrainConfig,
    tx: optax.GradientTransformation,
    grad_axis: str | None = None,
) -> tuple[TrainState, dict]:
    # grad_axis: mesh axis name for ray data parallelism — gradients (and
    # aux metrics) are pmean'd over it before the replica-identical
    # optimizer update (see parallel/ray_parallel.py)
    (loss, aux), grads = compute_grads(state, data, key, tc)
    if grad_axis is not None:
        grads = jax.lax.pmean(grads, grad_axis)
        aux = jax.tree_util.tree_map(
            lambda x: jax.lax.pmean(x, grad_axis), aux
        )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        params=new_params, opt_state=new_opt, step=state.step + 1
    )
    return new_state, aux


def train_n_steps(state, data, key, tc, tx, n):
    """Host loop over jitted steps (the reference's TILE.train(n))."""
    aux = None
    for i in range(n):
        key, sub = jax.random.split(key)
        state, aux = train_step(state, data, sub, tc, tx)
    return state, aux


# ---------------------------------------------------------------------------
# eval rendering
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("tc",))
def render_chunk(params, field_state, rays_o, rays_d, step, tc: TrainConfig):
    return field_lib.render_rays(
        params.field, field_state, rays_o, rays_d,
        tc.num_sample, tc.num_bg_sample, step.astype(jnp.float32),
        train=False, invalid_underground=tc.invalid_underground,
        num_march=tc.num_march,
        backend=tc.hash_backend,
        fused_decoder=tc.fused_decoder,
        compact_dead=tc.compact_dead_rays,
    )


def render_depth_batch(
    state: TrainState,
    cams: Cameras,
    view_idxs: list[int],
    H: int,
    W: int,
    tc: TrainConfig,
    chunk: int = 2**14,
    k_scale=1.0,
) -> np.ndarray:
    """Depth maps for several views in ONE chunked ray stream.

    Packs all views' rays into shared chunks so the occlusion-mask
    refresh (render_shared_depth, tile.py:432-475) does
    ceil(V*H*W/chunk) dispatches instead of V*ceil(H*W/chunk) — the
    per-view loop is what made the refresh host-serial at MAX_POSES
    scale. ``k_scale`` (scalar or (sx, sy)) scales the intrinsics rows
    so a downscaled H x W render covers the SAME field of view as the
    native camera (pass the per-axis resolution ratios, e.g. W_low/W
    and H_low/H). Returns [V, H, W] f32.
    """
    from scanerf_tpu.utils import rays as rays_mod

    sx, sy = (k_scale, k_scale) if np.isscalar(k_scale) else k_scale
    xy = rays_mod.pixel_grid(H, W)
    rts = cam_lib.get_rts(cams, state.params.se3_refine)
    scale = jnp.asarray(
        [[sx, sx, sx], [sy, sy, sy], [1.0, 1.0, 1.0]], jnp.float32
    )
    all_o, all_d = [], []
    for vi in view_idxs:
        o, d = rays_mod.get_center_and_ray(
            xy, rts[vi], cams.ks[vi] * scale
        )
        all_o.append(o)
        all_d.append(d)
    rays_o = jnp.concatenate(all_o)
    rays_d = jnp.concatenate(all_d)
    n = rays_o.shape[0]
    pad = (-n) % chunk
    rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
    depths = []
    for i in range(0, n + pad, chunk):
        out = render_chunk(
            state.params, state.field_state, rays_o[i : i + chunk],
            rays_d[i : i + chunk], state.step, tc,
        )
        depths.append(np.asarray(out["pred_depth"]))
    return np.concatenate(depths)[:n].reshape(len(view_idxs), H, W)


def render_image(
    state: TrainState,
    cams: Cameras,
    view_idx: int,
    H: int,
    W: int,
    tc: TrainConfig,
    chunk: int = 2**14,
) -> dict[str, np.ndarray]:
    """Full-image eval render in chunks (tile.py:810-864)."""
    from scanerf_tpu.utils import rays as rays_mod

    xy = rays_mod.pixel_grid(H, W)
    pose = cam_lib.get_rts(cams, state.params.se3_refine)[view_idx]
    K = cams.ks[view_idx]
    rays_o, rays_d = rays_mod.get_center_and_ray(xy, pose, K)
    outs = {"rgb": [], "depth": [], "diffuse": [], "specular": []}
    n = rays_o.shape[0]
    pad = (-n) % chunk
    rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
    for i in range(0, n + pad, chunk):
        out = render_chunk(
            state.params, state.field_state, rays_o[i : i + chunk],
            rays_d[i : i + chunk], state.step, tc,
        )
        outs["rgb"].append(np.asarray(out["pred_color"]))
        outs["depth"].append(np.asarray(out["pred_depth"]))
        outs["diffuse"].append(np.asarray(out["pred_diffuse"]))
        outs["specular"].append(np.asarray(out["pred_specular"]))
    return {
        k: np.concatenate(v)[:n].reshape(H, W, -1) for k, v in outs.items()
    }
