"""Analytic FLOP/byte accounting for the training step (roofline/MFU).

The bench headline is rays/s on a degraded fabric; this module turns it
into hardware-relative numbers the measurement record can carry:

- ``step_cost``: itemized *useful* FLOPs and HBM bytes of one training
  step at a given workload (model FLOPs in the standard MFU sense —
  the lane-LUT gather/select machinery the VPU actually executes is
  deliberately NOT counted as useful work),
- ``ideal_time_s``: the spec-sheet lower bound max(flops/peak,
  bytes/bw),
- ``summarize``: mfu_est + roofline fraction for a measured step time.

Peaks are TPU v5e spec: 197 TFLOP/s bf16 MXU (the conventional MFU
denominator), 819 GB/s HBM. The step's matmuls run f32 here, so the
mfu_est is conservative by the f32/bf16 ratio; the byte side is the
binding constraint for this workload regardless (the hash gathers and
sorts are traffic, not FLOPs — PERF.md fabric table).

Formulas are order-of-magnitude-honest estimates, itemized so any
term can be audited; sorts are modeled as log2(n) full passes over
the operand bytes (XLA's bitonic family), the table-slab DMA as every
block visited once per kernel pass.
"""

from __future__ import annotations

V5E_PEAK_FLOPS = 197e12  # bf16 MXU spec
V5E_HBM_BPS = 819e9

# ShallowMLP useful FLOPs per point (2 * in * out per matmul; decoder.py
# spatial 32->64->64, heads 32->8, dir (32+16)->64->64->8, activations)
_DEC_FWD_FLOPS = (
    2 * 32 * 64 + 2 * 64 * 64 + 2 * 32 * 8
    + 2 * 48 * 64 + 2 * 64 * 64 + 2 * 64 * 8 + 300
)

# hash encode useful FLOPs per point per level: 8 corners x (hash ~6,
# trilinear weight 3, 2-feature fma 4, corner coords ~7) = ~160
_HASH_FWD_FLOPS_PER_LEVEL = 160


def step_cost(
    batch: int = 2**14,
    num_sample: int = 128,
    num_bg_sample: int = 128,
    levels: int = 16,
    log2_hashmap_size: int = 21,
    warp_top_k: int = 10,
    warp_vis: tuple[int, int] = (16, 8),
    features: int = 2,
) -> dict:
    """Itemized (flops, hbm_bytes) of one full-recipe training step."""
    n_main = batch * (num_sample + num_bg_sample)  # fwd+bwd points
    n_vis = batch * warp_top_k * sum(warp_vis)  # no-grad re-render pts

    hash_fwd = _HASH_FWD_FLOPS_PER_LEVEL * levels
    dec_fwd = _DEC_FWD_FLOPS
    flops = {
        # backward ≈ 2x forward (standard accounting)
        "hash_main": n_main * hash_fwd * 3,
        "decoder_main": n_main * dec_fwd * 3,
        "hash_vis": n_vis * hash_fwd,
        "decoder_vis": n_vis * dec_fwd,
        # compositing/losses/optimizer: ~60 flops/pt + 3 passes over
        # the 2^L table for Adam
        "composite": n_main * 60,
        "adam": 3 * levels * (2**log2_hashmap_size) * features * 4,
    }

    H = 2**log2_hashmap_size
    table_bytes = levels * H * features * 4
    row_bytes = 8 * 4  # the packed stream row (u, wid, dir, pid)
    sort_passes = max(int(n_main).bit_length(), 1)
    bytes_ = {
        # slab DMA: every block once per kernel pass (fwd, bwd read,
        # bwd dacc write) for main; fwd-only for the vis re-render
        "table_slabs": 4 * table_bytes,
        # stream rows through pack/kernels (read fwd + read bwd)
        "stream_rows": (2 * n_main + n_vis) * row_bytes,
        # fused kernel cols out + feats residual write/read (train)
        "cols_and_residual": n_main * (8 * 4 + 2 * levels * 4 * 2),
        # sorts: log2(n) passes over 8 operand columns (sort + unsort)
        "sorts": 2 * (n_main * row_bytes * sort_passes
                      + n_vis * row_bytes * sort_passes // 2),
        # optimizer: params+moments read/write
        "adam": table_bytes * 3 * 2,
    }
    return {
        "flops": flops,
        "hbm_bytes": bytes_,
        "flops_total": float(sum(flops.values())),
        "hbm_bytes_total": float(sum(bytes_.values())),
        "points_main": n_main,
        "points_vis": n_vis,
    }


def ideal_time_s(cost: dict, peak_flops: float = V5E_PEAK_FLOPS,
                 hbm_bps: float = V5E_HBM_BPS) -> dict:
    t_f = cost["flops_total"] / peak_flops
    t_b = cost["hbm_bytes_total"] / hbm_bps
    return {"t_flops_s": t_f, "t_bytes_s": t_b,
            "t_ideal_s": max(t_f, t_b),
            "bound": "hbm" if t_b > t_f else "mxu"}


def summarize(step_time_s: float, **workload) -> dict:
    """Roofline summary for a measured step time -> flat JSON-ready
    dict (bench.py attaches this to the headline record)."""
    cost = step_cost(**workload)
    ideal = ideal_time_s(cost)
    return {
        "flops_g": round(cost["flops_total"] / 1e9, 1),
        "hbm_gb": round(cost["hbm_bytes_total"] / 1e9, 2),
        "mfu_est": round(
            cost["flops_total"] / (step_time_s * V5E_PEAK_FLOPS), 5),
        "t_ideal_ms": round(ideal["t_ideal_s"] * 1e3, 1),
        "bound": ideal["bound"],
        "roofline_frac": round(ideal["t_ideal_s"] / step_time_s, 4),
    }
