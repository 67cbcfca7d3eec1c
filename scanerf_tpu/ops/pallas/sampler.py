"""Fused occupancy-CDF ray sampler — single Pallas TPU kernel.

Replaces the XLA composition in ``ops/sampling.sample_points_grid``
(march -> occupancy gather -> cumsum -> CDF inversion -> placement
gathers) with one kernel. Round-3 probe (scripts/probe_sampler.py) put
the XLA sampler at ~193 ms of the 669 ms training step — the single
biggest piece — split ~130 ms march+gather+cumsum and ~74 ms placement
gathers. Both are artifacts of the op-by-op formulation, not the math:

* the occupancy test is a 1-bit lookup into a small grid, but XLA runs
  it as an 8.4M-row HBM gather against [N, M, 3] materialized points.
  In-kernel the grid is BITPACKED into u32 lane LUTs (64^3 cells = 8
  vregs) and resolved with ``take_along_axis`` one-vreg gathers + a
  compare-select over (vreg, sublane) — no HBM traffic at all;
* the placement gathers vanish algebraically: with k(s) = #{m :
  cum[m] <= s} the reference's ``cum_before = cum[k-1]`` equals
  ``sum_m occ_len[m] * (cum[m] <= s)`` — computable in the SAME
  broadcast-compare pass as the CDF inversion — and the segment left
  edge is affine in k (``t_near + k * (t_far - t_near) / M``), so
  nothing is ever indexed;
* intermediates ([N, M] candidate points, cum, edges — ~200 MB at the
  default 16K x 512 workload) never leave VMEM; the kernel reads 8
  floats per ray and writes S + 1.

The sampler is no-grad by spec (the reference samples under
``torch.no_grad()``, cuda/helper_kernel.cu:539-669) so the kernel needs
no VJP; gradients reach sample POSITIONS through rays_o/rays_d outside.

Semantics match ``sample_points_grid``'s continuum distribution (module
docstring there); parity is asserted against the XLA path in
tests/test_pallas_sampler.py to ~1e-4 (fp association differs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256  # rays per grid step (amortizes per-step pipeline overhead)
MAX_LUT_WORDS = 64 * 1024  # 64 vregs = 2M cells (128^3); beyond -> XLA


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def lut_words(grid_shape: tuple[int, int, int]) -> int:
    rx, ry, rz = grid_shape
    wz = -(-rz // 32)
    return rx * ry * wz


def supports(grid_shape, num_march: int) -> bool:
    """Static gate: can the fused kernel run this workload?"""
    return num_march % 128 == 0 and lut_words(grid_shape) <= MAX_LUT_WORDS


def pack_grid(grid: jax.Array) -> jax.Array:
    """[rx, ry, rz] bool -> [G*8, 128] u32 lane-LUT (z innermost bits).

    Word of cell (x, y, z) sits at flat index ((x*ry)+y)*wz + z//32,
    bit z%32. Runs in-jit (cheap: one masked sum over 32 disjoint bits)
    so callers can pass the live occupancy grid every step.
    """
    rx, ry, rz = grid.shape
    wz = -(-rz // 32)
    g = jnp.pad(grid, ((0, 0), (0, 0), (0, wz * 32 - rz)))
    bits = g.reshape(rx, ry, wz, 32).astype(jnp.uint32)
    words = jnp.sum(bits << jnp.arange(32, dtype=jnp.uint32), axis=-1)
    flat = words.reshape(-1)
    nw = flat.shape[0]
    gv = -(-nw // 1024)
    flat = jnp.pad(flat, (0, gv * 1024 - nw))
    return flat.reshape(gv * 8, 128)


def _shift_r(x: jax.Array, k: int) -> jax.Array:
    """Shift lanes right by k (zeros shifted in)."""
    pad = jnp.zeros((x.shape[0], k), x.dtype)
    return jnp.concatenate([pad, x[:, :-k]], axis=1)


def _make_kernel(S: int, M: int, G: int, res):
    rx, ry, rz = (int(r) for r in res)
    wz = -(-rz // 32)

    def kernel(scal_ref, rays_ref, lut_ref, z_ref, tot_ref, cidx_s, cum_s):
        rays = rays_ref[:, :]
        ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
        tn, tf = rays[:, 6:7], rays[:, 7:8]

        # Mosaic tpu.iota is integer-only; widen to f32 after
        im = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1).astype(
            jnp.float32
        )
        mids = tn + (tf - tn) * ((im + 0.5) * (1.0 / M))

        def cell_of(o, d, c, s, r):
            # match the XLA occupancy_lookup's fp order: (p-c)/s*r
            u = (o + mids * d - c) / s * jnp.float32(r)
            cc = jnp.floor(u).astype(jnp.int32)
            inb = (cc >= 0) & (cc < r)
            return jnp.clip(cc, 0, r - 1), inb

        cx, ix = cell_of(ox, dx, scal_ref[0], scal_ref[3], rx)
        cy, iy = cell_of(oy, dy, scal_ref[1], scal_ref[4], ry)
        cz, iz = cell_of(oz, dz, scal_ref[2], scal_ref[5], rz)
        inb = ix & iy & iz
        cidx = ((cx * ry) + cy) * (wz * 32) + cz  # full cell id
        cidx_s[:, :] = jnp.where(inb, cidx, -1)

        # occupancy via bitpacked lane LUTs, per [8, 128] tile
        nt = (B // 8) * (M // 128)

        def tile_body(t, _):
            rsl = pl.ds((t // (M // 128)) * 8, 8)
            csl = pl.ds((t % (M // 128)) * 128, 128)
            ci = cidx_s[rsl, csl]
            ok = ci >= 0
            w = jnp.maximum(ci, 0) >> 5  # word index
            bit = (jnp.maximum(ci, 0) & 31).astype(jnp.uint32)
            g = w >> 10
            srow = (w >> 7) & 7
            lane = w & 127
            word = jnp.zeros((8, 128), jnp.uint32)
            # pack_grid always emits G*8 LUT rows, so every (gg, ss)
            # pair is in range
            for gg in range(G):
                for ss in range(8):
                    row = lut_ref[pl.ds(gg * 8 + ss, 1), :]
                    vals = jnp.take_along_axis(
                        jnp.broadcast_to(row, (8, 128)), lane, axis=1
                    )
                    word = jnp.where((g == gg) & (srow == ss), vals, word)
            # Mosaic can't cast u32->f32 directly; go via i32 (values
            # are 0/1 so the signedness reinterpret is exact)
            occ = ((word >> bit) & 1).astype(jnp.int32)
            occ = jnp.where(ok, occ, 0)
            # reuse cidx_s as the occupancy store
            cidx_s[rsl, csl] = occ
            return ()

        jax.lax.fori_loop(0, nt, tile_body, ())

        # cumulative occupied arc length (Hillis-Steele over M lanes)
        seg = (tf - tn) * (1.0 / M)  # [B, 1]
        x = cidx_s[:, :].astype(jnp.float32) * seg
        k = 1
        while k < M:
            x = x + _shift_r(x, k)
            k *= 2
        cum_s[:, :] = x
        tot_ref[:, :] = x[:, M - 1 : M]

        # CDF inversion + gather-free placement, per 8-ray group
        def inv_body(gi, _):
            rsl = pl.ds(gi * 8, 8)
            cumg = cum_s[rsl, :]  # [8, M]
            olg = cumg - jnp.concatenate(
                [jnp.zeros((8, 1), jnp.float32), cumg[:, : M - 1]], axis=1
            )
            totg = cumg[:, M - 1 : M]  # [8, 1]
            sj = jax.lax.broadcasted_iota(jnp.int32, (8, S), 1).astype(
                jnp.float32
            ) * (totg * (1.0 / S))
            cmp = cumg[:, None, :] <= sj[:, :, None]  # [8, S, M]
            k_raw = jnp.sum(cmp.astype(jnp.float32), axis=-1)  # [8, S]
            cb = jnp.sum(
                jnp.where(cmp, olg[:, None, :], 0.0), axis=-1
            )  # [8, S] = cum[k-1]
            # k_raw == M (fp corner: s == total): the XLA path clips the
            # index first, reading cum[M-2]
            cb = cb - jnp.where(k_raw >= M, olg[:, M - 1 : M], 0.0)
            kk = jnp.clip(k_raw, 0.0, M - 1.0)
            raysg = rays_ref[rsl, :]
            tng, tfg = raysg[:, 6:7], raysg[:, 7:8]
            segl = tng + kk * ((tfg - tng) * (1.0 / M))
            z_ref[rsl, :] = segl + (sj - cb)
            return ()

        jax.lax.fori_loop(0, B // 8, inv_body, ())

    return kernel


@functools.partial(
    jax.custom_jvp, nondiff_argnums=(4, 8)
)
def sample_fused(
    rays_o: jax.Array,
    rays_d: jax.Array,
    t_near: jax.Array,
    t_far: jax.Array,
    num_sample: int,
    grid: jax.Array,
    grid_corner: jax.Array,
    grid_size: jax.Array,
    num_march: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Fused sampler core: z_vals [N, S] and total occupied length [N].

    ``t_near``/``t_far`` are the (already sentinel-cleaned) march bounds;
    validity masking and dist broadcasting stay with the caller. The
    custom JVP below declares ZERO tangents — the sampler is no-grad by
    spec (the reference samples under torch.no_grad; every consumer
    stop-gradients z/dists anyway), and without the rule a
    pose-differentiable rays_o/rays_d trace would hit pallas_call's
    missing JVP before the caller's stop_gradient applies.
    """
    N = rays_o.shape[0]
    S, M = num_sample, num_march
    if M % 128 != 0:
        raise ValueError(f"num_march must be a multiple of 128, got {M}")
    nw = lut_words(grid.shape)
    if nw > MAX_LUT_WORDS:
        raise ValueError(
            f"grid {grid.shape} needs {nw} LUT words > {MAX_LUT_WORDS}; "
            "use the XLA sampler"
        )
    lut = pack_grid(grid)
    G = lut.shape[0] // 8
    rays = jnp.concatenate(
        [rays_o, rays_d, t_near[:, None], t_far[:, None]], axis=1
    ).astype(jnp.float32)
    npad = -(-N // B) * B
    rays = jnp.pad(rays, ((0, npad - N), (0, 0)))
    scal = jnp.concatenate(
        [
            jnp.asarray(grid_corner, jnp.float32).reshape(3),
            jnp.asarray(grid_size, jnp.float32).reshape(3),
            jnp.zeros((2,), jnp.float32),
        ]
    )
    kernel = _make_kernel(S, M, G, grid.shape)
    z, tot = pl.pallas_call(
        kernel,
        grid=(npad // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal [8]
            pl.BlockSpec((B, 8), lambda b: (b, 0)),  # rays
            pl.BlockSpec((lut.shape[0], 128), lambda b: (0, 0)),  # lut
        ],
        out_specs=[
            pl.BlockSpec((B, S), lambda b: (b, 0)),
            pl.BlockSpec((B, 1), lambda b: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, S), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, M), jnp.int32),  # cell ids, then occupancy
            pltpu.VMEM((B, M), jnp.float32),  # cumulative lengths
        ],
        interpret=_interpret(),
    )(scal, rays, lut)
    return z[:N], tot[:N, 0]


@sample_fused.defjvp
def _sample_fused_jvp(num_sample, num_march, primals, tangents):
    out = sample_fused(
        primals[0], primals[1], primals[2], primals[3], num_sample,
        primals[4], primals[5], primals[6], num_march,
    )
    zeros = tuple(jnp.zeros_like(o) for o in out)
    return out, zeros
