"""Pallas TPU photon-gather: tile-shared VMEM photon intervals.

The XLA gather (photon_map.gather_photons) fetches up to ``budget`` photon
rows PER QUERY with random row gathers — latency-priced at ~6 ns/row on
v5e, it measures ~860 ms for 262k queries x 128 budget (PERF.md) and is
the dominant cost of a PPM iteration on dense-intersector scenes.

This kernel exploits what the reference's per-pixel loop cannot: queries
are image-ordered, so a TILE of T=256 consecutive pixels' hitpoints spans
only a few grid cells. Per tile:

1. the host-side (XLA) precompute takes the UNION of the tile's query
   cell boxes and enumerates its (y,z) rows — each row is one contiguous
   interval of the cell-sorted photon array (the same x-contiguity trick
   the reference scans per pixel, IndirectRadianceEstimation.cu:104-112);
2. the kernel DMAs each interval ONCE into VMEM and tests it densely
   against all 256 queries — distance, normal opposition and the Jensen
   gaussian evaluate as [T, C] blocks on the VPU/MXU (the q.p and
   contrib@power contractions are matmuls);
3. over-budget tiles stay UNBIASED the same way gather_photons does:
   y/z rows beyond the 8x8 slot grid are systematically stride-sampled
   and rows longer than C photons contribute one random C-block, each
   reweighted by its inverse inclusion probability.

Bytes and flops are both orders of magnitude below the XLA gather's
latency cost: per tile ~30 live rows x 12 KB DMA + 3 small matmuls.

Differentiation: the kernel is wrapped in a zero-gradient ``custom_vjp``
(pallas_call has no AD rules), so ``jax.grad`` through a PPM iteration
works on TPU with the tiled gather enabled — parameter gradients flow
through the BRDF/attenuation factors OUTSIDE this kernel, while the
accumulated photon power is treated as a constant of the iteration.
This drops the photon-power gradient term the XLA gather carries
(e.g. d(indirect)/d(light emission) via deposited power); select
``use_pallas_gather=False`` when that term matters (config.py note).

Numerical robustness: d2 = |q-p|^2 must NOT be expanded to q2 + p2 - 2 q.p
on the MXU — with raw scene coordinates (Cornell ~550) the cross term
cancels catastrophically against the shrinking PPM radius (the round-2
bug). The round-3 fix (centered operands + precision=HIGHEST dots) was
exact but 2.1x slower (6-pass MXU at K=3). Round 4 computes d2 PER AXIS on
the VPU: (q - p) of nearby f32 values is exact (Sterbenz lemma), squaring
and the 3-term sum are ordinary f32 — exact where it matters, no MXU
passes, no centering needed. Measured numbers in PERF_NOTES.md.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import Array

TILE = 256          # queries per kernel block
BLOCK = 16          # square image block edge (BLOCK^2 == TILE)
ROWS_Y = 8          # (y,z) row slot grid per tile
ROWS_Z = 8
ROWS = ROWS_Y * ROWS_Z
CHUNK = 256         # photons DMA'd per row slot


def tile_block_order(width: int, height: int):
    """(perm, inv_perm) int32 [H*W] mapping raster order to 16x16 image
    blocks. 256 CONSECUTIVE raster pixels span a half image row —
    wall-to-wall hitpoints whose cell-box union covers the whole grid —
    while a 16x16 pixel block is a compact surface patch, which is the
    coherence the tile kernel feeds on."""
    import numpy as np
    assert width % BLOCK == 0 and height % BLOCK == 0
    idx = np.arange(height * width, dtype=np.int32).reshape(height, width)
    blocks = (idx.reshape(height // BLOCK, BLOCK, width // BLOCK, BLOCK)
              .transpose(0, 2, 1, 3).reshape(-1))
    perm = blocks
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


CHUNK_PAD = CHUNK + 128   # DMA window: 128-aligned start + CHUNK photons

# Row-loop form: 64-way static unroll vs fori_loop with dynamic SMEM
# table reads. MEASURED (round 4, v5e, PERF_NOTES): identical runtime
# (71.2 vs 70.7 ms) but the fori/dynamic-DMA form takes 249 s through
# Mosaic vs 27 s unrolled — the unroll is what keeps the cold compile
# short, the opposite of the round-3 hypothesis.
_STATIC_UNROLL = True


def _pack_photons(grid) -> Array:
    """[16, P_pad] f32 (transposed SoA): rows 0-2 position, 3-5 power,
    6-8 direction, 9-15 pad. Transposed so the photon axis is the MINOR
    (128-lane-tiled) dimension — Mosaic requires HBM DMA slices aligned
    to the lane tiling, so the kernel slices [16, CHUNK_PAD] windows at
    128-aligned starts. Pad photons park positions at BIG so they never
    pass the distance test; P_pad guards the window overrun."""
    P = grid.position.shape[0]
    pad = -(-P // 128) * 128 - P + CHUNK_PAD
    rows = [grid.position.T, grid.power.T, grid.direction.T,
            jnp.zeros((7, P), jnp.float32)]
    packed = jnp.concatenate(rows, axis=0)               # [16, P]
    tail = jnp.zeros((16, pad), jnp.float32).at[0:3].set(1e30)
    return jnp.concatenate([packed, tail], axis=1)


def _tile_tables(grid, position: Array, radius, u_row: Array,
                 valid: Array | None = None):
    """Per-tile DMA tables: (starts, lens, weights) each [n_tiles, ROWS].

    ``u_row`` [n_tiles, ROWS + 2] uniforms drive the unbiased subsampling
    (stride offsets for y/z row sampling + the per-row chunk pick).
    ``valid`` masks queries out of the tile box union (miss lanes carry
    junk positions that would otherwise blow the union up to the whole
    grid); an all-invalid tile gets zero-length rows.
    """
    res = grid.resolution
    n = position.shape[0]
    n_tiles = n // TILE
    r = jnp.broadcast_to(radius, (n,))
    npos = position - grid.origin
    inv = 1.0 / grid.cell_size
    lo = jnp.clip(jnp.floor((npos - r[:, None]) * inv), 0,
                  res - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.floor((npos + r[:, None]) * inv), 0,
                  res - 1).astype(jnp.int32)
    if valid is not None:
        lo = jnp.where(valid[:, None], lo, res)   # min ignores invalid
        hi = jnp.where(valid[:, None], hi, -1)    # max ignores invalid
    lo_t = lo.reshape(n_tiles, TILE, 3).min(axis=1)     # [Tt,3]
    hi_t = hi.reshape(n_tiles, TILE, 3).max(axis=1)

    def axis_rows(axis, slots, u):
        span = hi_t[:, axis] - lo_t[:, axis] + 1               # [Tt]
        stride = jnp.maximum(1, -(-span // slots))              # ceil
        off = jnp.minimum((u * stride.astype(jnp.float32))
                          .astype(jnp.int32), stride - 1)
        ks = jnp.arange(slots, dtype=jnp.int32)
        vals = lo_t[:, axis, None] + off[:, None] + ks[None, :] \
            * stride[:, None]                                   # [Tt,slots]
        ok = vals <= hi_t[:, axis, None]
        return vals, ok, stride

    ys, ok_y, stride_y = axis_rows(1, ROWS_Y, u_row[:, 0])
    zs, ok_z, stride_z = axis_rows(2, ROWS_Z, u_row[:, 1])

    y = jnp.repeat(ys, ROWS_Z, axis=1)                   # [Tt, ROWS]
    oky = jnp.repeat(ok_y, ROWS_Z, axis=1)
    z = jnp.tile(zs, (1, ROWS_Y))
    okz = jnp.tile(ok_z, (1, ROWS_Y))
    ok = oky & okz
    w_row = (stride_y * stride_z).astype(jnp.float32)[:, None]  # [Tt,1]

    cfrom = lo_t[:, 0, None] + y * res + z * res * res
    cto = hi_t[:, 0, None] + y * res + z * res * res
    start = grid.offsets[jnp.where(ok, cfrom, 0)]
    end = grid.offsets[jnp.where(ok, cto, 0) + 1]
    ln = jnp.where(ok, end - start, 0)                   # [Tt, ROWS]

    # rows longer than CHUNK: pick one random C-block, weight = #blocks
    n_blocks = jnp.maximum(1, -(-ln // CHUNK))
    u_blk = u_row[:, 2:2 + ROWS]
    blk = jnp.minimum((u_blk * n_blocks.astype(jnp.float32))
                      .astype(jnp.int32), n_blocks - 1)
    start_s = start + blk * CHUNK
    ln_s = jnp.clip(ln - blk * CHUNK, 0, CHUNK)
    weight = jnp.where(ok, w_row * n_blocks.astype(jnp.float32), 0.0)
    visited = jnp.sum(ln_s, axis=1)                      # per tile
    total = jnp.sum(jnp.where(ok, ln, 0) * w_row.astype(ln.dtype), axis=1)
    # tile reference point (cell-box center, world coords): the kernel
    # centers query and photon positions on it before the d2 matmul —
    # raw coordinates cancel catastrophically against the shrinking
    # radius (q2 + p2 - 2 q.p loses ~|q|^2 * eps absolute accuracy)
    ref = grid.origin + (lo_t + hi_t + 1).astype(jnp.float32) \
        * (0.5 * grid.cell_size)                         # [Tt,3]
    return (start_s.astype(jnp.int32), ln_s.astype(jnp.int32),
            weight.astype(jnp.float32), ref, visited, total)


def _gather_kernel(check_normal: bool, alpha: float, beta: float,
                   itab_ref, wtab_ref, r2_ref,
                   qpos_ref, qn_ref, photons_hbm, out_ref,
                   scratch, sem):
    """``itab_ref`` [1,8,128] int32 in SMEM: row 0 = starts, row 1 = lens
    (slot r at column r); ``wtab_ref`` [1,8,128] f32 in SMEM: row 0 =
    weights, row 1 cols 0:3 = tile reference point. The row loop is the
    64-way STATIC unroll selected by ``_STATIC_UNROLL`` — see that flag's
    comment for the measured compile/runtime trade vs the fori_loop +
    dynamic-DMA form (the unroll is what keeps the cold compile short)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_ref[:] = jnp.zeros_like(out_ref)
    qp = qpos_ref[:]                                     # [T,3]
    qn = qn_ref[:]
    r2 = r2_ref[0, 0]
    from ..photon_map import GAUSS_EXP_NEG_BETA
    denom = jnp.float32(1.0 - GAUSS_EXP_NEG_BETA)

    def slot(s, carry):
        start = itab_ref[0, 0, s]
        ln = itab_ref[0, 1, s]
        w_s = wtab_ref[0, 0, s]

        @pl.when(ln > 0)
        def _(start=start, ln=ln, w_s=w_s):
            # DMA a 128-aligned window covering [start, start+ln)
            start0 = (start // 128) * 128
            shift = start - start0
            dma = pltpu.make_async_copy(
                photons_hbm.at[:, pl.ds(start0, CHUNK_PAD)], scratch, sem)
            dma.start()
            dma.wait()
            p = scratch[0:3, :]                          # [3,Cp]
            pw = scratch[3:6, :]
            pd = scratch[6:9, :]
            j = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK_PAD), 1)
            cnt = (j >= shift) & (j < shift + ln)
            # d2 per axis on the VPU: (q - p) of nearby f32 points is
            # EXACT (Sterbenz), so the direct form carries none of the
            # q2 + p2 - 2 q.p cancellation that bit the round-2 MXU
            # formulation — and none of the precision=HIGHEST multi-pass
            # cost that made the round-3 fix 2.1x slower (77 -> 163 ms;
            # this form measures the PPM-regression repair, PERF_NOTES)
            dx = qp[:, 0:1] - p[0:1, :]
            dy = qp[:, 1:2] - p[1:2, :]
            dz = qp[:, 2:3] - p[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz              # [T,Cp]
            ok = cnt & (d2 <= r2)
            if check_normal:
                ndp = (qn[:, 0:1] * pd[0:1, :] + qn[:, 1:2] * pd[1:2, :]
                       + qn[:, 2:3] * pd[2:3, :])
                ok = ok & (ndp <= 0.0)
            # Jensen gaussian (IndirectRadianceEstimation.cu:60-67)
            expf = jnp.exp(-beta * d2 / (2.0 * r2))
            w = alpha * (1.0 - (1.0 - expf) / denom)
            contrib = jnp.where(ok, w, 0.0) * w_s
            out_ref[:] += jax.lax.dot_general(
                contrib, pw, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        return carry

    if _STATIC_UNROLL:
        for s in range(ROWS):
            slot(s, 0)
    else:
        jax.lax.fori_loop(0, ROWS, slot, 0)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gather_tiled_core(grid, position, normal, radius, u_rows,
                       check_normal: bool, interpret: bool, valid=None):
    return _gather_tiled_impl(grid, position, normal, radius, u_rows,
                              check_normal, interpret, valid)


def _gather_tiled_fwd(grid, position, normal, radius, u_rows,
                      check_normal, interpret, valid=None):
    out = _gather_tiled_core(grid, position, normal, radius, u_rows,
                             check_normal, interpret, valid)
    return out, (grid, position, normal, radius, u_rows, valid)


def _gather_tiled_bwd(check_normal, interpret, res, g):
    # pallas_call has no AD rules; the gather's photon powers are constants
    # of the iteration (module docstring) — zero cotangents keep jax.grad
    # working through the PPM estimator on TPU
    return jax.tree_util.tree_map(jnp.zeros_like, res)


_gather_tiled_core.defvjp(_gather_tiled_fwd, _gather_tiled_bwd)


def gather_photons_tiled(grid, position: Array, normal: Array, radius,
                         *, u_rows: Array, check_normal: bool = True,
                         valid: Array | None = None,
                         interpret: bool = False):
    """Tile-shared photon gather. ``position``/``normal`` are [N,3] with
    N a multiple of TILE in image order; ``u_rows`` is [N // TILE,
    ROWS + 2] uniforms. Returns (accum_power [N,3], stats dict) matching
    photon_map.gather_photons' contract (same estimator, same Jensen
    kernel; per-query stats are the owning tile's counts). Differentiation
    returns zero cotangents (see module docstring)."""
    return _gather_tiled_core(grid, position, normal, radius, u_rows,
                              check_normal, interpret, valid)


def _gather_tiled_impl(grid, position, normal, radius, u_rows,
                       check_normal, interpret, valid):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..photon_map import GAUSS_ALPHA, GAUSS_BETA

    n = position.shape[0]
    assert n % TILE == 0, f"{n} queries not a multiple of {TILE}"
    assert ROWS <= 128
    n_tiles = n // TILE
    starts, lens, weights, ref, visited, total = _tile_tables(
        grid, position, radius, u_rows, valid=valid)
    packed = _pack_photons(grid)
    r2 = jnp.asarray(jnp.square(radius), jnp.float32).reshape(1, 1)

    # (8,128)-aligned per-tile table blocks (Mosaic block constraint):
    # itab[t,0,r] = start, itab[t,1,r] = len; wtab[t,0,r] = weight,
    # wtab[t,1,0:3] = tile reference point
    itab = jnp.zeros((n_tiles, 8, 128), jnp.int32)
    itab = itab.at[:, 0, :ROWS].set(starts).at[:, 1, :ROWS].set(lens)
    wtab = jnp.zeros((n_tiles, 8, 128), jnp.float32)
    wtab = wtab.at[:, 0, :ROWS].set(weights).at[:, 1, 0:3].set(ref)

    kernel = partial(_gather_kernel, check_normal, float(GAUSS_ALPHA),
                     float(GAUSS_BETA))
    accum = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # photons stay in HBM
        ],
        out_specs=pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((16, CHUNK_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(itab, wtab, r2, position, normal, packed)

    per_q = lambda a: jnp.repeat(a, TILE, total_repeat_length=n)
    stats = dict(photons_visited=per_q(visited).astype(jnp.int32),
                 photon_subsampled=per_q(
                     jnp.maximum(total - visited, 0)).astype(jnp.int32))
    return accum, stats
