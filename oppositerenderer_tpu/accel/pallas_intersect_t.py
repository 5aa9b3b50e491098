"""Transposed-layout Pallas intersection kernels: rays on LANES.

The round-1 kernel layout (removed in round 3) put triangles on the 128-wide
lane dimension — fine for big scenes, but a 34-triangle Cornell pads lanes
3.8x. Here the layout is flipped: rays occupy lanes (ray counts are always
large and 128-aligned after padding), triangles occupy sublanes (pad to 8),
so small scenes waste almost nothing. Compute tiles are [TB_sub x RB_lane];
the per-ray min reduction runs across sublanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
IDX_SENTINEL = 1 << 30
RAY_BLOCK = 1024      # lanes (multiple of 128)
TRI_BLOCK = 64        # sublanes (multiple of 8)


def _tri_block(t_count: int) -> int:
    return min(TRI_BLOCK, max(8, -(-t_count // 8) * 8))


def _mt_terms(rays_ref, tri_ref):
    """Shared Moller-Trumbore on [TB, RB] tiles. rays_ref [8, RB] rows are
    (ox,oy,oz,dx,dy,dz,tmin,tmax); tri_ref [TB, 9] columns are v0,e1,e2."""
    ox = rays_ref[0:1, :]; oy = rays_ref[1:2, :]; oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]; dy = rays_ref[4:5, :]; dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]; tmax = rays_ref[7:8, :]
    v0x = tri_ref[:, 0:1]; v0y = tri_ref[:, 1:2]; v0z = tri_ref[:, 2:3]
    e1x = tri_ref[:, 3:4]; e1y = tri_ref[:, 4:5]; e1z = tri_ref[:, 5:6]
    e2x = tri_ref[:, 6:7]; e2y = tri_ref[:, 7:8]; e2z = tri_ref[:, 8:9]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > tmin) & (t < tmax))
    return t, u, v, valid


def _closest_kernel_t(rays_ref, tri_ref, tbest_ref, ibest_ref):
    """Min-reduce (t, winner index) only. Barycentrics are recomputed
    outside the kernel on the single winning triangle per ray — keeping
    argmin/selection machinery out of the hot tile loop is worth ~6x on
    v5e (6.5 ms -> 1.1 ms per 262k rays x 32 tris)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        tbest_ref[:] = jnp.full_like(tbest_ref, BIG)
        ibest_ref[:] = jnp.full_like(ibest_ref, IDX_SENTINEL)

    t, _u, _v, valid = _mt_terms(rays_ref, tri_ref)
    t = jnp.where(valid, t, BIG)

    tb = tri_ref.shape[0]
    t_min = jnp.min(t, axis=0, keepdims=True)                # [1, RB]
    rows = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    idx = jnp.min(jnp.where(t == t_min, rows + j * tb, IDX_SENTINEL),
                  axis=0, keepdims=True)                     # [1, RB]

    better = t_min < tbest_ref[:]
    tbest_ref[:] = jnp.where(better, t_min, tbest_ref[:])
    ibest_ref[:] = jnp.where(better, idx, ibest_ref[:])


def _occluded_kernel_t(rays_ref, tri_ref, mask_ref, occ_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        occ_ref[:] = jnp.zeros_like(occ_ref)

    t, u, v, valid = _mt_terms(rays_ref, tri_ref)
    blocked = valid & (mask_ref[:, 0:1] > 0.0)
    occ_ref[:] = jnp.maximum(
        occ_ref[:], jnp.max(blocked.astype(jnp.float32), axis=0,
                            keepdims=True))


def _pack_rays(o, d, tmin, tmax):
    """[8, N] row layout (lane-major rays), padded to RAY_BLOCK lanes."""
    n = o.shape[0]
    rays = jnp.concatenate([o.T, d.T, tmin[None, :], tmax[None, :]], axis=0)
    pad = (-n) % RAY_BLOCK
    if pad:
        filler = jnp.zeros((8, pad), rays.dtype).at[3:6].set(1.0) \
            .at[7].set(-1.0)  # d=(1,1,1), tmax<tmin: padded rays never hit
        rays = jnp.concatenate([rays, filler], axis=1)
    return rays, n


def _uv_at_winner(o, d, tri9, idx):
    """Barycentrics of the (known-hit) winning triangle, one per ray.

    tri9: [9,T] (v0,e1,e2 components); idx: [N] clipped winner ids. The
    gather is a [9,T]@[T,N] one-hot matmul so each component lands on a
    contiguous [N] row — jnp.cross/[N,3] slicing here cost 12 ms/iter in
    relayout copies and strided fusions (profiled on v5e).
    """
    from ..core.gather import onehot_ok
    T = tri9.shape[1]
    if onehot_ok(T, idx.shape[0]):
        oh = (jnp.arange(T, dtype=idx.dtype)[:, None] == idx[None, :])
        g = jnp.matmul(tri9, oh.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGH)    # [9, N]
    else:
        g = tri9[:, idx]                   # gather along T; [9, N]
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (g[i] for i in range(9))
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    return u, v


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_tris(o, d, tmin, tmax, tri9, *, interpret=False):
    """Same contract as pallas_intersect.closest_hit_tris."""
    t_count = tri9.shape[1]
    rays, n = _pack_rays(o, d, tmin, tmax)
    np_ = rays.shape[1]
    tb_sz = _tri_block(t_count)
    triT = jnp.pad(tri9.T, ((0, (-t_count) % tb_sz), (0, 0)))  # [T',9]
    grid = (np_ // RAY_BLOCK, triT.shape[0] // tb_sz)

    tb, ib = pl.pallas_call(
        _closest_kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i, j: (0, i)),
            pl.BlockSpec((tb_sz, 9), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i)),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(rays, triT)
    t = tb[0, :n]
    idx = jnp.where(ib[0, :n] < t_count, ib[0, :n], -1)
    safe = jnp.clip(idx, 0, t_count - 1)
    u, v = _uv_at_winner(o, d, tri9, safe)
    hit = idx >= 0
    return t, idx, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def occluded_tris(o, d, tmin, tmax, tri9, occluder_mask, *, interpret=False):
    t_count = tri9.shape[1]
    rays, n = _pack_rays(o, d, tmin, tmax)
    np_ = rays.shape[1]
    tb_sz = _tri_block(t_count)
    triT = jnp.pad(tri9.T, ((0, (-t_count) % tb_sz), (0, 0)))
    maskT = jnp.pad(occluder_mask.astype(jnp.float32)[:, None],
                    (((0, (-t_count) % tb_sz)), (0, 0)))
    grid = (np_ // RAY_BLOCK, triT.shape[0] // tb_sz)

    occ = pl.pallas_call(
        _occluded_kernel_t,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i, j: (0, i)),
            pl.BlockSpec((tb_sz, 9), lambda i, j: (j, 0)),
            pl.BlockSpec((tb_sz, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, np_), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(rays, triT, maskT)
    return occ[0, :n] > 0.0


def tri9_from_geometry(geom) -> jax.Array:
    """[9, T] component-row layout (v0, e1, e2) for the kernels."""
    return jnp.concatenate([geom.tri_v0.T, geom.tri_e1.T, geom.tri_e2.T],
                           axis=0)
