"""Pallas TPU kernels for ray-triangle intersection.

The hot op of the whole renderer (every bounce of every pass traces the full
wavefront). The dense Moller-Trumbore test is a perfect VPU workload: rays
as sublanes x triangles as lanes, all arithmetic elementwise on [RB, TB]
broadcasted component tiles — no gathers, no divergence. The grid streams
triangle blocks through VMEM while revisiting each ray block's output
accumulator (closest hit: min-merge; occlusion: or-merge).

Replaces OptiX rtTrace + Trbvh for the scenes that fit the dense budget;
the BVH path (accel.bvh) reuses these kernels per leaf cluster.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
RAY_BLOCK = 256
TRI_BLOCK = 512  # upper bound; shrinks to fit small scenes (see _tri_block)


def _tri_block(t_count: int) -> int:
    """Lane-aligned triangle block: avoids padding tiny scenes to 512
    (Cornell's 34 tris would waste 93% of the VPU)."""
    return min(TRI_BLOCK, max(128, -(-t_count // 128) * 128))


def _pad_to(x, m, fill=0.0):
    n = x.shape[0]
    pad = (-n) % m
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])


def _closest_kernel(o_ref, d_ref, tmin_ref, tmax_ref, tri_ref,
                    tbest_ref, ibest_ref, ubest_ref, vbest_ref):
    """Grid (ray_blocks, tri_blocks); tri block j streams, ray block output
    revisited with min-merge."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        tbest_ref[:] = jnp.full_like(tbest_ref, BIG)
        ibest_ref[:] = jnp.full_like(ibest_ref, -1)
        ubest_ref[:] = jnp.zeros_like(ubest_ref)
        vbest_ref[:] = jnp.zeros_like(vbest_ref)

    # rays: [RB, 1] columns; tris: [1, TB] rows
    ox = o_ref[:, 0:1]; oy = o_ref[:, 1:2]; oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]; dy = d_ref[:, 1:2]; dz = d_ref[:, 2:3]
    v0x = tri_ref[0:1, :]; v0y = tri_ref[1:2, :]; v0z = tri_ref[2:3, :]
    e1x = tri_ref[3:4, :]; e1y = tri_ref[4:5, :]; e1z = tri_ref[5:6, :]
    e2x = tri_ref[6:7, :]; e2y = tri_ref[7:8, :]; e2z = tri_ref[8:9, :]

    # pvec = d x e2  -> [RB, TB]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    # tvec = o - v0
    tx = ox - v0x; ty = oy - v0y; tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    tmin = tmin_ref[:, 0:1]
    tmax = tmax_ref[:, 0:1]
    valid = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t > tmin) & (t < tmax))
    t = jnp.where(valid, t, BIG)

    # block-local argmin over lanes
    t_min = jnp.min(t, axis=1, keepdims=True)              # [RB,1]
    hit_col = jnp.argmin(t, axis=1)                         # [RB]
    base = j * t.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    sel = cols == hit_col[:, None]
    u_min = jnp.sum(jnp.where(sel, u, 0.0), axis=1, keepdims=True)
    v_min = jnp.sum(jnp.where(sel, v, 0.0), axis=1, keepdims=True)

    better = t_min < tbest_ref[:]
    tbest_ref[:] = jnp.where(better, t_min, tbest_ref[:])
    ibest_ref[:] = jnp.where(
        better & (t_min < BIG), base + hit_col[:, None].astype(jnp.int32),
        ibest_ref[:])
    ubest_ref[:] = jnp.where(better, u_min, ubest_ref[:])
    vbest_ref[:] = jnp.where(better, v_min, vbest_ref[:])


def _occluded_kernel(o_ref, d_ref, tmin_ref, tmax_ref, tri_ref, occ_mask_ref,
                     occ_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        occ_ref[:] = jnp.zeros_like(occ_ref)

    ox = o_ref[:, 0:1]; oy = o_ref[:, 1:2]; oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]; dy = d_ref[:, 1:2]; dz = d_ref[:, 2:3]
    v0x = tri_ref[0:1, :]; v0y = tri_ref[1:2, :]; v0z = tri_ref[2:3, :]
    e1x = tri_ref[3:4, :]; e1y = tri_ref[4:5, :]; e1z = tri_ref[5:6, :]
    e2x = tri_ref[6:7, :]; e2y = tri_ref[7:8, :]; e2z = tri_ref[8:9, :]

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

    tmin = tmin_ref[:, 0:1]
    tmax = tmax_ref[:, 0:1]
    blocked = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t > tmin) & (t < tmax)
               & (occ_mask_ref[0:1, :] > 0.0))
    any_block = jnp.max(blocked.astype(jnp.float32), axis=1, keepdims=True)
    occ_ref[:] = jnp.maximum(occ_ref[:], any_block)


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_tris(o, d, tmin, tmax, tri9, *, interpret=False):
    """Pallas closest-hit vs triangle soup.

    o,d [N,3]; tri9 [9, T] component rows (v0,e1,e2). Returns
    (t [N], idx [N] int32 (-1 miss), u [N], v [N]).
    """
    n = o.shape[0]
    t_count = tri9.shape[1]
    o_p = _pad_to(o, RAY_BLOCK)
    d_p = _pad_to(d, RAY_BLOCK, fill=1.0)
    tmin_p = _pad_to(tmin[:, None], RAY_BLOCK)
    tmax_p = _pad_to(tmax[:, None], RAY_BLOCK)
    np_ = o_p.shape[0]
    tb_sz = _tri_block(t_count)
    tri_p = jnp.pad(tri9, ((0, 0), (0, (-t_count) % tb_sz)))
    tp = tri_p.shape[1]
    grid = (np_ // RAY_BLOCK, tp // tb_sz)

    kw = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((9, tb_sz), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )
    tb, ib, ub, vb = pl.pallas_call(_closest_kernel, **kw)(
        o_p, d_p, tmin_p, tmax_p, tri_p)
    idx = jnp.where(ib[:n, 0] < t_count, ib[:n, 0], -1)
    return tb[:n, 0], idx, ub[:n, 0], vb[:n, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def occluded_tris(o, d, tmin, tmax, tri9, occluder_mask, *, interpret=False):
    """Pallas any-hit vs triangle soup; occluder_mask [T] f32 (0 = pass-through
    e.g. emitters). Returns [N] bool."""
    n = o.shape[0]
    t_count = tri9.shape[1]
    o_p = _pad_to(o, RAY_BLOCK)
    d_p = _pad_to(d, RAY_BLOCK, fill=1.0)
    tmin_p = _pad_to(tmin[:, None], RAY_BLOCK)
    tmax_p = _pad_to(tmax[:, None], RAY_BLOCK, fill=-1.0)
    np_ = o_p.shape[0]
    tb_sz = _tri_block(t_count)
    tri_p = jnp.pad(tri9, ((0, 0), (0, (-t_count) % tb_sz)))
    mask_p = jnp.pad(occluder_mask[None, :].astype(jnp.float32),
                     ((0, 0), (0, (-t_count) % tb_sz)))
    tp = tri_p.shape[1]
    grid = (np_ // RAY_BLOCK, tp // tb_sz)

    occ = pl.pallas_call(
        _occluded_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((9, tb_sz), lambda i, j: (0, j)),
            pl.BlockSpec((1, tb_sz), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(o_p, d_p, tmin_p, tmax_p, tri_p, mask_p)
    return occ[:n, 0] > 0.0


def tri9_from_geometry(geom) -> jax.Array:
    """[9, T] component-row layout for the kernels."""
    return jnp.concatenate([geom.tri_v0.T, geom.tri_e1.T, geom.tri_e2.T],
                           axis=0)
