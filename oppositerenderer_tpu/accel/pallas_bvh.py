"""Packet BVH traversal as a Pallas TPU kernel.

Replaces the XLA wavefront traversal's per-lane random row gathers — the
measured wall at scene scale (scripts/gather_exp2.py: ~13 ns/lane/step on
v5e, FLAT in row width 8..128, i.e. priced per random row, not per byte;
50% of traversal time on the 253k-tri Atrium) — with the classic packet
scheme mapped to the TPU's strengths:

* a TILE of 1024 rays ([8, 128] f32 per component, rays on lanes) walks
  the wide BVH together behind ONE shared stack (SMEM scalars);
* each step DMAs exactly one node/leaf row (HBM -> VMEM scratch, 512 B)
  and evaluates it densely against the whole tile on the VPU — zero
  gathers, zero per-lane divergence *within* a step;
* per-ray t_best still prunes: a child is pushed only if ANY live ray
  enters it, and every leaf triangle test is masked per ray.

The cost model is per-tile node-UNION (scripts/packet_union_exp.py on the
real Atrium BVH): camera 32x32 pixel tiles visit a union of ~33 rows vs
13.2 per-ray mean (2.5x inflation — big win); random-direction rays
inflate ~100x (no win). The renderer therefore routes COHERENT ray
populations here (primary rays, NEE shadow rays toward compact lights)
and keeps the XLA wavefront for incoherent bounce rays
(``accel/bvh.traverse``), unless forced.

Row format: the same unified wide-BVH table as accel/bvh.py
(``Bvh.rows``, one row per inner node or leaf, child codes/leaf triangles
inlined). The table is built 128 columns wide since round 4 (Mosaic DMA
slices must be 128-aligned on the lane dimension); ``_pad_rows_128`` is a
compatibility fallback for narrower tables and is a no-op on current
builds.

Gradients: zero, like accel/bvh.traverse (geometry-only computation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
TILE = 1024          # rays per packet: one (8, 128) f32 tile
MAX_STACK = 96       # shared stack bound: wide-tree depth (<=10) x arity


def _pad_rows_128(rows: jax.Array) -> jax.Array:
    w = rows.shape[1]
    if w == 128:
        return rows
    return jnp.pad(rows, ((0, 0), (0, 128 - w)))


def _packet_kernel(root_code: int, arity: int, leaf_size: int,
                   any_hit: bool,
                   rows_ref, o_ref, d_ref, tmin_ref, tmax_ref,
                   t_ref, i_ref, u_ref, v_ref, found_ref,
                   row_ref, rowi_ref, sem_ref, stack_ref):
    A, L = arity, leaf_size
    ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
    dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
    tmin = tmin_ref[0, 0]
    tmax = tmax_ref[0, 0]
    ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
    iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
    iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    # lanes whose interval is empty never participate (dead lanes arrive
    # with tmax <= tmin, matching the wavefront convention)
    lane_ok = tmax > tmin
    lane_ok_i = lane_ok.astype(jnp.int32)

    stack_ref[0] = jnp.int32(root_code)

    def fetch(code):
        """DMA one row: inner rows live at index code; leaf rows at
        (-code-1) >> 5. The row lands in the f32 scratch; an int32 VIEW is
        produced by one vector bitcast-copy (Mosaic has no scalar bitcast,
        so int32 fields — child codes, valid mask, first-prim id — are
        scalar-read from the int32 scratch instead)."""
        dec = -code - 1
        ridx = jnp.where(code >= 0, code, dec >> 5)
        dma = pltpu.make_async_copy(rows_ref.at[pl.ds(ridx, 1), :],
                                    row_ref, sem_ref)
        dma.start()
        dma.wait()
        rowi_ref[0:1, :] = pltpu.bitcast(row_ref[0:1, :], jnp.int32)

    def scal(j):
        return row_ref[0, j]

    def icode(j):
        return rowi_ref[0, j]

    def inner_body(carry):
        sp, t_best, i_best, u_b, v_b, found = carry
        live = lane_ok & (found < (2 if any_hit else 2**30))
        # slab all A children densely; collect per-child scalar verdicts
        valid_mask = icode(7 * A)
        keys = []
        codes = []
        for c in range(A):
            b0, b1, b2 = scal(6 * c), scal(6 * c + 1), scal(6 * c + 2)
            b3, b4, b5 = scal(6 * c + 3), scal(6 * c + 4), scal(6 * c + 5)
            t0x = (b0 - ox) * ix
            t0y = (b1 - oy) * iy
            t0z = (b2 - oz) * iz
            t1x = (b3 - ox) * ix
            t1y = (b4 - oy) * iy
            t1z = (b5 - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z),
                                         tmin))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z),
                                         t_best))
            ok = (tn <= tf) & live
            cvalid = (valid_mask >> c) & 1
            enter = jnp.where(jnp.any(ok) & (cvalid > 0),
                              jnp.min(jnp.where(ok, tn, BIG)), BIG)
            keys.append(enter)
            codes.append(icode(6 * A + c))
        # push hit children FAR-first so the nearest pops first: a static
        # odd-even compare-exchange network over the A (key, code) scalar
        # pairs — jnp.argsort/lax.sort do not lower in Mosaic TPU kernels
        pairs = list(zip(keys, codes))

        def cswap(i, j):
            ki, ci = pairs[i]
            kj, cj = pairs[j]
            sw = kj > ki                      # descending keys (far first)
            pairs[i] = (jnp.where(sw, kj, ki), jnp.where(sw, cj, ci))
            pairs[j] = (jnp.where(sw, ki, kj), jnp.where(sw, ci, cj))

        for rnd in range(A):
            for i in range(rnd % 2, A - 1, 2):
                cswap(i, i + 1)

        for k, c in pairs:
            do = k < BIG
            stack_ref[jnp.where(do, sp, MAX_STACK - 1)] = c
            sp = sp + do.astype(jnp.int32)
        return sp, t_best, i_best, u_b, v_b, found

    def leaf_body(code, carry):
        sp, t_best, i_best, u_b, v_b, found = carry
        live = lane_ok & (found < (2 if any_hit else 2**30))
        count = (-code - 1) & 31
        first = scal(10 * L).astype(jnp.int32)
        for k in range(L):
            base = 9 * k
            v0x, v0y, v0z = scal(base), scal(base + 1), scal(base + 2)
            e1x, e1y, e1z = scal(base + 3), scal(base + 4), scal(base + 5)
            e2x, e2y, e2z = scal(base + 6), scal(base + 7), scal(base + 8)
            occ = scal(9 * L + k)
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
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            in_leaf = k < count
            ok = (live & in_leaf & (jnp.abs(det) > 1e-12)
                  & (u >= 0) & (v >= 0) & (u + v <= 1.0)
                  & (t > tmin) & (t < t_best))
            if any_hit:
                ok = ok & (occ > 0.5)
                found = jnp.maximum(found, ok.astype(jnp.int32) * 2)
            else:
                better = ok & (t < t_best)
                t_best = jnp.where(better, t, t_best)
                i_best = jnp.where(better, first + k, i_best)
                u_b = jnp.where(better, u, u_b)
                v_b = jnp.where(better, v, v_b)
                found = jnp.maximum(found, better.astype(jnp.int32))
        return sp, t_best, i_best, u_b, v_b, found

    def cond(state):
        sp = state[0]
        go = sp > 0
        if any_hit:
            found = state[5]
            go = go & ~jnp.all((found >= 2) | ~lane_ok)
        return go

    def step(state):
        sp = state[0]
        code = stack_ref[sp - 1]
        sp = sp - 1
        fetch(code)
        state = (sp,) + state[1:]
        return jax.lax.cond(code >= 0,
                            lambda s: inner_body(s),
                            lambda s: leaf_body(code, s),
                            state)

    t0 = jnp.where(lane_ok, tmax, tmin)
    init = (jnp.int32(1),
            t0,
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.int32))
    sp, t_best, i_best, u_b, v_b, found = jax.lax.while_loop(
        cond, step, init)
    t_ref[0] = t_best
    i_ref[0] = i_best
    u_ref[0] = u_b
    v_ref[0] = v_b
    found_ref[0] = found


def packet_traverse(bvh, o, d, tmin, tmax, *, any_hit: bool,
                    interpret: bool = False):
    """Packet traversal over ray TILEs. Same results contract as
    accel/bvh._traverse_impl: (t, prim, u, v, found); dead lanes are those
    with tmax <= tmin.

    Gradients are defined as ZERO w.r.t. every input (custom_vjp), matching
    the contract of accel/bvh.traverse/traverse_any: intersection outputs
    carry no material-parameter dependence, and pallas_call has no autodiff
    rule — without this wrapper jax.grad through the packet-routed path
    (coherent=True) would raise where the wavefront path returns zeros.
    """
    return _packet_traverse_vjp(bvh, o, d, tmin, tmax, any_hit, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _packet_traverse_vjp(bvh, o, d, tmin, tmax, any_hit, interpret):
    return _packet_traverse_impl(bvh, o, d, tmin, tmax, any_hit, interpret)


def _packet_fwd(bvh, o, d, tmin, tmax, any_hit, interpret):
    return _packet_traverse_vjp(bvh, o, d, tmin, tmax, any_hit,
                                interpret), (bvh, o, d, tmin, tmax)


def _packet_bwd(any_hit, interpret, res, g):
    return jax.tree_util.tree_map(jnp.zeros_like, res)


_packet_traverse_vjp.defvjp(_packet_fwd, _packet_bwd)


def _packet_traverse_impl(bvh, o, d, tmin, tmax, any_hit, interpret):
    n = o.shape[0]
    n_pad = -(-n // TILE) * TILE
    G = n_pad // TILE

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill)

    # [G, 3, 8, 128] SoA tiles, rays on lanes
    def pad3(x):
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        return x.T.reshape(3, G, 8, 128).transpose(1, 0, 2, 3)

    o_t = pad3(o)
    d_t = pad3(jnp.where(jnp.abs(d) < 1e-20, 1e-20, d))
    tmin_t = pad1(tmin, 1.0).reshape(G, 1, 8, 128)
    tmax_t = pad1(tmax, 0.0).reshape(G, 1, 8, 128)  # pad lanes: dead

    rows128 = _pad_rows_128(bvh.rows)
    kern = functools.partial(_packet_kernel, bvh.root_code, bvh.arity,
                             bvh.leaf_size, any_hit)
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, 8, 128), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, 3, 8, 128), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((MAX_STACK,), jnp.int32),
        ],
        interpret=interpret,
    )(rows128, o_t, d_t, tmin_t, tmax_t)
    t, i, u, v, found = (x.reshape(-1)[:n] for x in out)
    found = found >= (2 if any_hit else 1)
    t = jnp.where(found, t, BIG)
    return t, jnp.maximum(i, 0), u, v, found
