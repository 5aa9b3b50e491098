"""BVH: host-side build (C++/numpy) + on-device wavefront traversal.

Replaces OptiX's runtime acceleration structure (``scene/Scene.cpp:353``
"Trbvh") for scenes beyond the dense brute-force budget. The build is a
one-time host step (native binned-SAH via ctypes, numpy median-split
fallback); the geometry is permuted so each leaf's primitives are contiguous,
and traversal on the TPU is a masked per-ray short-stack loop where every
leaf test is a dense [rays x leaf_size] Moller-Trumbore block — the dense
inner loop keeps the VPU busy while the stack walk handles divergence with
masks (SURVEY.md section 7 "hard parts": blockwise traversal design).

Traversal runs under ``lax.while_loop`` and is wrapped in a zero-gradient
``custom_vjp``: intersection outputs carry no material-parameter dependence
(the supported differentiation scope), and this keeps ``jax.grad`` working
over the loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.math import Array

BIG = 1e30


@struct.dataclass
class Bvh:
    nodes_min: Array  # [n,3]
    nodes_max: Array  # [n,3]
    nodes_a: Array    # [n] inner: left child; leaf: ~first_prim
    nodes_b: Array    # [n] inner: right child; leaf: prim count
    leaf_size: int = struct.field(pytree_node=False, default=16)
    max_stack: int = struct.field(pytree_node=False, default=48)


# ---------------------------------------------------------------------------
# host build
# ---------------------------------------------------------------------------

def _build_numpy(prim_min, prim_max, centroid, leaf_size):
    """Median-split fallback builder (same output contract as the C++)."""
    n = prim_min.shape[0]
    order = np.arange(n, dtype=np.int32)
    nodes_min, nodes_max, nodes_a, nodes_b = [], [], [], []

    def build(first, count):
        idx = order[first:first + count]
        bmin = prim_min[idx].min(axis=0)
        bmax = prim_max[idx].max(axis=0)
        node = len(nodes_a)
        nodes_min.append(bmin)
        nodes_max.append(bmax)
        nodes_a.append(0)
        nodes_b.append(0)
        if count <= leaf_size:
            nodes_a[node] = ~first
            nodes_b[node] = count
            return node
        cen = centroid[idx]
        axis = int(np.argmax(cen.max(axis=0) - cen.min(axis=0)))
        part = np.argsort(cen[:, axis], kind="stable")
        order[first:first + count] = idx[part]
        mid = first + count // 2
        left = build(first, mid - first)
        right = build(mid, first + count - mid)
        nodes_a[node] = left
        nodes_b[node] = right
        return node

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        build(0, n)
    finally:
        sys.setrecursionlimit(old)
    return (np.asarray(nodes_min, np.float32),
            np.asarray(nodes_max, np.float32),
            np.asarray(nodes_a, np.int32), np.asarray(nodes_b, np.int32),
            order)


def build_bvh_arrays(prim_min, prim_max, leaf_size: int = 16,
                     max_stack: int = 48):
    """Build over primitive AABBs -> (Bvh, order). Tries the native C++
    binned-SAH builder first; numpy median-split fallback."""
    centroid = 0.5 * (prim_min + prim_max)
    from ..native import build_bvh_native
    out = build_bvh_native(prim_min, prim_max, centroid, leaf_size)
    if out is None:
        out = _build_numpy(np.asarray(prim_min), np.asarray(prim_max),
                           np.asarray(centroid), leaf_size)
    nmn, nmx, na, nb, order = out
    bvh = Bvh(nodes_min=jnp.asarray(nmn), nodes_max=jnp.asarray(nmx),
              nodes_a=jnp.asarray(na), nodes_b=jnp.asarray(nb),
              leaf_size=leaf_size, max_stack=max_stack)
    return bvh, np.asarray(order)


def build_scene_bvh(scene, leaf_size: int = 16):
    """Returns (scene-with-permuted-triangles, Bvh). Spheres stay dense
    (their count is tiny in every reference scene)."""
    import jax.tree_util as jtu
    g = scene.geometry
    v0 = np.asarray(g.tri_v0)
    v1 = v0 + np.asarray(g.tri_e1)
    v2 = v0 + np.asarray(g.tri_e2)
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    bvh, order = build_bvh_arrays(pmin, pmax, leaf_size)
    perm = jnp.asarray(order)
    geom = jtu.tree_map(lambda a: a, g)
    geom = g.replace(
        tri_v0=g.tri_v0[perm], tri_e1=g.tri_e1[perm], tri_e2=g.tri_e2[perm],
        tri_n0=g.tri_n0[perm], tri_n1=g.tri_n1[perm], tri_n2=g.tri_n2[perm],
        tri_uv0=g.tri_uv0[perm], tri_uv1=g.tri_uv1[perm],
        tri_uv2=g.tri_uv2[perm], tri_tangent=g.tri_tangent[perm],
        tri_bitangent=g.tri_bitangent[perm], tri_mat=g.tri_mat[perm])
    return scene.replace(geometry=geom), bvh


# ---------------------------------------------------------------------------
# device traversal
# ---------------------------------------------------------------------------

def _leaf_test(geom, first, count, leaf_size, o, d, tmin, t_best):
    """Dense MT over one leaf's contiguous prims per lane: [N, L]."""
    ks = jnp.arange(leaf_size, dtype=jnp.int32)
    idx = first[:, None] + ks                       # [N,L]
    in_leaf = ks[None, :] < count[:, None]
    safe = jnp.clip(idx, 0, geom.n_triangles - 1)
    v0 = geom.tri_v0[safe]
    e1 = geom.tri_e1[safe]
    e2 = geom.tri_e2[safe]
    pvec = jnp.cross(d[:, None, :], e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o[:, None, :] - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (in_leaf & (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
          & (u + v <= 1.0) & (t > tmin[:, None]) & (t < t_best[:, None]))
    t = jnp.where(ok, t, BIG)
    col = jnp.argmin(t, axis=1)
    ar = jnp.arange(o.shape[0])
    return t[ar, col], idx[ar, col], u[ar, col], v[ar, col]


def _traverse_impl(bvh: Bvh, geom, o, d, tmin, tmax, any_hit: bool):
    n = o.shape[0]
    S = bvh.max_stack
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

    stack = jnp.zeros((n, S), jnp.int32)   # node 0 = root pre-pushed
    sp = jnp.ones((n,), jnp.int32)
    t_best = jnp.minimum(tmax, BIG)
    i_best = jnp.full((n,), -1, jnp.int32)
    u_best = jnp.zeros((n,))
    v_best = jnp.zeros((n,))
    found = jnp.zeros((n,), jnp.bool_)

    def aabb_t(node, t_cap):
        bmin = bvh.nodes_min[node]
        bmax = bvh.nodes_max[node]
        t0 = (bmin - o) * inv_d
        t1 = (bmax - o) * inv_d
        tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), tmin)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), t_cap)
        return tn, tn <= tf

    def cond(state):
        sp = state[1]
        found = state[6]
        runnable = (sp > 0) & ~found if any_hit else sp > 0
        return jnp.any(runnable)

    def body(state):
        stack, sp, t_best, i_best, u_best, v_best, found = state
        active = sp > 0
        if any_hit:
            active = active & ~found
        spm1 = jnp.maximum(sp - 1, 0)
        node = stack[jnp.arange(n), spm1]
        sp = jnp.where(active, spm1, sp)

        a = bvh.nodes_a[node]
        b = bvh.nodes_b[node]
        is_leaf = a < 0

        # --- leaf: dense prim block -----------------------------------
        first = jnp.where(is_leaf, ~a, 0)
        count = jnp.where(active & is_leaf, b, 0)
        lt, li, lu, lv = _leaf_test(geom, first, count, bvh.leaf_size,
                                    o, d, tmin, t_best)
        better = active & is_leaf & (lt < t_best)
        t_best = jnp.where(better, lt, t_best)
        i_best = jnp.where(better, li, i_best)
        u_best = jnp.where(better, lu, u_best)
        v_best = jnp.where(better, lv, v_best)
        found = found | better

        # --- inner: test children, push near last (popped first) ------
        inner = active & ~is_leaf
        tn_l, hit_l = aabb_t(a, t_best)
        tn_r, hit_r = aabb_t(b, t_best)
        hit_l = hit_l & inner
        hit_r = hit_r & inner
        near_is_left = tn_l <= tn_r
        first_child = jnp.where(near_is_left, b, a)   # far pushed first
        first_ok = jnp.where(near_is_left, hit_r, hit_l)
        second_child = jnp.where(near_is_left, a, b)  # near pushed last
        second_ok = jnp.where(near_is_left, hit_l, hit_r)

        ar = jnp.arange(n)
        push1 = first_ok & (sp < S)
        stack = stack.at[ar, jnp.where(push1, sp, S)].set(
            first_child, mode="drop")   # OOB slot S drops the write
        sp = sp + push1.astype(jnp.int32)
        push2 = second_ok & (sp < S)
        stack = stack.at[ar, jnp.where(push2, sp, S)].set(
            second_child, mode="drop")
        sp = sp + push2.astype(jnp.int32)

        return stack, sp, t_best, i_best, u_best, v_best, found

    state = (stack, sp, t_best, i_best, u_best, v_best, found)
    state = jax.lax.while_loop(cond, body, state)
    _, _, t_best, i_best, u_best, v_best, found = state
    return t_best, i_best, u_best, v_best, found


@jax.custom_vjp
def traverse(bvh: Bvh, geom, o, d, tmin, tmax):
    """Closest hit via BVH: returns (t, prim_idx, u, v, found). Gradients
    are defined as zero (geometry-only computation; see module docstring)."""
    return _traverse_impl(bvh, geom, o, d, tmin, tmax, any_hit=False)


def _traverse_fwd(bvh, geom, o, d, tmin, tmax):
    return traverse(bvh, geom, o, d, tmin, tmax), (bvh, geom, o, d, tmin,
                                                   tmax)


def _traverse_bwd(res, g):
    bvh, geom, o, d, tmin, tmax = res
    zeros = jax.tree_util.tree_map(jnp.zeros_like, (bvh, geom, o, d, tmin,
                                                    tmax))
    return zeros


traverse.defvjp(_traverse_fwd, _traverse_bwd)


@jax.custom_vjp
def traverse_any(bvh: Bvh, geom, occluder_mask, o, d, tmin, tmax):
    """Any-hit (occlusion) with per-triangle occluder mask; early-outs once
    a lane is blocked. Returns [N] bool."""
    t, idx, _, _, found = _traverse_impl(
        bvh, _masked_geom(geom, occluder_mask), o, d, tmin, tmax,
        any_hit=True)
    return found


def _masked_geom(geom, occluder_mask):
    """Degenerate the non-occluder triangles (emitters) so they never hit."""
    z = jnp.where(occluder_mask[:, None], geom.tri_e1, 0.0)
    z2 = jnp.where(occluder_mask[:, None], geom.tri_e2, 0.0)
    return geom.replace(tri_e1=z, tri_e2=z2)


def _any_fwd(bvh, geom, occluder_mask, o, d, tmin, tmax):
    return traverse_any(bvh, geom, occluder_mask, o, d, tmin, tmax), \
        (bvh, geom, occluder_mask, o, d, tmin, tmax)


def _any_bwd(res, g):
    return jax.tree_util.tree_map(jnp.zeros_like, res)


traverse_any.defvjp(_any_fwd, _any_bwd)
