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

PERF ANALYSIS & the Pallas decision (round-2, v5e, Atrium 253k tris,
512^2 camera wave = 262k rays; the north star asked for "BVH traversal as
a Pallas kernel — build it or bound it"):

* table-row gathers are BANDWIDTH-priced, not latency-priced: gathering
  262k random rows of a [131k, 16] f32 table measures 0.091 ms =
  ~176 GB/s (microbench in round-2 notes); wider rows are FASTER per
  byte (0.11 ns/row at width 128). The node/leaf fetch stream therefore
  already runs at the memory system's speed — a hand-written Pallas
  kernel cannot fetch divergent nodes faster than XLA's gather, because
  the TPU has no per-lane gather hardware to hand-tune; Mosaic lowers
  divergent VMEM indexing to the same serialized machinery.
* what WAS slow (round-1 design) is per-lane dynamic indexing of the
  [N, S] traversal stack: ``stack[ar, sp]`` reads measure 3.2 ms and
  ``.at[ar, sp].set`` writes 2.1 ms at 262k x 48 — 30x the node fetch.
  The round-2 redesign eliminates most of them: the near child continues
  in a register (``cur``), only far children of both-hit nodes touch the
  stack, and the remaining push/pop use one-hot masked selects (0.8 ms).
  Camera-wave closest hit: 1.00 s -> 0.61 s.
* the residual bound is LOCKSTEP DIVERGENCE: p50=99 / p95=327 node steps
  per ray; every while_loop round pays the full wave. The compaction
  ladder (argsort live lanes, shrink 2x per level) recovers most of the
  tail. A Pallas kernel would face the same divergence with the same
  memory system, so the XLA formulation is kept — revisit only with an
  algorithmic change (wider BVH arity or ray reordering), not a kernel
  rewrite.
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
    """Flattened BVH.

    Two representations coexist:
    * the plain node arrays (nodes_min/max/a/b) from the builder — kept for
      inspection/tests;
    * the PACKED traversal layout (node_rows/leaf_rows), built by
      ``build_scene_bvh``: every per-step random-row gather on TPU costs
      ~6 ns/row regardless of width, so traversal state is packed to ONE
      row gather per node pop (both children's AABBs + child codes live in
      the parent row) and ONE row gather per visited leaf (its <=L
      triangles, occluder flags, and first-prim id inline).

    Child codes: inner child = node index (>=0); leaf child =
    ``-(leaf_row * 32 + count) - 1`` (count <= 31).
    """

    nodes_min: Array  # [n,3]
    nodes_max: Array  # [n,3]
    nodes_a: Array    # [n] inner: left child; leaf: ~first_prim
    nodes_b: Array    # [n] inner: right child; leaf: prim count
    # packed traversal layout (None until build_scene_bvh packs it)
    node_rows: Array = None   # [n,16] f32: lmin,lmax,rmin,rmax,a_code,b_code
    leaf_rows: Array = None   # [m,W] f32: L*9 tri | L occluder flags | first
    root_code: int = struct.field(pytree_node=False, default=0)
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


def _bitcast_i2f(x: np.ndarray) -> np.ndarray:
    return x.astype(np.int32).view(np.float32)


def _pack_bvh(nmn, nmx, na, nb, tri9_perm, occluder, leaf_size):
    """Build the packed traversal layout (see Bvh docstring). Host numpy."""
    assert leaf_size <= 31, "leaf count must fit 5 bits of the code"
    n_nodes = na.shape[0]
    is_leaf = na < 0
    leaf_row_of = np.cumsum(is_leaf) - 1          # node -> leaf row

    codes = np.where(is_leaf,
                     -(leaf_row_of * 32 + nb) - 1,
                     np.arange(n_nodes)).astype(np.int32)

    node_rows = np.zeros((n_nodes, 16), np.float32)
    inner = np.where(~is_leaf)[0]
    a = na[inner]
    b = nb[inner]
    node_rows[inner, 0:3] = nmn[a]
    node_rows[inner, 3:6] = nmx[a]
    node_rows[inner, 6:9] = nmn[b]
    node_rows[inner, 9:12] = nmx[b]
    node_rows[inner, 12] = _bitcast_i2f(codes[a])
    node_rows[inner, 13] = _bitcast_i2f(codes[b])

    # leaf rows: L triangles inline + occluder flags + first prim id
    L = leaf_size
    width = 9 * L + L + 1
    width = -(-width // 8) * 8
    leaf_nodes = np.where(is_leaf)[0]
    m = leaf_nodes.shape[0]
    leaf_rows = np.zeros((m, width), np.float32)
    first = (~na[leaf_nodes]).astype(np.int64)
    count = nb[leaf_nodes].astype(np.int64)
    n_tris = tri9_perm.shape[0]
    assert n_tris < (1 << 24), "first-prim id must be exact in f32"
    k = np.arange(L)
    idx = np.minimum(first[:, None] + k, n_tris - 1)      # [m, L]
    valid = k[None, :] < count[:, None]
    tri = np.where(valid[..., None], tri9_perm[idx], 0.0)  # [m, L, 9]
    leaf_rows[:, :9 * L] = tri.reshape(m, 9 * L)
    leaf_rows[:, 9 * L:9 * L + L] = np.where(valid, occluder[idx], 0.0)
    leaf_rows[:, 9 * L + L] = first.astype(np.float32)
    return node_rows, leaf_rows, int(codes[0])


def _tree_depth(na: np.ndarray, nb: np.ndarray) -> int:
    """Max root->leaf depth (#inner levels) of the flattened tree."""
    depth = 0
    stack = [(0, 1)]
    while stack:
        node, d = stack.pop()
        if na[node] < 0:
            depth = max(depth, d)
        else:
            stack.append((int(na[node]), d + 1))
            stack.append((int(nb[node]), d + 1))
    return depth


def build_scene_bvh(scene, leaf_size: int = 4):
    """Returns (scene-with-permuted-triangles, Bvh). Spheres stay dense
    (their count is tiny in every reference scene). Default leaf_size 4:
    small inline leaves measured fastest on TPU (leaf cost is one wide row
    gather, so fewer triangles per visited leaf wins)."""
    g = scene.geometry
    v0 = np.asarray(g.tri_v0)
    v1 = v0 + np.asarray(g.tri_e1)
    v2 = v0 + np.asarray(g.tri_e2)
    pmin = np.minimum(np.minimum(v0, v1), v2)
    pmax = np.maximum(np.maximum(v0, v1), v2)
    bvh, order = build_bvh_arrays(pmin, pmax, leaf_size)
    perm = jnp.asarray(order)
    geom = g.replace(
        tri_v0=g.tri_v0[perm], tri_e1=g.tri_e1[perm], tri_e2=g.tri_e2[perm],
        tri_n0=g.tri_n0[perm], tri_n1=g.tri_n1[perm], tri_n2=g.tri_n2[perm],
        tri_uv0=g.tri_uv0[perm], tri_uv1=g.tri_uv1[perm],
        tri_uv2=g.tri_uv2[perm], tri_tangent=g.tri_tangent[perm],
        tri_bitangent=g.tri_bitangent[perm], tri_mat=g.tri_mat[perm])

    # pack traversal layout from the PERMUTED triangles; occluder flags are
    # baked (emitter surfaces never occlude — DiffuseEmitter.cu:63-68)
    from ..scene.types import EMITTER
    tri9 = np.concatenate([np.asarray(geom.tri_v0), np.asarray(geom.tri_e1),
                           np.asarray(geom.tri_e2)], axis=1)  # [T,9]
    is_em = (np.asarray(scene.materials.kind)[np.asarray(geom.tri_mat)]
             == EMITTER)
    node_rows, leaf_rows, root_code = _pack_bvh(
        np.asarray(bvh.nodes_min), np.asarray(bvh.nodes_max),
        np.asarray(bvh.nodes_a), np.asarray(bvh.nodes_b),
        tri9, (~is_em).astype(np.float32), leaf_size)
    # size the traversal stack to the ACTUAL tree depth: the register-cursor
    # design only ever pushes the far child of a both-hit node, so pending
    # entries never exceed the root->leaf depth. Every stack op is a masked
    # one-hot select over [N, S] (HBM traffic linear in S), so S = depth+1
    # instead of the old fixed 48 cuts the dominant traversal cost 2-4x on
    # typical scenes.
    depth = _tree_depth(np.asarray(bvh.nodes_a), np.asarray(bvh.nodes_b))
    bvh = bvh.replace(node_rows=jnp.asarray(node_rows),
                      leaf_rows=jnp.asarray(leaf_rows),
                      root_code=root_code,
                      max_stack=depth + 1)
    return scene.replace(geometry=geom), bvh


# ---------------------------------------------------------------------------
# device traversal
# ---------------------------------------------------------------------------

# node steps fused per while_loop round. Swept on v5e (scripts/bvh_tune.py,
# Atrium 8k tris, 1M incoherent rays): 4 -> 1.06 s, 8 -> 1.17 s,
# 16 -> 1.41 s, 32 -> 1.43 s — smaller rounds let the ladder compact
# sooner; the round bookkeeping it amortizes is cheaper than the wasted
# lockstep steps. (Same sweep: ladder off = 3.9 s; leaf_size 2/4 tie at
# ~1.1 s with 1 and 8 worse; Morton ray sorting: no effect.)
INNER_STEPS = 4
# below this lane count the compaction ladder stops (compaction overhead
# beats the lockstep saving only for large waves)
LADDER_MIN = 16384
# wave shrink factor per ladder level (2 measured ~8% faster than 4 on the
# Atrium camera wave: more compactions, less lockstep tail)
_LADDER_DIV = 2


def _init_state(bvh: Bvh, o, d, tmin, tmax):
    n = o.shape[0]
    return dict(
        o=o, d=d, tmin=tmin,
        cur=jnp.full((n,), bvh.root_code, jnp.int32),
        cur_ok=jnp.ones((n,), jnp.bool_),
        stack=jnp.zeros((n, bvh.max_stack), jnp.int32),
        sp=jnp.zeros((n,), jnp.int32),
        t_best=jnp.minimum(tmax, BIG),
        i_best=jnp.full((n,), -1, jnp.int32),
        u_best=jnp.zeros((n,)), v_best=jnp.zeros((n,)),
        found=jnp.zeros((n,), jnp.bool_))


def _runnable(st, any_hit):
    run = st["cur_ok"] | (st["sp"] > 0)
    if any_hit:
        run = run & ~st["found"]
    return run


def _oh_read(stack, pos):
    """stack[i, pos[i]] without a per-lane column gather: one-hot select.
    Per-lane dynamic indexing along a minor axis lowers to serialized
    gathers/scatters on TPU (measured 3.2 ms per read and 2.1 ms per write
    at 262k x 48 on v5e vs 0.8 ms for the one-hot form)."""
    S = stack.shape[1]
    m = jnp.arange(S, dtype=pos.dtype)[None, :] == pos[:, None]
    return jnp.sum(jnp.where(m, stack, 0), axis=1)


def _oh_write(stack, pos, val, mask):
    S = stack.shape[1]
    m = ((jnp.arange(S, dtype=pos.dtype)[None, :] == pos[:, None])
         & mask[:, None])
    return jnp.where(m, val[:, None], stack)


def _traverse_impl(bvh: Bvh, geom, o, d, tmin, tmax, any_hit: bool):
    """Wavefront traversal: register-top cursor + one-hot stack +
    immediate leaf tests, under a compaction ladder.

    Design (v5e-measured costs drove every choice):

    * the NEAR child of an inner node continues in a per-lane register
      (``cur``) instead of round-tripping through the stack — only the far
      child of a both-hit node touches stack memory, so most steps do ZERO
      stack operations;
    * stack push/pop use one-hot masked selects (see _oh_read) — per-lane
      dynamic indexing of a [N, S] array is the single most expensive op
      family in a traversal round on TPU;
    * leaf children are tested IMMEDIATELY as a dense [N, L]
      Moller-Trumbore block fed by one packed leaf-row gather (~0.1 ms at
      262k lanes) — table-row gathers are bandwidth-priced on TPU, not
      latency-priced, so there is nothing to batch;
    * the while-loop is LOCKSTEP: every round pays the full wave until the
      slowest lane finishes (p50=99 / p95=327 node steps per camera ray on
      the Atrium), so once the unfinished count drops below a quarter of
      the wave the live lanes are compacted 4x and the loop continues
      there (recursively, down to LADDER_MIN lanes).
    """
    st = _init_state(bvh, o, d, tmin, tmax)
    st = _solve(bvh, st, any_hit)
    return (st["t_best"], st["i_best"], st["u_best"], st["v_best"],
            st["found"])


def _solve(bvh: Bvh, st, any_hit: bool):
    n = st["o"].shape[0]
    if n <= LADDER_MIN:
        return _run_until(bvh, st, any_hit, cap=0)
    n_next = n // _LADDER_DIV
    st = _run_until(bvh, st, any_hit, cap=n_next)
    run = _runnable(st, any_hit)
    sel = jnp.argsort(jnp.where(run, 0, 1))[:n_next]
    sub = jax.tree_util.tree_map(lambda a: a[sel], st)
    sub = _solve(bvh, sub, any_hit)
    return jax.tree_util.tree_map(
        lambda full, s: full.at[sel].set(s), st, sub)


def _run_until(bvh: Bvh, st, any_hit: bool, cap: int):
    """Run traversal rounds until <= ``cap`` lanes remain unfinished."""
    n = st["o"].shape[0]
    S = bvh.max_stack
    L = bvh.leaf_size
    n_leaves = bvh.leaf_rows.shape[0]
    ar = jnp.arange(n)

    def outer_cond(st):
        return jnp.sum(_runnable(st, any_hit)) > cap

    def outer(st):
        o, d, tmin = st["o"], st["d"], st["tmin"]
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

        def step(_, st2):
            (cur, cur_ok, stack, sp, t_best, i_best, u_best, v_best,
             found) = st2
            if any_hit:
                cur_ok = cur_ok & ~found

            # refill the cursor from the stack where it ran dry
            need = ~cur_ok & (sp > 0)
            if any_hit:
                need = need & ~found
            top = _oh_read(stack, sp - 1)
            cur = jnp.where(need, top, cur)
            cur_ok = cur_ok | need
            sp = sp - need.astype(jnp.int32)

            is_leaf_c = cur_ok & (cur < 0)

            # ---- leaf: dense [N, L] Moller-Trumbore now ----------------
            dec = -cur - 1
            lrow = bvh.leaf_rows[jnp.where(is_leaf_c, jnp.minimum(
                dec >> 5, n_leaves - 1), 0)]               # [N, W]
            count = jnp.where(is_leaf_c, dec & 31, 0)
            tri = lrow[:, :9 * L].reshape(n, L, 9)
            occ_f = lrow[:, 9 * L:9 * L + L]
            first = lrow[:, 9 * L + L].astype(jnp.int32)
            ks = jnp.arange(L)
            cand = ks[None, :] < count[:, None]
            if any_hit:
                cand = cand & (occ_f > 0.5)
            ob = o[:, None, :]
            db = d[:, None, :]
            v0 = tri[..., 0:3]
            e1 = tri[..., 3:6]
            e2 = tri[..., 6:9]
            pvec = jnp.cross(db, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = ob - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(db * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            ok = (cand & (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1.0) & (t > tmin[:, None])
                  & (t < t_best[:, None]))
            t = jnp.where(ok, t, BIG)
            if any_hit:
                found = found | jnp.any(t < BIG, axis=1)
            else:
                j = jnp.argmin(t, axis=1)
                tj = t[ar, j]
                better = tj < t_best
                t_best = jnp.where(better, tj, t_best)
                i_best = jnp.where(better, first + j, i_best)
                u_best = jnp.where(better, u[ar, j], u_best)
                v_best = jnp.where(better, v[ar, j], v_best)
                found = found | better

            # ---- inner: slab both children from the packed row ---------
            is_inner = cur_ok & (cur >= 0)
            row = bvh.node_rows[jnp.where(is_inner, cur, 0)]   # [N,16]

            def slab(bmin, bmax):
                t0 = (bmin - o) * inv_d
                t1 = (bmax - o) * inv_d
                tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), -1), tmin)
                tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), -1), t_best)
                return tn, tn <= tf

            tn_l, hit_l = slab(row[:, 0:3], row[:, 3:6])
            tn_r, hit_r = slab(row[:, 6:9], row[:, 9:12])
            a_code = jax.lax.bitcast_convert_type(row[:, 12], jnp.int32)
            b_code = jax.lax.bitcast_convert_type(row[:, 13], jnp.int32)
            hit_l = hit_l & is_inner
            hit_r = hit_r & is_inner

            near_is_left = tn_l <= tn_r
            near = jnp.where(near_is_left, a_code, b_code)
            far = jnp.where(near_is_left, b_code, a_code)
            near_hit = jnp.where(near_is_left, hit_l, hit_r)
            far_hit = jnp.where(near_is_left, hit_r, hit_l)

            # both hit: far -> stack, near -> cursor. One hit: cursor.
            push = near_hit & far_hit & (sp < S)
            stack = _oh_write(stack, sp, far, push)
            sp = sp + push.astype(jnp.int32)
            go = jnp.where(near_hit, near, far)
            cur = jnp.where(is_inner, go, cur)
            cur_ok = jnp.where(is_inner, near_hit | far_hit,
                               cur_ok & ~is_leaf_c)
            return (cur, cur_ok, stack, sp, t_best, i_best, u_best,
                    v_best, found)

        out = jax.lax.fori_loop(
            0, INNER_STEPS, step,
            (st["cur"], st["cur_ok"], st["stack"], st["sp"], st["t_best"],
             st["i_best"], st["u_best"], st["v_best"], st["found"]))
        (cur, cur_ok, stack, sp, t_best, i_best, u_best, v_best,
         found) = out
        return dict(o=o, d=d, tmin=tmin, cur=cur, cur_ok=cur_ok,
                    stack=stack, sp=sp, t_best=t_best, i_best=i_best,
                    u_best=u_best, v_best=v_best, found=found)

    return jax.lax.while_loop(outer_cond, outer, st)


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
    """Any-hit (occlusion); early-outs once a lane is blocked. Returns [N]
    bool. The occluder mask (emitters never occlude) is BAKED into the
    packed leaf rows at build time — the ``occluder_mask`` argument is kept
    for API stability and ignored."""
    del occluder_mask
    _, _, _, _, found = _traverse_impl(bvh, geom, o, d, tmin, tmax,
                                       any_hit=True)
    return found


def _any_fwd(bvh, geom, occluder_mask, o, d, tmin, tmax):
    return traverse_any(bvh, geom, occluder_mask, o, d, tmin, tmax), \
        (bvh, geom, occluder_mask, o, d, tmin, tmax)


def _any_bwd(res, g):
    return jax.tree_util.tree_map(jnp.zeros_like, res)


traverse_any.defvjp(_any_fwd, _any_bwd)
