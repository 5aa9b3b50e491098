"""Packet-traversal viability: per-tile node-visit UNION vs per-ray visits.

The Pallas packet kernel amortizes one node row over a whole ray tile, so
its cost per tile is the UNION of nodes its rays visit. This script
measures that union on the real wide BVH for:
  (a) camera-ray tiles (32x32 pixel blocks at 512^2) — the coherent case,
  (b) Morton-sorted random rays — manufactured coherence for bounce rays,
  (c) unsorted random rays — worst case.
Reports union size vs mean per-ray visit count (the inflation factor the
packet design pays).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def traverse_visits(rows, root_code, A, o, d, t_cap=1e30):
    """Python reference traversal; returns the list of row ids visited
    (inner AND leaf rows) for one ray — WITHOUT leaf MT pruning (upper
    bound on packet work; per-ray t_best pruning only via slab entry)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    visited = []
    t_best = t_cap
    stack = [root_code]
    while stack:
        code = stack.pop()
        if code < 0:
            visited.append(-code - 1 >> 5)
            continue
        visited.append(code)
        row = rows[code]
        ch = row[:6 * A].reshape(A, 6)
        valid = int(np.float32(row[7 * A]).view(np.int32))
        t0 = (ch[:, 0:3] - o) * inv
        t1 = (ch[:, 3:6] - o) * inv
        tn = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-3)
        tf = np.minimum(np.maximum(t0, t1).min(axis=1), t_best)
        hit = (tn <= tf) & (((valid >> np.arange(A)) & 1).astype(bool))
        codes = row[6 * A:7 * A].view(np.int32)
        order = np.argsort(-tn)          # far first -> near popped first
        for k in order:
            if hit[k]:
                stack.append(int(codes[k]))
    return visited


def morton3(p, bits=10):
    q = np.clip((p * (1 << bits)).astype(np.int64), 0, (1 << bits) - 1)

    def spread(x):
        x = (x | (x << 20)) & 0x000001FFC00003FF
        x = (x | (x << 10)) & 0x0007E007C00F801F
        x = (x | (x << 4)) & 0x00786070C0E181C3
        x = (x | (x << 2)) & 0x0199219243248649
        x = (x | (x << 1)) & 0x0649249249249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def main():
    import jax.numpy as jnp
    from oppositerenderer_tpu.scene import get_scene_by_name
    from oppositerenderer_tpu.integrators.common import pixel_coords

    scene, cam = get_scene_by_name(sys.argv[1] if len(sys.argv) > 1
                                   else "Atrium")
    bvh = scene.bvh
    rows = np.asarray(bvh.rows)
    A = bvh.arity
    TILE = 1024
    rng = np.random.default_rng(0)

    def report(tag, o, d, n_tiles=6):
        unions, means = [], []
        picks = np.linspace(0, o.shape[0] // TILE - 1, n_tiles).astype(int)
        for t in picks:
            sl = slice(t * TILE, (t + 1) * TILE)
            sets = [traverse_visits(rows, bvh.root_code, A, o[i], d[i])
                    for i in range(sl.start, sl.stop, 4)]  # sample 256/tile
            u = set()
            for s in sets:
                u |= set(s)
            unions.append(len(u))
            means.append(np.mean([len(s) for s in sets]))
        print(f"{tag:28s} union(p50)={np.median(unions):7.0f}  "
              f"per-ray mean={np.mean(means):6.1f}  "
              f"inflation={np.median(unions)/np.mean(means):5.1f}x")

    # (a) camera tiles: 32x32 pixel blocks at 512^2
    W = H = 512
    px, py = pixel_coords(W, H)
    px = np.asarray(px).reshape(H, W)
    py = np.asarray(py).reshape(H, W)
    blocks = []
    for by in range(0, 2):
        for bx in range(0, 3):
            blocks.append((px[by * 32:(by + 1) * 32,
                              bx * 32:(bx + 1) * 32].reshape(-1),
                           py[by * 32:(by + 1) * 32,
                              bx * 32:(bx + 1) * 32].reshape(-1)))
    pxs = np.concatenate([b[0] for b in blocks])
    pys = np.concatenate([b[1] for b in blocks])
    jit = jnp.full((pxs.size, 2), 0.5)
    o, d = cam.generate_rays(jnp.asarray(pxs), jnp.asarray(pys), jit, W, H)
    report("camera 32x32 blocks", np.asarray(o), np.asarray(d))

    # (b)/(c) random rays in the scene AABB. The POOL is render-scale
    # (512^2 lanes) so sorting has enough rays to form coherent tiles —
    # measuring sort quality on a 6-tile pool undersells it badly.
    n = 1 << 18
    mn = np.asarray(scene.aabb_min)
    mx = np.asarray(scene.aabb_max)
    o_r = rng.uniform(mn, mx, (n, 3)).astype(np.float32)
    d_r = rng.normal(size=(n, 3)).astype(np.float32)
    d_r /= np.linalg.norm(d_r, axis=1, keepdims=True)
    report("random unsorted", o_r, d_r)

    # Morton sort by (origin cell, direction octant)
    pn = (o_r - mn) / np.maximum(mx - mn, 1e-9)
    key = morton3(pn) << 3
    oct_r = ((d_r[:, 0] > 0).astype(np.int64)
             | ((d_r[:, 1] > 0).astype(np.int64) << 1)
             | ((d_r[:, 2] > 0).astype(np.int64) << 2))
    key |= oct_r
    order = np.argsort(key, kind="stable")
    report("random origin-major sort", o_r[order], d_r[order])

    # direction-MAJOR binning: (octant, quantized dir, coarse origin) —
    # the classic ray-binning key; direction coherence is what shortens
    # the packet's union
    db = np.clip(((d_r * 0.5 + 0.5) * 8).astype(np.int64), 0, 7)
    dirkey = (db[:, 0] << 6) | (db[:, 1] << 3) | db[:, 2]
    key2 = (oct_r << 45) | (dirkey << 36) | (morton3(pn, 12) >> 0) % (1 << 36)
    order2 = np.argsort(key2, kind="stable")
    report("random dir-major sort", o_r[order2], d_r[order2])

    # (d) bounce-like rays: surface-ish origins + random dirs, dir-major
    # sorted at render scale
    o_b = o_r
    d_b = d_r
    db2 = np.clip(((d_b * 0.5 + 0.5) * 16).astype(np.int64), 0, 15)
    dk = (db2[:, 0] << 8) | (db2[:, 1] << 4) | db2[:, 2]
    pn2 = (o_b - mn) / np.maximum(mx - mn, 1e-9)
    k3 = (dk << 30) | (morton3(pn2) & ((1 << 30) - 1))
    o3 = np.argsort(k3, kind="stable")
    report("random dir16-major sort", o_b[o3], d_b[o3])


if __name__ == "__main__":
    main()
