"""Empirical BVH traversal tuning on the current backend.

Times `accel.bvh.traverse` / `traverse_any` on a photon-pass-like wave
(incoherent rays from the scene interior) across the tunable knobs:
INNER_STEPS, the compaction ladder, and ray sorting by direction octant +
origin Morton code (coherence). Drives the decisions recorded in
accel/bvh.py's perf analysis.

Usage: python scripts/bvh_tune.py [--scene Atrium:0.25] [--n 1048576]
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(fn, reps=3):
    out = fn()
    jax_block(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax_block(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="Atrium:0.25")
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from oppositerenderer_tpu.accel import bvh as B
    from oppositerenderer_tpu.scene import get_scene_by_name

    scene, cam = get_scene_by_name(args.scene)
    assert scene.bvh is not None
    n = args.n
    print(f"device={jax.devices()[0]} scene={args.scene} n={n} "
          f"max_stack={scene.bvh.max_stack}")

    # photon-like wave: origins uniform in the scene AABB, directions
    # uniform on the sphere (the worst-coherence case)
    rng = np.random.default_rng(0)
    mn = np.asarray(scene.aabb_min)
    mx = np.asarray(scene.aabb_max)
    o = jnp.asarray(rng.uniform(mn, mx, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e30)

    geom = scene.geometry
    bvh = scene.bvh

    def run_closest(o, d):
        return B.traverse(bvh, geom, o, d, tmin, tmax)[0]

    def run_any(o, d):
        return B.traverse_any(bvh, geom, None, o, d, tmin, tmax)

    f_closest = jax.jit(run_closest)
    f_any = jax.jit(run_any)
    base = med(lambda: f_closest(o, d), args.reps)
    print(f"closest unsorted      {base*1e3:9.2f} ms "
          f"({base*1e9/n:.1f} ns/ray)")
    anyt = med(lambda: f_any(o, d), args.reps)
    print(f"any-hit unsorted      {anyt*1e3:9.2f} ms")

    # coherence: sort rays by (direction octant, origin morton)
    def morton_keys(o, d):
        q = jnp.clip(((o - jnp.asarray(mn)) / (jnp.asarray(mx - mn))
                      * 255.0).astype(jnp.int32), 0, 255)

        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x
        m = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
             | (spread(q[:, 2]) << 2))
        octant = ((d[:, 0] > 0).astype(jnp.int32)
                  | ((d[:, 1] > 0).astype(jnp.int32) << 1)
                  | ((d[:, 2] > 0).astype(jnp.int32) << 2))
        return (octant << 24) | (m >> 3)

    @jax.jit
    def sort_rays(o, d):
        k = morton_keys(o, d)
        _, idx = jax.lax.sort((k, jnp.arange(n, dtype=jnp.int32)),
                              num_keys=1)
        return o[idx], d[idx]

    os_, ds_ = sort_rays(o, d)
    ts = med(lambda: sort_rays(o, d), args.reps)
    srt = med(lambda: f_closest(os_, ds_), args.reps)
    print(f"closest morton-sorted {srt*1e3:9.2f} ms (+{ts*1e3:.2f} ms sort)"
          f" -> {'WIN' if srt + ts < base else 'no win'}")

    # knob sweep: INNER_STEPS x ladder
    for inner in (4, 8, 16, 32):
        for ladder in (B.LADDER_MIN, 10**9):   # 10^9 disables the ladder
            if ladder >= 10**9 and inner != 4:
                continue
            B.INNER_STEPS = inner
            old_min, B.LADDER_MIN = B.LADDER_MIN, ladder
            try:
                f = jax.jit(lambda o, d: B.traverse(
                    bvh, geom, o, d, tmin, tmax)[0])
                t = med(lambda: f(o, d), args.reps)
                print(f"inner={inner:2d} ladder={'on ' if ladder < 10**9 else 'off'}"
                      f" {t*1e3:9.2f} ms", flush=True)
            finally:
                B.LADDER_MIN = old_min
    B.INNER_STEPS = 8

    # arity sweep: wider nodes = fewer, wider lockstep steps. Rebuild per A.
    from oppositerenderer_tpu.scene import get_scene_by_name as _g
    for A in (4, 8, 16):
        fresh, _ = _g(args.scene)
        fresh = fresh.replace(bvh=None)
        sc2, bvh2 = B.build_scene_bvh(fresh, arity=A)
        f = jax.jit(lambda o, d, b=bvh2, g2=sc2.geometry: B.traverse(
            b, g2, o, d, tmin, tmax)[0])
        fa = jax.jit(lambda o, d, b=bvh2, g2=sc2.geometry: B.traverse_any(
            b, g2, None, o, d, tmin, tmax))
        t = med(lambda: f(o, d), args.reps)
        t2 = med(lambda: fa(o, d), args.reps)
        print(f"arity={A:2d} rows={bvh2.rows.shape} L={bvh2.leaf_size} "
              f"stack={bvh2.max_stack} closest {t*1e3:9.2f} ms "
              f"any {t2*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
