"""End-to-end timing of the packet BVH kernel vs the XLA wavefront
traversal on the real chip: Atrium camera rays (the coherent population
it is routed to) and random rays (the population it is NOT for).

Usage: python scripts/packet_bench.py [--scene Atrium] [--size 512]
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(fn, reps=3):
    out = fn()
    for leaf in out:
        leaf.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = fn()
        for leaf in o:
            leaf.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="Atrium")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from oppositerenderer_tpu.accel import bvh as B
    from oppositerenderer_tpu.accel.pallas_bvh import packet_traverse
    from oppositerenderer_tpu.integrators.common import pixel_coords
    from oppositerenderer_tpu.scene import get_scene_by_name

    scene, cam = get_scene_by_name(args.scene)
    bvh = scene.bvh
    assert bvh is not None
    W = H = args.size
    n = W * H
    px, py = pixel_coords(W, H)
    jit = jnp.full((n, 2), 0.5)
    o_c, d_c = cam.generate_rays(px, py, jit, W, H)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e30)

    rng = np.random.default_rng(0)
    mn = np.asarray(scene.aabb_min)
    mx = np.asarray(scene.aabb_max)
    o_r = jnp.asarray(rng.uniform(mn, mx, (n, 3)).astype(np.float32))
    d_r = rng.normal(size=(n, 3)).astype(np.float32)
    d_r /= np.linalg.norm(d_r, axis=1, keepdims=True)
    d_r = jnp.asarray(d_r)

    interp = jax.default_backend() == "cpu"
    f_pack = jax.jit(lambda o, d: packet_traverse(
        bvh, o, d, tmin, tmax, any_hit=False, interpret=interp))
    f_wave = jax.jit(lambda o, d: B._traverse_impl(
        bvh, scene.geometry, o, d, tmin, tmax, any_hit=False))

    print(f"device={jax.devices()[0]} scene={args.scene} n={n}")
    for tag, o, d in (("camera", o_c, d_c), ("random", o_r, d_r)):
        tw = med(lambda: f_wave(o, d), args.reps)
        print(f"wavefront {tag:7s} {tw*1e3:9.2f} ms "
              f"({tw*1e9/n:6.0f} ns/ray, {n/tw/1e6:6.2f} Mrays/s)")
        tp = med(lambda: f_pack(o, d), args.reps)
        print(f"packet    {tag:7s} {tp*1e3:9.2f} ms "
              f"({tp*1e9/n:6.0f} ns/ray, {n/tp/1e6:6.2f} Mrays/s)")
        # sanity: results agree
        a = f_wave(o, d)
        b = f_pack(o, d)
        fa = np.asarray(a[4])
        fb = np.asarray(b[4])
        agree = (fa == fb).mean()
        print(f"  found-agree {agree:.4f}")


if __name__ == "__main__":
    main()
