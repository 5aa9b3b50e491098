"""Benchmark: rays/s per chip on the classic Cornell scenes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting is wavefront-honest: every intersect() invocation counts its
full lane width (closest-hit and shadow rays), because that is the work the
chip executes regardless of lane liveness. The reference publishes no
numbers (BASELINE.md); vs_baseline is measured against a nominal 1e8 rays/s
for the reference's OptiX-era single GPU.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def count_rays_per_iteration(cfg):
    """Closest-hit + shadow ray lanes per PT iteration."""
    n = cfg.width * cfg.height
    segs = cfg.pt_max_segments
    shadow = segs * cfg.pt_shadow_samples
    return n * (segs + shadow)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small + few iters")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--method", default="pt", choices=["pt", "ppm", "vcm"])
    ap.add_argument("--scene", default="CornellSmall",
                    help="built-in scene name (e.g. Atrium = Sponza-class "
                         "260k-tri stress scene) or .dae/.obj path")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="Pallas TPU intersection kernels (default: auto)")
    ap.add_argument("--cheap-rng", action="store_true",
                    help="hash RNG (USE_CHEAP_RANDOM analog)")
    args = ap.parse_args()

    from oppositerenderer_tpu.config import RenderConfig, RenderMethod
    from oppositerenderer_tpu.core.rng import make_root_key
    from oppositerenderer_tpu.integrators import ppm, pt, vcm
    from oppositerenderer_tpu.scene import get_scene_by_name

    size = 128 if args.quick else args.size
    iters = 4 if args.quick else args.iters
    method = {"pt": RenderMethod.PATH_TRACING,
              "ppm": RenderMethod.PROGRESSIVE_PHOTON_MAPPING,
              "vcm": RenderMethod.VCM_BIDIRECTIONAL_PATH_TRACING}[args.method]

    use_pallas = args.pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from oppositerenderer_tpu.accel import set_backend
        set_backend("pallas")
    if args.cheap_rng:
        from oppositerenderer_tpu.core.rng import set_rng_mode
        set_rng_mode("cheap")

    scene, camera = get_scene_by_name(args.scene)
    cfg = RenderConfig(width=size, height=size, render_method=method,
                       photons_per_iteration=1 << (16 if args.quick else 20))
    key = make_root_key(0)

    if method == RenderMethod.PATH_TRACING:
        fn = jax.jit(lambda it: pt.render_iteration(scene, camera, cfg, it,
                                                    key))
        rays_per_iter = count_rays_per_iteration(cfg)
    elif method == RenderMethod.PROGRESSIVE_PHOTON_MAPPING:
        fn = jax.jit(lambda it: ppm.render_iteration(
            scene, camera, cfg, it, key, jnp.float32(0.002))[0])
        n = cfg.n_pixels
        rays_per_iter = (n * cfg.max_radiance_trace_depth
                         + cfg.photons_per_iteration
                         * cfg.max_photon_trace_depth
                         + n * cfg.ppm_direct_shadow_samples)
    else:
        fn = jax.jit(lambda it: vcm.render_iteration(
            scene, camera, cfg, it, key, jnp.float32(0.002))[0])
        n = cfg.n_pixels
        L = cfg.vcm_max_path_length
        # light pass: trace + t=1 occlusion; camera: trace + s1 occlusion +
        # (L-1) vertex-connection occlusions per bounce
        rays_per_iter = n * (L - 1) * 2 + n * L * (2 + (L - 1))

    # warmup/compile
    t0 = time.perf_counter()
    fn(jnp.int32(0)).block_until_ready()
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        # block per iteration: async dispatch through the axon tunnel has
        # been observed to mis-report readiness when only the last result
        # is blocked on
        fn(jnp.int32(i)).block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_s = rays_per_iter * iters / dt
    result = {
        "metric": f"{args.method}_rays_per_s_per_chip",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 1e8, 4),
        "detail": {
            "resolution": f"{size}x{size}",
            "iterations": iters,
            "seconds": round(dt, 3),
            "compile_seconds": round(compile_s, 2),
            "samples_per_s": round(cfg.n_pixels * iters / dt),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
