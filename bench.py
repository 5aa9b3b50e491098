"""Benchmark: rays/s per chip on the classic Cornell scenes + Atrium (BVH).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}. The
headline metric is PT rays/s on CornellSmall 512^2; the detail dict carries
PPM / VCM / Atrium numbers captured in the same run so every figure quoted
anywhere is reproducible from `python bench.py`.

Ray accounting is wavefront-honest: every intersect() invocation counts its
full lane width (closest-hit and shadow rays), because that is the work the
chip executes regardless of lane liveness. The reference publishes no
numbers (BASELINE.md); vs_baseline is measured against a nominal 1e8 rays/s
for the reference's OptiX-era single GPU.

Iterations are FUSED into one device dispatch (Renderer._multi_step_fn,
lax.fori_loop inside jit): per-dispatch latency through the tunneled TPU
runtime measured ~24 ms, i.e. 3.2x the 11 ms compute of a 512^2 PT
iteration — un-fused numbers benchmark the link, not the chip.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp


def pt_rays_per_iteration(cfg):
    """Closest-hit + shadow ray lanes per PT iteration."""
    n = cfg.width * cfg.height
    segs = cfg.pt_max_segments
    shadow = segs * cfg.pt_shadow_samples
    return n * (segs + shadow)


def ppm_rays_per_iteration(cfg):
    n = cfg.n_pixels
    return (n * cfg.max_radiance_trace_depth
            + cfg.photons_per_iteration * cfg.max_photon_trace_depth
            + n * cfg.ppm_direct_shadow_samples)


def vcm_rays_per_iteration(cfg):
    n = cfg.n_pixels
    L = cfg.vcm_max_path_length
    # light pass: trace + t=1 occlusion; camera: trace + s1 occlusion +
    # (L-1) vertex-connection occlusions per bounce
    return n * (L - 1) * 2 + n * L * (2 + (L - 1))


def run_case(scene_name, method_name, size, iters, cfg_extra=None):
    """Returns a metrics dict for one (scene, method) case."""
    from oppositerenderer_tpu.config import RenderConfig, RenderMethod
    from oppositerenderer_tpu.renderer import Renderer
    from oppositerenderer_tpu.scene import get_scene_by_name

    method = {"pt": RenderMethod.PATH_TRACING,
              "ppm": RenderMethod.PROGRESSIVE_PHOTON_MAPPING,
              "vcm": RenderMethod.VCM_BIDIRECTIONAL_PATH_TRACING}[method_name]
    scene, camera = get_scene_by_name(scene_name)
    cfg = RenderConfig(width=size, height=size, render_method=method,
                       iterations_per_dispatch=iters, **(cfg_extra or {}))
    rays_per_iter = {"pt": pt_rays_per_iteration,
                     "ppm": ppm_rays_per_iteration,
                     "vcm": vcm_rays_per_iteration}[method_name](cfg)

    r = Renderer(scene, camera, cfg, seed=0)
    t0 = time.perf_counter()
    r.render(iters)           # compile + warm (one fused dispatch)
    compile_s = time.perf_counter() - t0
    r.restart()
    t0 = time.perf_counter()
    r.render(iters)
    dt = time.perf_counter() - t0

    rays_per_s = rays_per_iter * iters / dt
    return {
        "scene": scene_name,
        "method": method_name,
        "rays_per_s": round(rays_per_s),
        "resolution": f"{size}x{size}",
        "iterations": iters,
        "seconds": round(dt, 3),
        "ms_per_iteration": round(dt / iters * 1000, 2),
        "compile_seconds": round(compile_s, 2),
        "samples_per_s": round(cfg.n_pixels * iters / dt),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small + few iters")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--method", default="all",
                    choices=["all", "pt", "ppm", "vcm"])
    ap.add_argument("--scene", default="CornellSmall",
                    help="built-in scene name (e.g. Atrium = Sponza-class "
                         "260k-tri stress scene) or .dae/.obj path")
    ap.add_argument("--no-atrium", action="store_true",
                    help="skip the Atrium(BVH) case in --method all runs")
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="Pallas TPU intersection kernels (default: auto)")
    ap.add_argument("--cheap-rng", action="store_true",
                    help="hash RNG (USE_CHEAP_RANDOM analog)")
    args = ap.parse_args()

    size = 128 if args.quick else args.size
    iters = 4 if args.quick else args.iters

    extra = {}
    if args.pallas is not None:
        extra["use_pallas"] = args.pallas
    if args.cheap_rng:
        extra["use_cheap_random"] = True
    if args.quick:
        extra["photons_per_iteration"] = 1 << 16

    detail = {"device": str(jax.devices()[0]),
              "fused_dispatch": True}
    if args.method != "all":
        case = run_case(args.scene, args.method, size, iters, extra)
        detail.update(case)
        headline = case
        metric = f"{args.method}_rays_per_s_per_chip"
    else:
        pt_case = run_case(args.scene, "pt", size, iters, extra)
        detail["pt"] = pt_case
        detail["ppm"] = run_case(
            args.scene, "ppm", size, max(2, iters // 4),
            {**extra, "photons_per_iteration":
             extra.get("photons_per_iteration", 1 << 20)})
        detail["vcm"] = run_case(args.scene, "vcm", size,
                                 max(2, iters // 4), extra)
        if not args.no_atrium and not args.quick:
            detail["atrium_pt"] = run_case("Atrium", "pt", size,
                                           max(2, iters // 4), extra)
        headline = pt_case
        metric = "pt_rays_per_s_per_chip"

    result = {
        "metric": metric,
        "value": headline["rays_per_s"],
        "unit": "rays/s",
        "vs_baseline": round(headline["rays_per_s"] / 1e8, 4),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
