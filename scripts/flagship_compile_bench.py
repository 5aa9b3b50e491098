"""Flagship (Atrium 1024^2) time-to-first-frame, tiered vs pinned
(round-4 verdict item 4: flagship VCM <= 120 s)."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from oppositerenderer_tpu.config import RenderConfig, RenderMethod
    from oppositerenderer_tpu.renderer import Renderer
    from oppositerenderer_tpu.scene import get_scene_by_name

    method = sys.argv[1] if len(sys.argv) > 1 else "vcm"
    peel = sys.argv[2] if len(sys.argv) > 2 else "auto"
    t0 = time.perf_counter()
    scene, cam = get_scene_by_name("Atrium")
    load_s = time.perf_counter() - t0
    cfg = RenderConfig(
        width=1024, height=1024,
        render_method={"pt": RenderMethod.PATH_TRACING,
                       "ppm": RenderMethod.PROGRESSIVE_PHOTON_MAPPING,
                       "vcm": (RenderMethod
                               .VCM_BIDIRECTIONAL_PATH_TRACING)}[method],
        coherent_peel=peel)
    r = Renderer(scene, cam, cfg, seed=0)
    t0 = time.perf_counter()
    r.render(1)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    r.render(1)
    second = time.perf_counter() - t0
    r.wait_for_compile_upgrade()
    t0 = time.perf_counter()
    r.render(1)
    upgraded = time.perf_counter() - t0
    print(json.dumps(dict(method=method, peel=peel,
                          load_s=round(load_s, 1),
                          time_to_first_frame_s=round(first, 1),
                          tier0_iter_s=round(second, 2),
                          upgraded_iter_s=round(upgraded, 2))))


if __name__ == "__main__":
    main()
