"""VM iteration cost on chip: XLA budget gather vs Pallas tile merge
(verdict round-4 item 3: done bar = VM iteration <= 2 s at 512^2
CornellSmall)."""
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from oppositerenderer_tpu.config import RenderConfig, RenderMethod
    from oppositerenderer_tpu.renderer import Renderer
    from oppositerenderer_tpu.scene import get_scene_by_name

    scene, camera = get_scene_by_name("CornellSmall")
    modes = sys.argv[1:] or ["pallas", "xla"]
    for mode in modes:
        cfg = RenderConfig(
            width=512, height=512,
            render_method=RenderMethod.VCM_BIDIRECTIONAL_PATH_TRACING,
            vcm_use_vm=True, iterations_per_dispatch=2,
            vcm_vm_use_pallas=(mode == "pallas"))
        r = Renderer(scene, camera, cfg, seed=0)
        t0 = time.perf_counter()
        r.render(2)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            r.restart()
            t0 = time.perf_counter()
            r.render(2)
            ts.append(time.perf_counter() - t0)
        print(json.dumps(dict(
            mode=mode, ms_per_iter=round(statistics.median(ts) / 2 * 1e3, 1),
            min=round(min(ts) / 2 * 1e3, 1), compile_s=round(compile_s, 1),
            mean_radiance=float(__import__("numpy").asarray(
                r.film.mean_radiance()).mean()))), flush=True)


if __name__ == "__main__":
    main()
