"""Per-pass cold-compile attribution for the CornellSmall 512^2 PPM
iteration (round-4 verdict item 4: PPM cold compile <= 60 s)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def t(name, build):
    t0 = time.perf_counter()
    build()
    print(f"{name:28s} {time.perf_counter() - t0:7.1f} s", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from oppositerenderer_tpu.config import RenderConfig, RenderMethod
    from oppositerenderer_tpu.core.rng import make_root_key
    from oppositerenderer_tpu.integrators import ppm
    from oppositerenderer_tpu.integrators.common import (pixel_coords,
                                                         scene_epsilon)
    from oppositerenderer_tpu.scene import get_scene_by_name

    scene, cam = get_scene_by_name("CornellSmall")
    cfg = RenderConfig(width=512, height=512,
                       render_method=RenderMethod.PROGRESSIVE_PHOTON_MAPPING)
    key = make_root_key(0)
    eps = scene_epsilon(scene)
    n = cfg.n_pixels
    px, py = pixel_coords(cfg.width, cfg.height)
    lanes = jnp.arange(n, dtype=jnp.int32)

    # warm the process (first jit absorbs backend init)
    t("warmup (trivial jit)", lambda: jax.jit(
        lambda x: x * 2).lower(jnp.ones((8, 8))).compile())

    sc = scene.with_backend(
        "pallas" if jax.default_backend() == "tpu" else "jnp")

    t("eye pass", lambda: jax.jit(
        lambda k: ppm.trace_eye_pass(sc, cam, cfg, k, eps, px, py, lanes)
    ).lower(key).compile())

    plane = jnp.arange(cfg.photons_per_iteration, dtype=jnp.int32)
    t("photon pass", lambda: jax.jit(
        lambda k: ppm.trace_photon_pass(sc, cfg, k, eps, plane)
    ).lower(key).compile())

    from oppositerenderer_tpu.photon_map import (PhotonBatch,
                                                 build_photon_grid,
                                                 min_cell_size_for_window)
    P = cfg.photons_per_iteration * cfg.max_photon_deposits_per_emitted
    batch = PhotonBatch(position=jnp.zeros((P, 3)), power=jnp.zeros((P, 3)),
                        direction=jnp.zeros((P, 3)),
                        valid=jnp.zeros((P,), jnp.bool_))
    t("grid build", lambda: jax.jit(
        lambda b: build_photon_grid(b, cfg.photon_grid_resolution,
                                    min_cell_size=min_cell_size_for_window(
                                        jnp.float32(0.05), 4))
    ).lower(batch).compile())

    grid = build_photon_grid(batch, cfg.photon_grid_resolution,
                             min_cell_size=min_cell_size_for_window(
                                 jnp.float32(0.05), 4))
    from oppositerenderer_tpu.accel.pallas_gather import (
        gather_photons_tiled, tile_block_order, ROWS, TILE)
    u = jnp.zeros((n // TILE, ROWS + 2))
    t("tiled gather (Mosaic)", lambda: jax.jit(
        lambda g, q: gather_photons_tiled(
            g, q, q, jnp.float32(0.05), u_rows=u,
            interpret=jax.default_backend() != "tpu")
    ).lower(grid, jnp.zeros((n, 3))).compile())

    t("FULL iteration", lambda: jax.jit(
        lambda k: ppm.render_iteration(sc, cam, cfg, jnp.int32(0), k,
                                       jnp.float32(0.0025))
    ).lower(key).compile())


if __name__ == "__main__":
    main()
