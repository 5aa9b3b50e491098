"""Coherent-ray packet routing through the integrators.

Primary camera rays and primary NEE shadow rays are routed through the
packet BVH kernel (accel/pallas_bvh.py) when the scene's intersection
backend is pallas — the coherent populations whose per-tile node-visit
union stays small. These tests assert the routed render agrees with the
pure XLA-wavefront render on a BVH scene (interpret mode on CPU; the
compiled path is exercised by scripts/tpu_selfcheck.py on the chip).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oppositerenderer_tpu.accel.bvh import build_scene_bvh
from oppositerenderer_tpu.camera import Camera
from oppositerenderer_tpu.config import RenderConfig, RenderMethod
from oppositerenderer_tpu.scene import make_cornell_small


@pytest.fixture(scope="module")
def bvh_scene():
    scene, cam = make_cornell_small()
    if scene.bvh is None:
        scene, bvh = build_scene_bvh(scene)
        scene = scene.replace(bvh=bvh)
    return scene, cam


def _render(scene, cam, cfg, method):
    key = jax.random.PRNGKey(7)
    it = jnp.int32(0)
    if method == "pt":
        from oppositerenderer_tpu.integrators import pt
        return pt.render_iteration(scene, cam, cfg, it, key)
    if method == "ppm":
        from oppositerenderer_tpu.integrators import ppm
        out, _ = ppm.render_iteration(scene, cam, cfg, it, key,
                                      jnp.float32(0.02))
        return out
    from oppositerenderer_tpu.integrators import vcm
    out, _ = vcm.render_iteration(scene, cam, cfg, it, key,
                                  jnp.float32(25.0))
    return out


@pytest.mark.parametrize("method", ["pt", "ppm", "vcm"])
def test_packet_routed_render_matches_wavefront(bvh_scene, method):
    scene, cam = bvh_scene
    cfg = RenderConfig(width=16, height=16,
                       render_method=RenderMethod.PATH_TRACING,
                       # keep the ppm branch cheap: interpret-mode pallas
                       # on CPU pays per-element; default 1M photons would
                       # run for minutes
                       photons_per_iteration=1 << 10,
                       photon_grid_resolution=8,
                       gather_photon_budget=64)
    img0 = np.asarray(_render(scene.with_backend("jnp"), cam, cfg, method))
    img1 = np.asarray(_render(scene.with_backend("pallas_interpret"), cam,
                              cfg, method))
    # same estimator, same RNG streams; only the traversal kernel differs
    np.testing.assert_allclose(img1, img0, rtol=2e-4, atol=2e-4)
    assert np.asarray(img0).sum() > 0.0
