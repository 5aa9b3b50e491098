import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oppositerenderer_tpu.camera import Camera
from oppositerenderer_tpu.config import RenderConfig, RenderMethod
from oppositerenderer_tpu.core.rng import make_root_key
from oppositerenderer_tpu.integrators import pt
from oppositerenderer_tpu.lights import make_area_light, make_point_light
from oppositerenderer_tpu.renderer import Renderer, ppm_radius_sq_at_iteration
from oppositerenderer_tpu.scene import SceneBuilder, make_cornell_small


def small_cfg(w=48, h=48, **kw):
    return RenderConfig(width=w, height=h,
                        render_method=RenderMethod.PATH_TRACING, **kw)


def render_n(scene, cam, cfg, n, seed=0):
    key = make_root_key(seed)
    f = jax.jit(lambda it: pt.render_iteration(scene, cam, cfg, it, key))
    acc = jnp.zeros((cfg.height, cfg.width, 3))
    for i in range(n):
        acc = acc + f(jnp.int32(i))
    return acc / n


def test_emitter_direct_view():
    """Camera staring at an emitter sees exactly Lemit."""
    b = SceneBuilder()
    power = (np.pi,) * 3  # Lemit = power*invArea/pi = 1 for unit square
    em = b.add_emitter(power, light=make_area_light(
        power, (-0.5, 0, -0.5), (1, 0, 0), (0, 0, 1)))
    # emitter faces -y?? cross((1,0,0),(0,0,1)) = (0,-1,0)... camera below
    b.add_parallelogram((-0.5, 0, -0.5), (1, 0, 0), (0, 0, 1), em)
    scene = b.build()
    cam = Camera.make(eye=(0, -2, 0), lookat=(0, 0, 0), up=(0, 0, 1),
                      hfov=10, vfov=10)
    img = render_n(scene, cam, small_cfg(16, 16), 4)
    np.testing.assert_allclose(np.asarray(img), 1.0, rtol=1e-4)


def test_point_light_direct_analytic():
    """Diffuse floor + point light: L = rho/pi * I * cos / d^2."""
    b = SceneBuilder()
    white = b.add_diffuse((0.6, 0.6, 0.6))
    b.add_parallelogram((-10, 0, -10), (0, 0, 20), (20, 0, 0), white)
    I = 5.0
    b.add_light(make_point_light((I * 4 * np.pi,) * 3, (0.0, 3.0, 0.0)))
    scene = b.build()
    cam = Camera.make(eye=(0, 2, -4), lookat=(0, 0, 0), hfov=30, vfov=30)
    cfg = small_cfg(32, 32)
    img = render_n(scene, cam, cfg, 32)
    # pixel at image center looks at origin: d=3, cos=1
    expect = 0.6 / np.pi * I * 1.0 / 9.0
    center = np.asarray(img[16, 16])
    np.testing.assert_allclose(center, expect, rtol=0.02)
    # also check an off-center point: floor point p, cos=3/r, d^2=r^2
    # (use the camera ray to find p analytically for pixel (16,4))
    from oppositerenderer_tpu.integrators.common import pixel_coords
    o, d = cam.generate_rays(jnp.asarray([4]), jnp.asarray([16]),
                             jnp.full((1, 2), 0.5), 32, 32)
    t = -float(o[0, 1]) / float(d[0, 1])
    p = np.asarray(o[0]) + t * np.asarray(d[0])
    r2 = p[0] ** 2 + 9.0 + p[2] ** 2
    cos = 3.0 / np.sqrt(r2)
    expect2 = 0.6 / np.pi * I * cos / r2
    np.testing.assert_allclose(np.asarray(img[16, 4]), expect2, rtol=0.02)


def test_furnace_enclosure():
    """Diffuse floor fully enclosed by unit emitters -> L = rho."""
    b = SceneBuilder()
    rho = 0.5
    floor = b.add_diffuse((rho, rho, rho))
    s = 4.0
    b.add_parallelogram((0, 0, 0), (0, 0, s), (s, 0, 0), floor)
    # 5 emitter walls with Lemit=1 (power = A*pi)
    walls = [  # (anchor, v1, v2) inward-facing
        ((0, s, 0), (s, 0, 0), (0, 0, s)),      # ceiling, normal -y
        ((0, 0, s), (0, s, 0), (s, 0, 0)),      # back
        ((0, 0, 0), (0, s, 0), (0, 0, s)),      # left (+x normal)
        ((s, 0, 0), (0, 0, s), (0, s, 0)),      # right
        ((0, 0, 0), (s, 0, 0), (0, s, 0)),      # front
    ]
    for a, v1, v2 in walls:
        power = (s * s * np.pi,) * 3
        em = b.add_emitter(power, light=make_area_light(power, a, v1, v2))
        b.add_parallelogram(a, v1, v2, em)
    scene = b.build()
    cam = Camera.make(eye=(2, 2.0, 0.4), lookat=(2, 0, 2), hfov=25, vfov=25)
    img = render_n(scene, cam, small_cfg(24, 24), 96)
    mean = float(img.mean())
    assert mean == pytest.approx(rho, rel=0.03), mean


def test_renderer_loop_and_restart():
    scene, cam = make_cornell_small()
    r = Renderer(scene, cam, small_cfg(32, 32), seed=3)
    m = r.render_next_iteration()
    assert m["iteration"] == 1
    r.render_next_iteration()
    assert int(r.film.iterations) == 2
    img1 = np.asarray(r.film.mean_radiance())
    assert np.isfinite(img1).all() and img1.max() > 0
    r.restart()
    assert int(r.film.iterations) == 0 and r.iteration == 0


def test_async_dispatch_matches_sync():
    """Pipeline overlap (cfg.async_dispatch): identical dispatches, no
    per-chunk synchronization -> bit-identical film."""
    scene, cam = make_cornell_small()
    # budget adaptation off so both renderers use the same dispatch split
    # (a different split changes float summation order)
    r_sync = Renderer(scene, cam,
                      small_cfg(16, 16, iterations_per_dispatch=3,
                                dispatch_seconds_budget=0.0), seed=7)
    r_async = Renderer(scene, cam,
                       small_cfg(16, 16, iterations_per_dispatch=3,
                                 dispatch_seconds_budget=0.0,
                                 async_dispatch=True), seed=7)
    f1 = r_sync.render(7)
    f2 = r_async.render(7)
    assert int(f2.iterations) == 7
    np.testing.assert_array_equal(np.asarray(f1.accum),
                                  np.asarray(f2.accum))
    assert np.isfinite(r_async.metrics["iteration_seconds"])


def test_dispatch_budget_splits_but_preserves_result():
    """A tiny dispatch_seconds_budget forces every dispatch down to a
    single iteration (the tunneled-runtime watchdog guard); the film must
    equal the explicitly single-stepped render bit-for-bit."""
    scene, cam = make_cornell_small()
    cfg = small_cfg(16, 16, iterations_per_dispatch=8,
                    dispatch_seconds_budget=1e-9)
    r = Renderer(scene, cam, cfg, seed=11)
    r.render(5)
    r_ref = Renderer(scene, cam, cfg, seed=11)
    for _ in range(5):
        r_ref.render_next_iteration()
    np.testing.assert_array_equal(np.asarray(r.film.accum),
                                  np.asarray(r_ref.film.accum))
    assert int(r.film.iterations) == 5


def test_renderer_checkpoint_roundtrip(tmp_path):
    scene, cam = make_cornell_small()
    r = Renderer(scene, cam, small_cfg(16, 16), seed=3)
    r.render(3)
    p = tmp_path / "ckpt.npz"
    r.save_checkpoint(p)
    r2 = Renderer(scene, cam, small_cfg(16, 16), seed=99)
    r2.load_checkpoint(p)
    assert r2.iteration == 3
    np.testing.assert_array_equal(np.asarray(r2.film.accum),
                                  np.asarray(r.film.accum))
    # continues deterministically like the original would
    r.render(1)
    r2.render(1)
    np.testing.assert_allclose(np.asarray(r2.film.accum),
                               np.asarray(r.film.accum), rtol=1e-6)


def test_determinism():
    scene, cam = make_cornell_small()
    cfg = small_cfg(16, 16)
    key = make_root_key(7)
    a = pt.render_iteration(scene, cam, cfg, jnp.int32(5), key)
    b = pt.render_iteration(scene, cam, cfg, jnp.int32(5), key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = pt.render_iteration(scene, cam, cfg, jnp.int32(6), key)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_ppm_radius_schedule():
    # r2_{i+1} = r2_i (i+a)/(i+1)
    r2 = ppm_radius_sq_at_iteration(0.2, 2 / 3, 0)
    assert r2 == pytest.approx(0.04)
    r2_1 = ppm_radius_sq_at_iteration(0.2, 2 / 3, 1)
    assert r2_1 == pytest.approx(0.04 * (2 / 3))
    r2_2 = ppm_radius_sq_at_iteration(0.2, 2 / 3, 2)
    assert r2_2 == pytest.approx(0.04 * (2 / 3) * (1 + 2 / 3) / 2)
    # radius decreases monotonically to 0
    assert r2_2 < r2_1 < r2


def test_glass_sphere_scene_runs():
    from oppositerenderer_tpu.scene import get_scene_by_name
    scene, cam = get_scene_by_name("CornellSmallSmallSpheres")
    img = render_n(scene, cam, small_cfg(24, 24), 4)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.max() > 0
