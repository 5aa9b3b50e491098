import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oppositerenderer_tpu.accel import intersect, occluded
from oppositerenderer_tpu.core import math as m
from oppositerenderer_tpu.scene import make_cornell_small, get_scene_by_name


@pytest.fixture(scope="module")
def box():
    scene, cam = make_cornell_small()
    return scene, cam


def trace(scene, o, d, tmax=1e6):
    o = jnp.atleast_2d(jnp.asarray(o, jnp.float32))
    d = m.normalize(jnp.atleast_2d(jnp.asarray(d, jnp.float32)))
    n = o.shape[0]
    return intersect(scene, o, d, jnp.full((n,), 1e-4),
                     jnp.full((n,), tmax))


def test_hit_back_wall(box):
    scene, _ = box
    h = trace(scene, [1.25, 1.25, -2.85], [0, 0, 1])
    assert bool(h.hit[0])
    # from outside, first surface along +z is the back face of the box at
    # z=0? no front wall exists -> hits tall/short block or back wall
    assert float(h.t[0]) > 0
    assert float(h.position[0, 2]) <= 2.5 + 1e-4


def test_hit_floor_normal(box):
    scene, _ = box
    h = trace(scene, [0.3, 1.0, 0.3], [0, -1, 0])
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(np.asarray(h.ns[0]), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.position[0]), [0.3, 0, 0.3],
                               atol=1e-5)


def test_miss(box):
    scene, _ = box
    h = trace(scene, [1.25, 1.25, -2.85], [0, 0, -1])
    assert not bool(h.hit[0])
    assert int(h.prim[0]) == -1


def test_sphere_hit():
    scene, _ = get_scene_by_name("CornellSmallLargeSphere")
    # ray at sphere center height, from the front: sphere at (1.25,0.8,1.25)
    h = trace(scene, [1.25, 0.8, -2.0], [0, 0, 1])
    assert bool(h.hit[0])
    assert float(h.t[0]) == pytest.approx(3.25 - 0.8, abs=1e-4)
    np.testing.assert_allclose(np.asarray(h.ns[0]), [0, 0, -1], atol=1e-4)
    T = scene.geometry.n_triangles
    assert int(h.prim[0]) == T  # first sphere


def test_closest_of_overlapping(box):
    scene, _ = box
    # ray through the box along +z from behind camera: nearest surface wins
    h = trace(scene, [2.2, 0.05, -5.0], [0, 0, 1])
    assert bool(h.hit[0])
    # floor strip beyond blocks... whatever it hits must be the smallest t of
    # a brute-force check: verify against numpy reference
    o = np.asarray([2.2, 0.05, -5.0], np.float32)
    d = np.asarray([0, 0, 1], np.float32)
    g = scene.geometry
    best = np.inf
    for i in range(g.n_triangles):
        v0 = np.asarray(g.tri_v0[i]); e1 = np.asarray(g.tri_e1[i])
        e2 = np.asarray(g.tri_e2[i])
        p = np.cross(d, e2); det = e1 @ p
        if abs(det) < 1e-12: continue
        tv = o - v0; u = (tv @ p) / det
        q = np.cross(tv, e1); v = (d @ q) / det; t = (e2 @ q) / det
        if u >= 0 and v >= 0 and u + v <= 1 and t > 1e-4:
            best = min(best, t)
    assert float(h.t[0]) == pytest.approx(best, rel=1e-5)


def test_random_rays_vs_numpy(box):
    """Fuzz: 200 random rays agree with a numpy brute-force oracle."""
    scene, _ = box
    rng = np.random.default_rng(0)
    o = rng.uniform(0.2, 2.3, size=(200, 3)).astype(np.float32)
    d = rng.normal(size=(200, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h = trace(scene, o, d)
    g = scene.geometry
    v0 = np.asarray(g.tri_v0); e1 = np.asarray(g.tri_e1)
    e2 = np.asarray(g.tri_e2)
    for k in range(200):
        best = np.inf
        p = np.cross(d[k], e2)
        det = (e1 * p).sum(1)
        tv = o[k] - v0
        u = (tv * p).sum(1) / det
        q = np.cross(tv, e1)
        v = (d[k] * q).sum(1) / det
        t = (e2 * q).sum(1) / det
        ok = (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) \
            & (t > 1e-4)
        if ok.any():
            best = t[ok].min()
        if np.isinf(best):
            assert not bool(h.hit[k])
        else:
            assert float(h.t[k]) == pytest.approx(best, rel=1e-4)


def test_occlusion(box):
    scene, _ = box
    # point under the light, shadow ray to light: unoccluded (emitter
    # geometry must NOT block)
    o = jnp.asarray([[1.25, 0.5, 1.25]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    occ = occluded(scene, o, d, jnp.asarray([1e-4]),
                   jnp.asarray([2.499 - 0.5 - 1e-3]))
    assert not bool(occ[0])
    # point behind the tall block toward the light: occluded
    o2 = jnp.asarray([[1.45, 0.1, 1.6]])
    to_light = jnp.asarray([1.25, 2.499, 1.25]) - o2
    dist = float(jnp.linalg.norm(to_light))
    occ2 = occluded(scene, o2, m.normalize(to_light),
                    jnp.asarray([1e-4]), jnp.asarray([dist - 1e-3]))
    assert bool(occ2[0])


def test_chunking_consistency(box):
    scene, _ = box
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(0.2, 2.3, size=(1000, 3)), jnp.float32)
    d = m.normalize(jnp.asarray(rng.normal(size=(1000, 3)), jnp.float32))
    tmin = jnp.full((1000,), 1e-4)
    tmax = jnp.full((1000,), 1e6)
    h1 = intersect(scene, o, d, tmin, tmax, chunk_size=16384)
    h2 = intersect(scene, o, d, tmin, tmax, chunk_size=128)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(h1.prim), np.asarray(h2.prim))


def test_jit_and_grad_safe(box):
    scene, _ = box
    f = jax.jit(lambda o, d: intersect(
        scene, o, d, jnp.full((o.shape[0],), 1e-4),
        jnp.full((o.shape[0],), 1e6)).t.sum())
    o = jnp.asarray([[1.25, 1.25, -1.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    assert np.isfinite(float(f(o, d)))
