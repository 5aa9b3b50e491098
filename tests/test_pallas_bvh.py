"""Packet BVH traversal (accel/pallas_bvh.py) vs the XLA wavefront
traversal — exact agreement on closest-hit and any-hit, interpret mode.

The compiled (Mosaic) path is exercised on the real chip by
scripts/tpu_selfcheck.py; the union/cost measurements driving the design
live in scripts/packet_union_exp.py and scripts/packet_kernel_exp.py.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from oppositerenderer_tpu.accel import bvh as B
from oppositerenderer_tpu.accel.pallas_bvh import packet_traverse
from oppositerenderer_tpu.scene import make_cornell_small


@pytest.fixture(scope="module")
def built():
    scene, _cam = make_cornell_small()
    if scene.bvh is None:
        scene, bvh = B.build_scene_bvh(scene)
    else:
        bvh = scene.bvh
    return scene, bvh


def rays(n, scene, seed=0, kill_every=7):
    rng = np.random.default_rng(seed)
    mn = np.asarray(scene.aabb_min)
    mx = np.asarray(scene.aabb_max)
    o = jnp.asarray(rng.uniform(mn, mx, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmax = jnp.full((n,), 1e30).at[::kill_every].set(0.0)  # dead lanes
    return o, jnp.asarray(d), jnp.full((n,), 1e-3), tmax


def test_packet_matches_wavefront_closest(built):
    scene, bvh = built
    o, d, tmin, tmax = rays(1500, scene)
    t0, i0, u0, v0, f0 = B._traverse_impl(bvh, scene.geometry, o, d,
                                          tmin, tmax, any_hit=False)
    t1, i1, u1, v1, f1 = packet_traverse(bvh, o, d, tmin, tmax,
                                         any_hit=False, interpret=True)
    f0 = np.asarray(f0)
    np.testing.assert_array_equal(f0, np.asarray(f1))
    m = f0
    np.testing.assert_allclose(np.asarray(t1)[m], np.asarray(t0)[m],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1)[m], np.asarray(i0)[m])
    np.testing.assert_allclose(np.asarray(u1)[m], np.asarray(u0)[m],
                               rtol=1e-4, atol=1e-4)


def test_packet_matches_wavefront_anyhit(built):
    scene, bvh = built
    o, d, tmin, tmax = rays(1500, scene, seed=3)
    *_, f0 = B._traverse_impl(bvh, scene.geometry, o, d, tmin, tmax,
                              any_hit=True)
    *_, f1 = packet_traverse(bvh, o, d, tmin, tmax, any_hit=True,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_packet_traverse_zero_gradient(built):
    """jax.grad through packet_traverse w.r.t. ray inputs returns the
    defined ZERO gradient instead of raising from pallas_call autodiff —
    gradient-contract parity with the wavefront traverse/traverse_any
    (round-3 advisor medium finding)."""
    import jax
    scene, bvh = built
    o, d, tmin, tmax = rays(256, scene, seed=9)

    def loss(o):
        t, i, u, v, f = packet_traverse(bvh, o, d, tmin, tmax,
                                        any_hit=False, interpret=True)
        return jnp.sum(jnp.where(f, t, 0.0))

    g = jax.grad(loss)(o)
    np.testing.assert_array_equal(np.asarray(g), 0.0)

    def loss_any(d):
        *_, f = packet_traverse(bvh, o, d, tmin, tmax, any_hit=True,
                                interpret=True)
        return jnp.sum(f.astype(jnp.float32) * jnp.sum(d, axis=1))

    g2 = jax.grad(loss_any)(d)
    assert np.isfinite(np.asarray(g2)).all()


def test_packet_nonmultiple_tile_padding(built):
    scene, bvh = built
    o, d, tmin, tmax = rays(777, scene, seed=5)   # not a TILE multiple
    t1, i1, u1, v1, f1 = packet_traverse(bvh, o, d, tmin, tmax,
                                         any_hit=False, interpret=True)
    t0, i0, *_ , f0 = B._traverse_impl(bvh, scene.geometry, o, d, tmin,
                                       tmax, any_hit=False)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    m = np.asarray(f0)
    np.testing.assert_allclose(np.asarray(t1)[m], np.asarray(t0)[m],
                               rtol=1e-5, atol=1e-5)
