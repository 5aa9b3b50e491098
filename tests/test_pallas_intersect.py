"""Pallas kernel parity vs the jnp backend (interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

# the package re-exports the intersect() function under the same name, so
# plain attribute import would shadow the module
intersect_mod = importlib.import_module(
    "oppositerenderer_tpu.accel.intersect")
from oppositerenderer_tpu.core import math as m
from oppositerenderer_tpu.scene import get_scene_by_name


@pytest.fixture(autouse=True)
def restore_backend():
    yield
    intersect_mod.set_backend("jnp")


def random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(0.2, 2.3, (n, 3)), jnp.float32)
    d = m.normalize(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32))
    return o, d


def test_closest_hit_parity():
    scene, _ = get_scene_by_name("CornellSmallLargeSphere")
    o, d = random_rays(300)
    tmin = jnp.full((300,), 1e-4)
    tmax = jnp.full((300,), 1e6)

    intersect_mod.set_backend("jnp")
    a = intersect_mod.intersect(scene, o, d, tmin, tmax)
    intersect_mod.set_backend("pallas_interpret")
    b = intersect_mod.intersect(scene, o, d, tmin, tmax)

    h = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.prim), np.asarray(b.prim))
    # attributes are only defined on hit lanes (miss-lane values differ:
    # jnp interpolates from argmin garbage, pallas zeros)
    np.testing.assert_allclose(np.asarray(a.ns)[h], np.asarray(b.ns)[h],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.uv)[h], np.asarray(b.uv)[h],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.mat)[h],
                                  np.asarray(b.mat)[h])


def test_occlusion_parity():
    scene, _ = get_scene_by_name("CornellSmall")
    o, d = random_rays(300, seed=1)
    tmin = jnp.full((300,), 1e-4)
    tmax = jnp.full((300,), 1.0)

    intersect_mod.set_backend("jnp")
    a = intersect_mod.occluded(scene, o, d, tmin, tmax)
    intersect_mod.set_backend("pallas_interpret")
    b = intersect_mod.occluded(scene, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonaligned_ray_count():
    """Ray counts not divisible by the 256 block must pad correctly."""
    scene, _ = get_scene_by_name("CornellSmall")
    o, d = random_rays(131, seed=2)
    tmin = jnp.full((131,), 1e-4)
    tmax = jnp.full((131,), 1e6)
    intersect_mod.set_backend("pallas_interpret")
    h = intersect_mod.intersect(scene, o, d, tmin, tmax)
    assert h.t.shape == (131,)
    intersect_mod.set_backend("jnp")
    ref = intersect_mod.intersect(scene, o, d, tmin, tmax)
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(ref.t), rtol=1e-5)
