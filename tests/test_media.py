"""Participating media: transmittance, scatter sampling, full PPM render."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oppositerenderer_tpu.config import RenderConfig, RenderMethod
from oppositerenderer_tpu.integrators import media
from oppositerenderer_tpu.renderer import Renderer
from oppositerenderer_tpu.scene import SceneBuilder, make_cornell_small
from oppositerenderer_tpu.scene.types import Medium


def medium_box(ss=0.2, sa=0.05):
    return Medium(sigma_s=jnp.float32(ss), sigma_a=jnp.float32(sa),
                  aabb_min=jnp.zeros(3), aabb_max=jnp.full((3,), 2.5))


def test_segment_overlap():
    m = medium_box()
    o = jnp.asarray([[1.25, 1.25, -2.0], [1.25, 1.25, 1.0],
                     [5.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    t_hit = jnp.asarray([10.0, 10.0, 10.0])
    t0, ov = media.segment_overlap(m, o, d, t_hit)
    np.testing.assert_allclose(np.asarray(ov), [2.5, 1.5, 0.0], atol=1e-5)
    assert float(t0[0]) == pytest.approx(2.0)
    # capped by the surface hit
    _, ov2 = media.segment_overlap(m, o, d, jnp.asarray([3.0, 0.5, 1.0]))
    np.testing.assert_allclose(np.asarray(ov2), [1.0, 0.5, 0.0], atol=1e-5)


def test_transmittance_beer_lambert():
    m = medium_box(0.3, 0.2)
    tr = media.transmittance(m, jnp.asarray([0.0, 1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(tr),
                               np.exp(-0.5 * np.asarray([0, 1, 2])),
                               rtol=1e-5)


def test_scatter_distance_distribution():
    m = medium_box(0.5, 0.5)  # sigma_t = 1
    u = jax.random.uniform(jax.random.PRNGKey(0), (1 << 14,))
    t, pdf = media.sample_scatter_distance(m, u)
    # mean free path = 1/sigma_t = 1
    assert float(jnp.mean(t)) == pytest.approx(1.0, rel=0.05)
    np.testing.assert_allclose(np.asarray(pdf),
                               np.exp(-np.asarray(t)), rtol=1e-4)


def cornell_with_medium(ss=0.15, sa=0.02):
    scene, cam = make_cornell_small()
    return scene.replace(medium=Medium(
        sigma_s=jnp.float32(ss), sigma_a=jnp.float32(sa),
        aabb_min=jnp.zeros(3), aabb_max=jnp.full((3,), 2.5))), cam


def ppm_cfg(**kw):
    base = dict(width=32, height=32,
                render_method=RenderMethod.PROGRESSIVE_PHOTON_MAPPING,
                photons_per_iteration=1 << 13, photon_grid_resolution=16)
    base.update(kw)
    return RenderConfig(**base)


def test_ppm_with_medium_renders():
    scene, cam = cornell_with_medium()
    r = Renderer(scene, cam, ppm_cfg(), seed=3)
    m = r.render_next_iteration()
    img = np.asarray(r.film.mean_radiance())
    assert np.isfinite(img).all()
    assert img.max() > 0.5
    assert m["volumetric_photons_stored"] > 0


def test_medium_attenuates_and_adds_inscatter():
    """Dense absorbing medium darkens surfaces; scattering adds glow."""
    scene0, cam = make_cornell_small()
    cfg = ppm_cfg()
    r0 = Renderer(scene0, cam, cfg, seed=4)
    r0.render(3)
    base = np.asarray(r0.film.mean_radiance())

    # pure absorber: image must get strictly darker
    sa_scene, _ = cornell_with_medium(ss=0.0, sa=0.4)
    ra = Renderer(sa_scene, cam, cfg, seed=4)
    ra.render(3)
    absorbed = np.asarray(ra.film.mean_radiance())
    mask = base.sum(-1) > 0.05
    assert absorbed[mask].mean() < base[mask].mean() * 0.85

    # scattering medium: some in-scattered radiance appears
    ss_scene, _ = cornell_with_medium(ss=0.3, sa=0.0)
    rs = Renderer(ss_scene, cam, cfg, seed=4)
    rs.render(3)
    scat = np.asarray(rs.film.mean_radiance())
    assert np.isfinite(scat).all()
    # surfaces attenuated but volume glow compensates partially
    assert scat.mean() > absorbed.mean()


def test_medium_energy_sanity():
    """Purely scattering medium should roughly conserve image energy
    (single-scatter estimate recovers part of the attenuation loss)."""
    scene0, cam = make_cornell_small()
    cfg = ppm_cfg()
    r0 = Renderer(scene0, cam, cfg, seed=5)
    r0.render(4)
    base = float(np.asarray(r0.film.mean_radiance()).mean())

    ss_scene, _ = cornell_with_medium(ss=0.1, sa=0.0)
    rs = Renderer(ss_scene, cam, cfg, seed=5)
    rs.render(4)
    scat = float(np.asarray(rs.film.mean_radiance()).mean())
    # within [50%, 110%] of the clear-scene energy
    assert 0.5 * base < scat < 1.1 * base, (scat, base)
