"""Sharded per-iteration render steps (shard_map over the tile axis).

Intra-iteration sharding the reference does NOT have (SURVEY.md section 2.6:
its only multi-GPU axis is whole-iteration sharding over TCP). Design:

* **PT**: pixels (image rows) shard over ``tile``; purely data-parallel.
* **PPM**: eye pass shards pixels; the photon pass shards emitted photons;
  each shard's photons are ``all_gather``-ed over ICI so every device builds
  the (identical) sorted grid and gathers its own pixels. (A cell-owner
  all-to-all exchange is the planned upgrade.)
* **VCM**: light subpaths shard like pixels (global count = n_pixels, so the
  1:1 pairing pixel<->path stays device-local); t=1 camera splats go to
  arbitrary pixels, so local splat images are ``psum``-ed and each device
  keeps its own row band.

Per-lane counter-based RNG (core.rng.LaneSampler) keyed by GLOBAL lane ids
makes every shard draw exactly the stream it would draw unsharded, so the
sharded image equals the single-device image up to float-sum ordering.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..camera import Camera
from ..config import RenderConfig, RenderMethod
from ..core.rng import iteration_key
from ..integrators import ppm, pt, vcm
from ..integrators.common import pixel_coords, scene_epsilon
from ..photon_map import PhotonBatch, build_photon_grid, gather_photons
from ..scene.types import Scene
from .mesh import TILE_AXIS


def _check_divisible(cfg: RenderConfig, n_dev: int):
    n = cfg.n_pixels
    if n % n_dev != 0:
        raise ValueError(f"{n} pixels not divisible by {n_dev} devices")
    if cfg.photons_per_iteration % n_dev != 0:
        raise ValueError("photons_per_iteration must divide by device count")


def make_sharded_render_fn(scene: Scene, camera: Camera, cfg: RenderConfig,
                           mesh: Mesh):
    """Returns jitted ``fn(iteration, base_key, radius_sq) -> ([H,W,3],
    stats)`` sharded over ``mesh``. Scene/camera are closed over
    (replicated)."""
    n_dev = mesh.devices.size
    _check_divisible(cfg, n_dev)
    W, H = cfg.width, cfg.height
    n = W * H
    n_local = n // n_dev

    px, py = pixel_coords(W, H)
    lanes = jnp.arange(n, dtype=jnp.int32)
    photon_lanes = jnp.arange(cfg.photons_per_iteration, dtype=jnp.int32)

    method = cfg.render_method

    def shard_fn(it, key, radius_sq, px_s, py_s, lanes_s, photon_lanes_s):
        if method == RenderMethod.PATH_TRACING:
            rad = pt.render_lanes(scene, camera, cfg, it, key, px_s, py_s,
                                  lanes_s)
            return rad, {}

        eps = scene_epsilon(scene)
        if method == RenderMethod.PROGRESSIVE_PHOTON_MAPPING:
            return _ppm_shard(scene, camera, cfg, it, key, radius_sq, eps,
                              px_s, py_s, lanes_s, photon_lanes_s)
        # VCM
        return _vcm_shard(scene, camera, cfg, it, key, radius_sq, eps,
                          px_s, py_s, lanes_s, n, n_local)

    spec_l = P(TILE_AXIS)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), spec_l, spec_l, spec_l, spec_l),
        out_specs=(P(TILE_AXIS, None), P()),
        check_vma=False)

    @jax.jit
    def step(iteration, base_key, radius_sq):
        rad_lanes, stats = fn(iteration, base_key, radius_sq, px, py, lanes,
                              photon_lanes)
        return rad_lanes.reshape(H, W, 3), stats

    return step


def _ppm_shard(scene, camera, cfg, it, key, radius_sq, eps, px_s, py_s,
               lanes_s, photon_lanes_s):
    radius = jnp.sqrt(radius_sq)
    eye_key = iteration_key(key, it, ppm.PASS_PPM_EYE)
    photon_key = iteration_key(key, it, ppm.PASS_PPM_PHOTON)
    est_key = iteration_key(key, it, ppm.PASS_PPM_ESTIMATE)

    hp = ppm.trace_eye_pass(scene, camera, cfg, eye_key, eps, px_s, py_s,
                            lanes_s)
    photons_local, vol_local, pstats = ppm.trace_photon_pass(
        scene, cfg, photon_key, eps, photon_lanes_s)
    # exchange photons over ICI so every device sees the full map
    gathered = jax.tree_util.tree_map(
        lambda a: jax.lax.all_gather(a, TILE_AXIS, tiled=True),
        photons_local)
    grid = build_photon_grid(gathered, cfg.photon_grid_resolution)
    from ..core.rng import LaneSampler as _LS
    s_gather = _LS(jax.random.fold_in(est_key, 55), lanes_s)
    accum_power, gstats = gather_photons(
        grid, hp.position, hp.ns, radius, max_cells_per_axis=4,
        budget_total=cfg.gather_photon_budget, u_stride=s_gather.next1())

    indirect = (accum_power * (hp.kd / jnp.pi) * hp.attenuation
                / (jnp.pi * radius_sq * cfg.photons_per_iteration))
    indirect = jnp.where(hp.found[:, None], indirect, 0.0)

    from ..bsdf import BSDF
    from ..core.rng import LaneSampler
    from ..integrators.common import nee_direct
    kd_l, ks_l, exp_l, kr_l, kt_l, ior_l, diel_l = \
        scene.materials.bsdf_coefficients(hp.mat)
    hp_bsdf = BSDF.make(hp.ns, hp.ng, hp.wo, hp.kd, ks_l, exp_l, kr_l,
                        kt_l, ior_l, diel_l)
    s_est = LaneSampler(est_key, lanes_s)
    direct = nee_direct(scene, hp_bsdf, hp.position, hp.found, s_est,
                        cfg.ppm_direct_shadow_samples, eps)
    direct = jnp.where(hp.found[:, None], hp.attenuation * direct, 0.0)

    volumetric = jnp.zeros_like(direct)
    if scene.medium is not None:
        from ..integrators.media import volumetric_radiance_estimate
        vol_all = jax.tree_util.tree_map(
            lambda a: jax.lax.all_gather(a, TILE_AXIS, tiled=True),
            vol_local)
        vol_radius = radius * 3.0
        vgrid = build_photon_grid(vol_all, cfg.photon_grid_resolution)
        s_vg = _LS(jax.random.fold_in(est_key, 56), lanes_s)
        vpow, _ = gather_photons(
            vgrid, hp.vol_point, hp.ns, vol_radius, max_cells_per_axis=4,
            budget_total=cfg.gather_photon_budget,
            check_normal=False, u_stride=s_vg.next1())
        volumetric = volumetric_radiance_estimate(
            scene.medium, vpow, vol_radius, hp.vol_len, hp.vol_t,
            cfg.photons_per_iteration)
        volumetric = jnp.where((hp.vol_len > 0)[:, None], volumetric, 0.0)

    rad = direct + indirect + hp.radiance + volumetric
    stats = {k: jax.lax.psum(jnp.sum(v), TILE_AXIS)
             for k, v in {**pstats, **gstats}.items()}
    return rad, stats


def _vcm_shard(scene, camera, cfg, it, key, radius_sq, eps, px_s, py_s,
               lanes_s, n_global, n_local):
    n_light_paths = n_global  # light launch = image size (global)
    eta_vcm = float(n_light_paths) * jnp.pi * radius_sq
    mis_vm_w = vcm._mis(eta_vcm) if cfg.vcm_use_vm else jnp.zeros(())
    mis_vc_w = vcm._mis(1.0 / eta_vcm) if cfg.vcm_use_vc else jnp.zeros(())

    lkey = iteration_key(key, it, vcm.PASS_VCM_LIGHT)
    ckey = iteration_key(key, it, vcm.PASS_VCM_CAMERA)

    # light subpaths: this shard traces paths with global ids = lanes_s
    store, splat_local, lstats = vcm.trace_light_pass(
        scene, camera, cfg, lkey, eps, mis_vc_w, mis_vm_w, lanes_s,
        n_light_paths)
    # t=1 splats land on any pixel: reduce over shards, keep own row band
    splat_full = jax.lax.psum(splat_local.reshape(-1, 3), TILE_AXIS)
    my = jax.lax.axis_index(TILE_AXIS)
    splat_mine = jax.lax.dynamic_slice_in_dim(splat_full, my * n_local,
                                              n_local)

    # camera subpaths pair with this device's local light paths
    pair_local = jnp.arange(n_local, dtype=jnp.int32)
    color = vcm.trace_camera_pass(
        scene, camera, cfg, ckey, eps, mis_vc_w, mis_vm_w, store,
        n_light_paths, px_s, py_s, lanes_s, pair_local)

    stats = {k: jax.lax.psum(jnp.sum(v), TILE_AXIS)
             for k, v in lstats.items()}
    return color + splat_mine, stats
