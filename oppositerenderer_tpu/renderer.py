"""Renderer: the host-side render loop (OptixRenderer equivalent).

Owns the film, the per-iteration pass dispatch by render method, the
Knaus-Zwicker PPM radius schedule computed host-side exactly like
``OptixRenderer.cpp:583-589`` / ``DistributedApplication.cpp:101-113`` (a
pure function of iteration number, which is what makes iteration sharding
across hosts work), restart-on-change (the reference's sequence-number bump,
``Gui/Application.cpp:119-127``), and per-iteration metrics (the analog of
``RenderStatisticsModel`` + debug output buffers).
"""
from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp

from .camera import Camera
from .config import RenderConfig, RenderMethod
from .core.rng import make_root_key
from .film import Film, load_checkpoint, save_checkpoint
from .scene.types import Scene


def ppm_radius_sq_at_iteration(r0: float, alpha: float,
                               iteration: int) -> float:
    """Knaus-Zwicker progressive radius: r_{i+1}^2 = r_i^2 (i+a)/(i+1),
    evaluated from scratch for any iteration (pure function of i so every
    host computes the same schedule)."""
    r2 = r0 * r0
    for i in range(iteration):
        r2 *= (i + alpha) / (i + 1.0)
    return r2


class Renderer:
    def __init__(self, scene: Scene, camera: Camera, cfg: RenderConfig,
                 seed: int = 0, ppm_initial_radius: float | None = None):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.root_key = make_root_key(seed)
        if ppm_initial_radius is None:
            if cfg.ppm_default_radius_from_scene:
                # The reference's area-based heuristic (IScene.cpp:23-31)
                # yields 1.7e-4 for the 2.5-unit box — unusably small (its
                # GUI overrides with a 0.20 setting). Use 1% of the scene
                # diagonal, clamped below by the reference heuristic.
                import numpy as np
                diag = float(np.linalg.norm(np.asarray(
                    scene.aabb_max - scene.aabb_min)))
                ppm_initial_radius = max(
                    0.01 * diag, scene.initial_ppm_radius_estimate())
            else:
                ppm_initial_radius = cfg.ppm_initial_radius
        self.ppm_initial_radius = float(ppm_initial_radius)
        self._compiled: dict[Any, Any] = {}
        self.restart()

    # sequence-number bump analog: camera/scene/settings change -> restart
    def restart(self, camera: Camera | None = None,
                cfg: RenderConfig | None = None) -> None:
        if camera is not None:
            self.camera = camera
        if cfg is not None:
            if (cfg.width, cfg.height) != (self.cfg.width, self.cfg.height):
                self._compiled.clear()
            self.cfg = cfg
        self.film = Film.create(self.cfg.width, self.cfg.height)
        self.iteration = 0
        self.metrics: dict[str, Any] = {}

    # ------------------------------------------------------------------
    def _step_fn(self):
        """Build + cache the jitted per-iteration render step."""
        from .accel import set_backend
        from .core.rng import set_rng_mode
        use_pallas = self.cfg.use_pallas
        if use_pallas is None:   # auto: kernels on TPU
            use_pallas = jax.default_backend() == "tpu"
        set_backend("pallas" if use_pallas else "jnp")
        set_rng_mode("cheap" if self.cfg.use_cheap_random else "threefry")
        method = self.cfg.render_method
        cache_key = (method, self.cfg)
        if cache_key in self._compiled:
            return self._compiled[cache_key]

        if method == RenderMethod.PATH_TRACING:
            from .integrators import pt

            def step(camera, iteration, key, _radius_sq):
                return pt.render_iteration(self.scene, camera, self.cfg,
                                           iteration, key), {}
        elif method == RenderMethod.PROGRESSIVE_PHOTON_MAPPING:
            from .integrators import ppm

            def step(camera, iteration, key, radius_sq):
                return ppm.render_iteration(self.scene, camera, self.cfg,
                                            iteration, key, radius_sq)
        elif method == RenderMethod.VCM_BIDIRECTIONAL_PATH_TRACING:
            from .integrators import vcm

            def step(camera, iteration, key, radius_sq):
                return vcm.render_iteration(self.scene, camera, self.cfg,
                                            iteration, key, radius_sq)
        else:
            raise ValueError(f"unknown method {method}")

        fn = jax.jit(step)
        self._compiled[cache_key] = fn
        return fn

    def render_next_iteration(self) -> dict[str, Any]:
        """Render one iteration into the film; returns metrics
        (OptixRenderer::renderNextIteration, OptixRenderer.cpp:507-826)."""
        t0 = time.perf_counter()
        radius_sq = ppm_radius_sq_at_iteration(
            self.ppm_initial_radius, self.cfg.ppm_alpha, self.iteration)
        radiance, stats = self._step_fn()(
            self.camera, jnp.int32(self.iteration), self.root_key,
            jnp.float32(radius_sq))
        self.film = self.film.add_iteration(radiance)
        self.film.accum.block_until_ready()
        dt = time.perf_counter() - t0
        self.iteration += 1
        self.metrics = dict(
            iteration=self.iteration,
            iteration_seconds=dt,
            ppm_radius=radius_sq ** 0.5,
            ppm_radius_sq=radius_sq,
            **{k: (float(v) if jnp.ndim(v) == 0 else v)
               for k, v in stats.items()},
        )
        return self.metrics

    def render(self, iterations: int) -> Film:
        for _ in range(iterations):
            self.render_next_iteration()
        return self.film

    # ------------------------------------------------------------------
    def save_checkpoint(self, path) -> None:
        save_checkpoint(path, self.film, self.root_key,
                        ppm_radius_sq=ppm_radius_sq_at_iteration(
                            self.ppm_initial_radius, self.cfg.ppm_alpha,
                            self.iteration))

    def load_checkpoint(self, path) -> None:
        film, key, _r2, _extra = load_checkpoint(path)
        assert film.accum.shape == (self.cfg.height, self.cfg.width, 3)
        self.film = film
        self.root_key = key
        self.iteration = int(film.iterations)
