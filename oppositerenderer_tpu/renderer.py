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


def ppm_radius_sq_traced(r0, alpha: float, iteration):
    """The same Knaus-Zwicker schedule for a TRACED iteration index:
    prod_{k<i} (k+a)/(k+1) = Gamma(i+a) / (Gamma(a) Gamma(i+1)), closed
    form via lgamma so the fused multi-iteration step can compute each
    iteration's radius on-device."""
    itf = jnp.asarray(iteration, jnp.float32)
    a = jnp.float32(alpha)
    log_prod = (jax.lax.lgamma(itf + a) - jax.lax.lgamma(a)
                - jax.lax.lgamma(itf + 1.0))
    return jnp.square(jnp.asarray(r0, jnp.float32)) * jnp.exp(log_prod)


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
        self._tier0_fallback: dict[Any, Any] = {}
        self._iter_seconds_estimate: float | None = None
        self.restart()

    # sequence-number bump analog: camera/scene/settings change -> restart
    def restart(self, camera: Camera | None = None,
                cfg: RenderConfig | None = None,
                scene: Scene | None = None) -> None:
        if scene is not None:   # scene switch (MainWindowBase.cpp:143-161)
            self.scene = scene
            self._compiled.clear()
        if camera is not None:
            self.camera = camera
        if cfg is not None:
            if (cfg.width, cfg.height) != (self.cfg.width, self.cfg.height):
                self._compiled.clear()
            if cfg != self.cfg:
                self._iter_seconds_estimate = None
            self.cfg = cfg
        self.film = Film.create(self.cfg.width, self.cfg.height)
        self.iteration = 0
        self.metrics: dict[str, Any] = {}

    # ------------------------------------------------------------------
    def _scene_for_trace(self) -> Scene:
        """Scene with the intersection backend resolved from the config
        (threaded per-scene instead of a module global, so renderers with
        different backends coexist in one process)."""
        if self.scene.backend is not None:
            return self.scene
        use_pallas = self.cfg.use_pallas
        if use_pallas is None:   # auto: kernels on TPU
            use_pallas = jax.default_backend() == "tpu"
        return self.scene.with_backend("pallas" if use_pallas else "jnp")

    def _compile_tier_cfgs(self):
        """(first_cfg, upgrade_cfg | None) — TIERED compile resolution.

        Time-to-first-frame is a product requirement (the reference's
        complained-about bar is its 60 s OptiX JIT, README.md:78); the
        fastest executables cost minutes of XLA compile. "auto" settings
        resolve to a cheap-compile first executable plus a background
        thread compiling the throughput one (swapped in mid-render):

        * photon_grid_sort: argsort+binary-search offsets first (19 s vs
          87 s), co-sort upgrade; stable sorts -> bit-identical.
        * use_pallas_gather (PPM, auto): XLA budget gather first (4 s vs
          13 s Mosaic), tile-kernel upgrade; same estimator family.
        * coherent_peel (BVH scenes, auto): unpeeled bounce scan first
          (halves the pass-body compile), peeled packet-kernel upgrade;
          estimator-invisible, not bit-identical (config.py note).
        """
        cfg = self.cfg
        tier0, tier1 = cfg, cfg
        changed = False
        # PPM tier guard: at flagship frames (> 512^2) the tier-0 XLA
        # budget gather both RUNS slowly (1M queries x 256 rows ~ 12 s/
        # iter) and COMPILES slowly (measured 219 s at Atrium 1024^2 —
        # worse than the throughput graph it was supposed to front-run),
        # so the tier only applies at interactive sizes.
        if (cfg.photon_grid_sort == "auto" and cfg.render_method
                == RenderMethod.PROGRESSIVE_PHOTON_MAPPING
                and cfg.n_pixels <= (1 << 18)):
            tier0 = tier0.replace(photon_grid_sort="argsort")
            tier1 = tier1.replace(photon_grid_sort="cosort")
            if cfg.use_pallas_gather is None:
                tier0 = tier0.replace(use_pallas_gather=False)
            changed = True
        # Peel-tier guard, flagship frames (> 512^2): the UNPEELED VCM
        # camera pass at 1M pixels makes XLA:TPU materialize the light-
        # vertex store in a (8,128)-tiled [n,9,3] layout — 8 GB per copy,
        # measured compile OOM at Atrium 1024^2 (round 5) — and unpeeled
        # flagship graphs measured SLOWER to compile anyway (VCM 248 s vs
        # 203 s peeled). Big frames keep the peel; the _dispatch_multi
        # fallback catches any other tier-0 blow-up by pinning tier 1.
        big = cfg.n_pixels > (1 << 18)
        if (cfg.coherent_peel == "auto" and self.scene.bvh is not None
                and not big):
            tier0 = tier0.replace(coherent_peel="off")
            tier1 = tier1.replace(coherent_peel="on")
            changed = True
        return tier0, (tier1 if changed else None)

    def _raw_step(self, cfg=None):
        """(camera, iteration, key, radius_sq) -> (radiance [H,W,3], stats)
        for the configured method — the un-jitted single-iteration body."""
        scene = self._scene_for_trace()
        cfg = self.cfg if cfg is None else cfg
        method = cfg.render_method
        if method == RenderMethod.PATH_TRACING:
            from .integrators import pt

            def step(camera, iteration, key, _radius_sq):
                return pt.render_iteration(scene, camera, cfg,
                                           iteration, key), {}
        elif method == RenderMethod.PROGRESSIVE_PHOTON_MAPPING:
            from .integrators import ppm

            def step(camera, iteration, key, radius_sq):
                return ppm.render_iteration(scene, camera, cfg,
                                            iteration, key, radius_sq)
        elif method == RenderMethod.VCM_BIDIRECTIONAL_PATH_TRACING:
            from .integrators import vcm

            def step(camera, iteration, key, radius_sq):
                return vcm.render_iteration(scene, camera, cfg,
                                            iteration, key, radius_sq)
        else:
            raise ValueError(f"unknown method {method}")
        return step

    def _step_fn(self):
        """Build + cache the jitted per-iteration render step (always the
        compile-cheap tier — compute_iteration is not the hot loop)."""
        cache_key = ("single", self.cfg)
        if cache_key not in self._compiled:
            cfg0, _ = self._compile_tier_cfgs()
            self._compiled[cache_key] = jax.jit(self._raw_step(cfg0))
        return self._compiled[cache_key]

    def _multi_step_fn(self):
        """Jitted fused step rendering ``n`` iterations
        ``start, start+stride, ...`` in ONE dispatch:
        (camera, start_iteration, key, n, stride) -> (radiance_sum, stats).

        ``n`` and ``stride`` are TRACED operands (the fori_loop lowers to a
        while_loop), so one compile serves every iteration count and the
        distributed SPMD assignment where worker w renders w, w+P, ... —
        warming any call warms them all, which is what lets the
        multi-process scaling bench exclude compiles honestly. The
        per-iteration PPM radius is computed on-device from the pure
        Knaus-Zwicker schedule (ppm_radius_sq_traced), matching the
        host-side schedule every other path uses — the same property that
        makes the reference's multi-iteration packets mergeable
        (DistributedApplication.cpp:101-113)."""
        cache_key = ("multi", self.cfg)
        if cache_key in self._compiled:
            return self._compiled[cache_key]
        cfg0, cfg1 = self._compile_tier_cfgs()
        fn = jax.jit(self._build_fused(cfg0))
        self._compiled[cache_key] = fn
        if cfg1 is not None:
            self._tier0_fallback[cache_key] = cfg1
            self._spawn_compile_upgrade(cache_key, cfg1)
        return fn

    def _dispatch_multi(self, *args):
        """Call the fused multi-iteration executable; if a tier-0
        cheap-compile variant fails at compile/run time (e.g. a
        pathological XLA layout on some shape), pin the throughput tier
        synchronously and retry once."""
        cache_key = ("multi", self.cfg)
        fn = self._multi_step_fn()
        try:
            return fn(*args)
        except Exception:
            cfg1 = self._tier0_fallback.pop(cache_key, None)
            if cfg1 is None:
                raise
            fn = jax.jit(self._build_fused(cfg1))
            self._compiled[cache_key] = fn
            return fn(*args)

    def _build_fused(self, cfg):
        """The fused multi-iteration body for one resolved config tier."""
        step = self._raw_step(cfg)
        H, W = cfg.height, cfg.width
        r0 = self.ppm_initial_radius
        alpha = cfg.ppm_alpha

        def fused(camera, start_iteration, key, n, stride):
            def body(k, carry):
                acc, stats_acc = carry
                it = start_iteration + k * stride
                r2 = ppm_radius_sq_traced(r0, alpha, it)
                rad, stats = step(camera, it, key, r2)
                rad = jnp.where(jnp.isfinite(rad), rad, 0.0)
                stats_sum = {kk: jnp.sum(v).astype(jnp.float32)
                             for kk, v in stats.items()}
                if stats_acc is None:
                    return acc + rad, stats_sum
                return (acc + rad,
                        {kk: stats_acc[kk] + v
                         for kk, v in stats_sum.items()})

            # peel iteration 0 to learn the stats structure, loop the rest
            acc, stats0 = body(jnp.int32(0),
                               (jnp.zeros((H, W, 3), jnp.float32), None))
            acc, stats0 = jax.lax.fori_loop(1, n, body, (acc, stats0))
            return acc, stats0

        return fused

    def _spawn_compile_upgrade(self, cache_key, cfg1) -> None:
        """Compile the throughput-tier executable on a daemon thread and
        swap it into the dispatch cache when ready (_compile_tier_cfgs).
        The swap is estimator-invisible (grid-sort tiers are bit-identical;
        the peel tier differs only in last-ulp fp — every iteration is an
        unbiased estimate either way). The AOT-compiled executable is
        called directly, so the background compile is never repeated on
        the main thread."""
        import threading

        fused = self._build_fused(cfg1)
        camera, key = self.camera, self.root_key

        def bg():
            try:
                compiled = jax.jit(fused).lower(
                    camera, jnp.int32(0), key, jnp.int32(1),
                    jnp.int32(1)).compile()
                self._compiled[cache_key] = compiled
            except Exception:     # upgrade is best-effort; tier 0 stands
                pass

        t = threading.Thread(target=bg, daemon=True,
                             name="compile-upgrade")
        t.start()
        self._upgrade_thread = t

    def wait_for_compile_upgrade(self, timeout: float | None = None):
        """Block until the background throughput-tier compile (if any)
        lands — benches call this so steady-state reps measure the
        upgraded executable without compile contention."""
        t = getattr(self, "_upgrade_thread", None)
        if t is not None:
            t.join(timeout)

    def _batch_G(self) -> int:
        """Stacked-iteration batch width (RenderConfig.iteration_batch):
        PT only — PPM/VCM iterations carry per-iteration photon maps /
        vertex stores whose memory would scale with G."""
        if self.cfg.render_method == RenderMethod.PATH_TRACING:
            return max(1, self.cfg.iteration_batch)
        return 1

    def _multi_batch_fn(self, G: int):
        """Jitted fused step rendering ``n_groups`` STACKED groups of G PT
        iterations: (camera, start_iteration, key, n_groups, stride) ->
        (radiance_sum, stats). Group k covers iterations
        start + (k*G + j)*stride, j < G — the same iteration set the
        unbatched fused fn would render, in G x wider traversal
        dispatches (see integrators/pt.render_iteration_batch)."""
        cache_key = ("multi_batch", self.cfg, G)
        if cache_key in self._compiled:
            return self._compiled[cache_key]
        from .integrators import pt
        scene = self._scene_for_trace()
        cfg = self.cfg
        H, W = cfg.height, cfg.width

        def fused(camera, start_iteration, key, n_groups, stride):
            def body(k, acc):
                base = start_iteration + k * G * stride
                its = base + jnp.arange(G, dtype=jnp.int32) * stride
                rad = pt.render_iteration_batch(scene, camera, cfg, its,
                                                key)
                return acc + jnp.where(jnp.isfinite(rad), rad, 0.0)

            acc = jax.lax.fori_loop(
                0, n_groups, body, jnp.zeros((H, W, 3), jnp.float32))
            return acc, {}

        fn = jax.jit(fused)
        self._compiled[cache_key] = fn
        return fn

    def _render_batched(self, iterations: int, G: int) -> Film:
        """render() body for iteration_batch G > 1: full groups of G go
        through the stacked executable; a remainder (iterations % G) falls
        back to the sequential fused path (compiled lazily only if one
        occurs — benches pick iterations % G == 0)."""
        chunk = max(G, self.cfg.iterations_per_dispatch)
        sync = not self.cfg.async_dispatch
        budget = self.cfg.dispatch_seconds_budget
        t_all = time.perf_counter()
        done = 0
        while done + G <= iterations:
            max_groups = max(1, min(chunk, iterations - done) // G)
            n_groups = max_groups
            if budget > 0:
                est = self._iter_seconds_estimate
                n_groups = 1 if est is None else max(1, min(
                    max_groups, int(budget / max(est * G, 1e-9))))
            was_compiled = ("multi_batch", self.cfg, G) in self._compiled
            t0 = time.perf_counter()
            rad_sum, stats = self._multi_batch_fn(G)(
                self.camera, jnp.int32(self.iteration), self.root_key,
                jnp.int32(n_groups), jnp.int32(1))
            n_it = n_groups * G
            self.film = self.film.add_iterations(rad_sum, n_it)
            if sync:
                self.film.accum.block_until_ready()
            dt = time.perf_counter() - t0
            if sync and was_compiled:
                self._iter_seconds_estimate = dt / n_it
            self.iteration += n_it
            done += n_it
            self.metrics = dict(
                iteration=self.iteration,
                iteration_seconds=dt / n_it,
                iteration_batch=G,
                **{k: float(v) for k, v in stats.items()})
        if done < iterations:     # remainder < G: sequential fused path
            self._render_chunk_sync(iterations - done)
        if not sync:
            self.film.accum.block_until_ready()
            self.metrics["iteration_seconds"] = (
                (time.perf_counter() - t_all) / max(1, iterations))
        return self.film

    def compute_iteration(self, iteration: int):
        """Radiance + stats for one specific GLOBAL iteration number without
        touching the film — the unit of work a distributed worker renders
        (RenderServerRenderer::renderFrame analog). The PPM radius is the
        pure Knaus-Zwicker schedule at that iteration, so any worker
        computes the same frame for the same number."""
        radius_sq = ppm_radius_sq_at_iteration(
            self.ppm_initial_radius, self.cfg.ppm_alpha, iteration)
        return self._step_fn()(self.camera, jnp.int32(iteration),
                               self.root_key, jnp.float32(radius_sq))

    def compute_iterations(self, start: int, n: int, stride: int = 1):
        """Fused radiance SUM + summed stats over iterations
        ``start, start+stride, ..., start+(n-1)*stride`` — one dispatch."""
        return self._multi_step_fn()(self.camera, jnp.int32(start),
                                     self.root_key, jnp.int32(n),
                                     jnp.int32(stride))

    def render_next_iteration(self) -> dict[str, Any]:
        """Render one iteration into the film; returns metrics
        (OptixRenderer::renderNextIteration, OptixRenderer.cpp:507-826)."""
        was_compiled = ("single", self.cfg) in self._compiled
        t0 = time.perf_counter()
        radius_sq = ppm_radius_sq_at_iteration(
            self.ppm_initial_radius, self.cfg.ppm_alpha, self.iteration)
        radiance, stats = self._step_fn()(
            self.camera, jnp.int32(self.iteration), self.root_key,
            jnp.float32(radius_sq))
        self.film = self.film.add_iteration(radiance)
        self.film.accum.block_until_ready()
        dt = time.perf_counter() - t0
        if was_compiled:   # compile-tainted timings would skew the budget
            self._iter_seconds_estimate = dt
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

    def _render_chunk_sync(self, n: int):
        """One synchronous fused dispatch of ``n`` iterations through the
        multi fn (shared executable for every n), updating the film and
        the per-iteration time estimate."""
        was_compiled = ("multi", self.cfg) in self._compiled
        t0 = time.perf_counter()
        rad_sum, stats = self._dispatch_multi(
            self.camera, jnp.int32(self.iteration), self.root_key,
            jnp.int32(n), jnp.int32(1))
        self.film = self.film.add_iterations(rad_sum, n)
        self.film.accum.block_until_ready()
        dt = time.perf_counter() - t0
        if was_compiled:
            self._iter_seconds_estimate = dt / n
        self.iteration += n
        self.metrics = dict(
            iteration=self.iteration,
            iteration_seconds=dt / n,
            ppm_radius=ppm_radius_sq_at_iteration(
                self.ppm_initial_radius, self.cfg.ppm_alpha,
                self.iteration - 1) ** 0.5,
            **{k: float(v) for k, v in stats.items()},
        )

    def render(self, iterations: int) -> Film:
        """Render ``iterations`` iterations, fusing up to
        ``cfg.iterations_per_dispatch`` per device dispatch.

        With ``cfg.async_dispatch`` the host does NOT synchronize between
        chunks: every dispatch is queued immediately (XLA executes them in
        order), so host-side dispatch latency for chunk k+1 overlaps chunk
        k's device compute — the TPU analog of the reference's pipelined
        request window (RenderServerConnection.cpp:37-48). One block at
        the end materializes the film; per-chunk metrics then report
        dispatch time, not device time."""
        G = self._batch_G()
        if G > 1:
            return self._render_batched(iterations, G)
        chunk = max(1, self.cfg.iterations_per_dispatch)
        sync = not self.cfg.async_dispatch
        budget = self.cfg.dispatch_seconds_budget
        t_all = time.perf_counter()
        done = 0
        if budget > 0 and not sync:
            # async mode still needs the watchdog clamp (the budget exists
            # to keep single dispatches under the runtime's kill window):
            # seed the estimate with synchronous probes — the first may be
            # compile-tainted (untimed), the second times — then go async.
            # Probes go through the MULTI fn with n=1 (n is a traced
            # operand, so the probe shares the fused executable — the
            # round-3 flow compiled the single-iteration graph AND the
            # fused graph, doubling every cold compile).
            while (self._iter_seconds_estimate is None
                   and done < min(2, iterations)):
                self._render_chunk_sync(1)
                done += 1
        while done < iterations:
            n = min(chunk, iterations - done)
            if budget > 0 and n > 1:
                est = self._iter_seconds_estimate
                if est is None:
                    n = 1          # probe dispatch to learn the rate
                else:
                    n = min(n, max(1, int(budget / max(est, 1e-9))))
            was_compiled = ("multi", self.cfg) in self._compiled
            t0 = time.perf_counter()
            rad_sum, stats = self._dispatch_multi(
                self.camera, jnp.int32(self.iteration), self.root_key,
                jnp.int32(n), jnp.int32(1))
            self.film = self.film.add_iterations(rad_sum, n)
            if sync:
                self.film.accum.block_until_ready()
            dt = time.perf_counter() - t0
            if sync and was_compiled:
                self._iter_seconds_estimate = dt / n
            self.iteration += n
            done += n
            self.metrics = dict(
                iteration=self.iteration,
                iteration_seconds=dt / n,
                ppm_radius=ppm_radius_sq_at_iteration(
                    self.ppm_initial_radius, self.cfg.ppm_alpha,
                    self.iteration - 1) ** 0.5,
                # float() would synchronize — keep stats lazy when async
                **(dict(stats) if not sync else
                   {k: float(v) for k, v in stats.items()}),
            )
        if not sync:
            self.film.accum.block_until_ready()
            self.metrics["iteration_seconds"] = (
                (time.perf_counter() - t_all) / max(1, iterations))
            self.metrics = {k: (float(v) if hasattr(v, "block_until_ready")
                                else v)
                            for k, v in self.metrics.items()}
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
