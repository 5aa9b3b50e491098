"""Differentiable-rendering helpers.

New capability vs the reference (BASELINE.md targets): radiance estimates are
differentiable w.r.t. material BSDF parameters (kd, ks, exponent, kr, kt) and
light emission, using the detached-sampling estimator — sampling decisions,
pdfs, Russian-roulette probabilities and MIS weights carry
``stop_gradient`` (see bsdf.BSDF.f/sample, integrators), so ``jax.grad``
through a render is the unbiased gradient of the expected image for fixed
random streams. Visibility/geometry edges are not differentiated (no edge
sampling); the supported scope is shading/emission parameters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .scene.types import Scene

Array = jax.Array


def set_material_param(scene: Scene, field: str, material_idx: int,
                       value: Array) -> Scene:
    """Functionally replace one material's parameter (e.g. kd of wall 2)."""
    table = scene.materials
    arr = getattr(table, field)
    return scene.replace(materials=table.replace(
        **{field: arr.at[material_idx].set(value)}))


def scale_emission(scene: Scene, scale: Array) -> Scene:
    """Scale all light emission by ``scale`` (materials.emission is derived
    from lights.power at build time, so both views scale together)."""
    return scene.replace(
        materials=scene.materials.replace(
            emission=scene.materials.emission * scale),
        lights=scene.lights.replace(
            power=scene.lights.power * scale,
            emission=scene.lights.emission * scale))


def make_sharded_loss_and_grad(scene: Scene, camera, cfg, mesh, wrt):
    """Sharded differentiable rendering (north star: "parameter gradients
    all-reduced overlapped with the backward pass").

    Builds ``fn(values, iteration, key, radius_sq) -> (loss, grads)`` where
    the forward render is tile-sharded over ``mesh``
    (parallel.render.make_sharded_render_raw) and ``jax.grad`` flows through
    the shard_map: each device back-propagates its own pixel band and the
    replicated parameters' cotangents are psum'd across the mesh by the
    shard_map transpose — XLA overlaps those all-reduces with the remaining
    backward compute. ``wrt`` maps (field, material_idx) -> init value;
    loss = mean radiance.
    """
    from .parallel.render import make_sharded_render_raw
    raw = make_sharded_render_raw(scene, camera, cfg, mesh)
    keys = list(wrt.keys())

    def loss_fn(values, iteration, key, radius_sq):
        s = scene
        for (field, idx), v in zip(keys, values):
            if field == "emission_scale":
                s = scale_emission(s, v)
            else:
                s = set_material_param(s, field, idx, v)
        img, _stats = raw(s, iteration, key, radius_sq)
        return jnp.mean(img)

    vg = jax.jit(jax.value_and_grad(loss_fn))

    def fn(values=None, iteration=0, key=None, radius_sq=0.002):
        vals = [wrt[k] for k in keys] if values is None else values
        if key is None:
            key = jax.random.PRNGKey(0)
        loss, grads = vg(vals, jnp.int32(iteration), key,
                         jnp.float32(radius_sq))
        return loss, dict(zip(keys, grads))

    return fn


def render_loss_and_grad(render_fn, scene: Scene, wrt):
    """Convenience: value+grad of ``mean(render_fn(scene))`` w.r.t. a pytree
    of overrides. ``wrt`` maps (field, material_idx) -> init value; returns
    (loss, grads dict)."""
    keys = list(wrt.keys())

    def loss_fn(values):
        s = scene
        for (field, idx), v in zip(keys, values):
            s = set_material_param(s, field, idx, v)
        img = render_fn(s)
        return jnp.mean(img)

    vals = [wrt[k] for k in keys]
    loss, grads = jax.value_and_grad(loss_fn)(vals)
    return loss, dict(zip(keys, grads))
