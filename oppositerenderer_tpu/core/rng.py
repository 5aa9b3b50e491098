"""Counter-based RNG for the wavefront renderer.

The reference threads a per-pixel curand state through every kernel
(``renderer/RandomState.h``, seeded in ``OptixRenderer_SpatialHash.cu:300-334``).
On TPU we use JAX's counter-based threefry instead: one key per
(iteration, pass), with whole-array draws — a single vectorized threefry call
per decision point instead of a per-lane mutable state. Determinism falls out
for free (reference needed DEBUG_RANDOM_SEED for that).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def make_root_key(seed: int) -> Array:
    return jax.random.PRNGKey(seed)


def iteration_key(root: Array, iteration: Array | int, pass_id: int) -> Array:
    """Key for one (iteration, pass). ``iteration`` may be traced."""
    return jax.random.fold_in(jax.random.fold_in(root, pass_id), iteration)


class Sampler:
    """Stateful convenience wrapper used inside traced code.

    Each ``next*`` call folds an incrementing counter into the base key, so a
    sampler constructed from the same key yields a reproducible stream. This
    is trace-time state (the counter is a Python int), so under ``jit`` each
    draw site gets its own fixed fold — exactly the counter-based pattern.
    """

    def __init__(self, key: Array):
        self._key = key
        self._n = 0

    def _next_key(self) -> Array:
        k = jax.random.fold_in(self._key, self._n)
        self._n += 1
        return k

    def next1(self, shape=()) -> Array:
        return jax.random.uniform(self._next_key(), shape, dtype=jnp.float32)

    def next2(self, shape=()) -> Array:
        return jax.random.uniform(self._next_key(), tuple(shape) + (2,),
                                  dtype=jnp.float32)

    def next3(self, shape=()) -> Array:
        return jax.random.uniform(self._next_key(), tuple(shape) + (3,),
                                  dtype=jnp.float32)

    def split_key(self) -> Array:
        """Hand out an independent key (e.g. to carry into a scan body)."""
        return self._next_key()


class LaneSampler:
    """Per-lane counter-based sampler: draw *i* for lane *l* is a pure
    function of ``(key, lane_id, i)``.

    This makes every random decision **sharding-invariant**: a lane produces
    the same stream no matter which device of the mesh owns it, so a
    tile-sharded render is bit-comparable to the single-device one (the
    reference gets cross-machine decorrelation from per-pixel curand states
    seeded by iteration, OptixRenderer_SpatialHash.cu:300-334; here it falls
    out of counter-based hashing).
    """

    def __init__(self, key: Array, lane_ids: Array):
        self._lane_keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
            key, lane_ids)
        self._n = 0

    def _next_keys(self) -> Array:
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            self._lane_keys, self._n)
        self._n += 1
        return k

    def next1(self) -> Array:
        return jax.vmap(lambda k: jax.random.uniform(k, (),
                                                     dtype=jnp.float32))(
            self._next_keys())

    def next2(self) -> Array:
        return jax.vmap(lambda k: jax.random.uniform(k, (2,),
                                                     dtype=jnp.float32))(
            self._next_keys())

    def next3(self) -> Array:
        return jax.vmap(lambda k: jax.random.uniform(k, (3,),
                                                     dtype=jnp.float32))(
            self._next_keys())
