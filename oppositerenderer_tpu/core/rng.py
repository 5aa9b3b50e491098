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


# RNG mode: "threefry" (crypto-strength counter RNG, default — the analog
# of the reference's curand) or "cheap" (integer-hash RNG, the analog of
# USE_CHEAP_RANDOM's xorshift/wang-hash, config.h:39 + RandomState.h:9-16).
# The cheap mode is ~10 int ops/draw vs threefry's ~100 and measures ~4x
# faster per draw on TPU; quality is adequate for rendering.
_RNG_MODE = "threefry"


def set_rng_mode(mode: str) -> None:
    global _RNG_MODE
    assert mode in ("threefry", "cheap"), mode
    _RNG_MODE = mode


def get_rng_mode() -> str:
    return _RNG_MODE


def _lowbias32(x: Array) -> Array:
    """Excellent 32-bit integer hash (lowbias32, Chris Wellons)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7feb352d)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846ca68b)
    x = x ^ (x >> 16)
    return x


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
        self._cheap = _RNG_MODE == "cheap"
        if self._cheap:
            kd = jax.random.key_data(key) if jnp.issubdtype(
                key.dtype, jax.dtypes.prng_key) else key.astype(jnp.uint32)
            kd = kd.reshape(-1)
            base = kd[0] ^ (kd[-1] * jnp.uint32(0x9E3779B9))
            self._lane_base = _lowbias32(
                lane_ids.astype(jnp.uint32)
                * jnp.uint32(0x85ebca6b) ^ base)
        else:
            self._lane_keys = jax.vmap(jax.random.fold_in,
                                       in_axes=(None, 0))(key, lane_ids)
        self._n = 0

    # --- threefry path ---
    def _next_keys(self) -> Array:
        k = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            self._lane_keys, self._n)
        self._n += 1
        return k

    # --- cheap path ---
    def _cheap_uniform(self, cols: int) -> Array:
        # unique stream id per (draw, column): 8 columns reserved per draw
        ctr = jnp.uint32(self._n * 8)
        self._n += 1
        c = jnp.arange(cols, dtype=jnp.uint32)
        bits = _lowbias32(self._lane_base[:, None]
                          ^ ((ctr + c) * jnp.uint32(0x9E3779B9)))
        u = (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
        return u

    def next1(self) -> Array:
        if self._cheap:
            return self._cheap_uniform(1)[:, 0]
        return jax.vmap(lambda k: jax.random.uniform(k, (),
                                                     dtype=jnp.float32))(
            self._next_keys())

    def next2(self) -> Array:
        if self._cheap:
            return self._cheap_uniform(2)
        return jax.vmap(lambda k: jax.random.uniform(k, (2,),
                                                     dtype=jnp.float32))(
            self._next_keys())

    def next3(self) -> Array:
        if self._cheap:
            return self._cheap_uniform(3)
        return jax.vmap(lambda k: jax.random.uniform(k, (3,),
                                                     dtype=jnp.float32))(
            self._next_keys())
