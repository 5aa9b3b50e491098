"""Unit tests for the TPU fast paths: fused one-hot row gather
(core/gather.py) and counter-mode threefry (core/rng.py).

Both paths exist purely for speed; these tests pin them to the slow,
obviously-correct implementations so perf work can't drift semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oppositerenderer_tpu.core.gather import fused_rows
from oppositerenderer_tpu.core.rng import (LaneSampler, make_root_key,
                                           set_rng_mode, threefry2x32)


def _table(dtype_mix=True):
    k = jax.random.PRNGKey(0)
    t = {
        "f3": jax.random.normal(k, (13, 3)),
        "f1": jax.random.normal(jax.random.fold_in(k, 1), (13,)),
    }
    if dtype_mix:
        t["i1"] = jnp.arange(13, dtype=jnp.int32) * 7
        t["b1"] = (jnp.arange(13) % 3) == 0
    return t


@pytest.mark.parametrize("force", [True, False])
def test_fused_rows_matches_take(force):
    table = _table()
    idx = jnp.asarray([0, 5, 12, 5, 3, 0, 11], jnp.int32)
    got = fused_rows(table, idx, force=force)
    want = jax.tree_util.tree_map(lambda a: a[idx], table)
    for key in table:
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(want[key]), rtol=0, atol=1e-6)
        assert got[key].dtype == want[key].dtype


def test_fused_rows_multidim_idx():
    table = _table(dtype_mix=False)
    idx = jnp.asarray([[0, 5], [12, 3]], jnp.int32)
    got = fused_rows(table, idx, force=True)
    assert got["f3"].shape == (2, 2, 3)
    np.testing.assert_allclose(np.asarray(got["f3"]),
                               np.asarray(table["f3"][idx]), atol=1e-6)


def test_threefry_matches_jax_internal():
    """Our explicit-counter threefry2x32 is bit-identical to the one JAX's
    PRNG uses (jax._src.prng.threefry_2x32)."""
    from jax._src import prng as jprng
    k = jnp.array([0x12345678, 0x9ABCDEF0], dtype=jnp.uint32)
    x = jnp.arange(64, dtype=jnp.uint32)
    ref = jprng.threefry_2x32(k, x)
    r0, r1 = threefry2x32(k[0], k[1], x[:32], x[32:])
    assert bool(jnp.all(ref == jnp.concatenate([r0, r1])))


@pytest.mark.parametrize("mode", ["threefry", "cheap"])
def test_lane_sampler_stream_properties(mode):
    set_rng_mode(mode)
    try:
        key = make_root_key(7)
        lanes = jnp.arange(4096, dtype=jnp.int32)
        s = LaneSampler(key, lanes)
        u = np.asarray(jnp.concatenate(
            [s.next1()[:, None], s.next2(), s.next3()], axis=1))
        assert u.min() >= 0.0 and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.02
        # columns decorrelated
        c = np.corrcoef(u.T)
        off = c[~np.eye(6, dtype=bool)]
        assert np.abs(off).max() < 0.06
        # sharding invariance: a lane's draws don't depend on batch slicing
        s_full = LaneSampler(key, lanes)
        full = np.asarray(s_full.next3())
        s_half = LaneSampler(key, lanes[2048:])
        half = np.asarray(s_half.next3())
        np.testing.assert_array_equal(full[2048:], half)
    finally:
        set_rng_mode("threefry")
