"""Fused small-table row gather.

Dynamic gathers from tiny tables (materials, lights, per-triangle
attributes) are pathologically slow on TPU: XLA lowers them to serial
dynamic-slices, and a wavefront does dozens of them per bounce. Measured on
v5e at 262k lanes x 11 material fields: 6.4 ms as gathers, ~0.3 ms as ONE
one-hot matmul on the MXU. This module provides that trick generically:
every leaf of a table pytree is flattened to columns of a single [R, K]
matrix, gathered with one ``onehot(idx) @ M`` (HIGHEST precision so f32
round-trips are exact to ~1 ulp), then split and cast back.

The reference renderer has no analog — OptiX programs gather per-instance
variables natively; on TPU the gather IS the hot op, so it must ride the
systolic array.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# the [n_idx, n_rows] one-hot matrix is materialized in HBM; cap its size
# (f32 elements) so the trick never costs more memory traffic than it saves
ONEHOT_ELEMENT_BUDGET = 1 << 25


def onehot_ok(n_rows: int, n_idx: int) -> bool:
    """True when a one-hot matmul gather is the right call on this backend."""
    return (jax.default_backend() == "tpu"
            and n_rows * max(n_idx, 1) <= ONEHOT_ELEMENT_BUDGET)


def fused_rows(table, idx: jax.Array, *, force: bool | None = None):
    """Gather rows ``idx`` [...,] from every leaf [R, ...] of ``table``
    (a pytree whose leaves share leading dim R). Returns the same pytree
    batched to idx's shape. One one-hot matmul on TPU; plain takes elsewhere.
    """
    leaves, treedef = jax.tree_util.tree_flatten(table)
    n_rows = leaves[0].shape[0]
    use = onehot_ok(n_rows, idx.size) if force is None else force
    if not use:
        return jax.tree_util.tree_map(lambda a: a[idx], table)

    cols, specs = [], []
    for a in leaves:
        tail = a.shape[1:]
        k = math.prod(tail) if tail else 1
        cols.append(a.reshape(n_rows, k).astype(jnp.float32))
        specs.append((tail, a.dtype, k))
    mat = jnp.concatenate(cols, axis=1)                      # [R, K]
    # HIGH (3-pass) is exact enough for one-hot rows: products are exact
    # 0/x and each output sums a single non-zero term
    oh = (idx[..., None] == jnp.arange(n_rows, dtype=idx.dtype))
    out = jnp.matmul(oh.astype(jnp.float32), mat,
                     precision=jax.lax.Precision.HIGH)       # [..., K]

    gathered, off = [], 0
    for tail, dtype, k in specs:
        piece = out[..., off:off + k].reshape(idx.shape + tail)
        if dtype == jnp.bool_:
            piece = piece > 0.5
        elif jnp.issubdtype(dtype, jnp.integer):
            piece = jnp.round(piece).astype(dtype)
        else:
            piece = piece.astype(dtype)
        gathered.append(piece)
        off += k
    return jax.tree_util.tree_unflatten(treedef, gathered)
