"""Photon map: sorted-uniform-grid build + fixed-budget gather.

TPU re-design of the reference's GPU photon-map builders
(``renderer/OptixRenderer_SpatialHash.cu``):

* build (:209-283): thrust AABB reduce -> cell hash -> atomic histogram ->
  ``sort_by_key`` -> ``exclusive_scan`` offset table. Here: masked min/max ->
  cell ids -> ``jnp.argsort`` -> ``searchsorted`` offsets. Pure, functional,
  differentiable-through-gather, no atomics.
* gather (``ppm/IndirectRadianceEstimation.cu:69-237``): per-hitpoint walk of
  the grid cells within the radius, using the reference's trick of scanning
  each x-contiguous run of cells as one photon interval (:104-112). The
  variable-length interval scan becomes a fixed photon budget per run
  (static shapes); overflow is counted and reported in the stats dict.
* stochastic-hash variant (:286-334 + helpers/store_photon.h): fixed-size
  table, one photon per slot with collision counting; kept as the O(1)-memory
  fallback (``PhotonMapStructure.STOCHASTIC_HASH``).

Photon validity + kernel weight follow IndirectRadianceEstimation.cu:55-67
(Jensen gaussian). The BRDF application is done by the caller (ppm
integrator) — with the 1/pi the reference omits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .core.math import Array, dot

BIG = 1e30


@struct.dataclass
class PhotonBatch:
    """SoA photons (ppm/Photon.h:9-34). Fixed capacity, masked validity."""

    position: Array   # [P,3]
    power: Array      # [P,3]
    direction: Array  # [P,3] incident ray direction at deposit
    valid: Array      # [P] bool


@struct.dataclass
class PhotonGrid:
    """Sorted uniform grid over a PhotonBatch."""

    # sorted photon arrays (invalid photons sorted to the end)
    position: Array   # [P,3]
    power: Array      # [P,3]
    direction: Array  # [P,3]
    offsets: Array    # [R^3+1] int32 prefix offsets into sorted arrays
    origin: Array     # [3] grid world origin
    cell_size: Array  # [] scalar
    resolution: int = struct.field(pytree_node=False)
    n_valid: Array = None  # [] int32


def cell_coords(p: Array, origin: Array, cell_size: Array,
                resolution: int) -> Array:
    """Integer cell coords [...,3], clipped to the grid."""
    c = jnp.floor((p - origin) / cell_size).astype(jnp.int32)
    return jnp.clip(c, 0, resolution - 1)


def cell_index_1d(c: Array, resolution: int) -> Array:
    """x-major linearization (x runs fastest), matching the reference's
    x-contiguous interval scan."""
    return (c[..., 0] + c[..., 1] * resolution
            + c[..., 2] * resolution * resolution)


def build_photon_grid(photons: PhotonBatch, resolution: int) -> PhotonGrid:
    """createUniformGridPhotonMap (OptixRenderer_SpatialHash.cu:209-283)."""
    p = photons.position
    v = photons.valid
    # masked AABB (thrust transform_reduce equivalent)
    pmin = jnp.min(jnp.where(v[:, None], p, BIG), axis=0)
    pmax = jnp.max(jnp.where(v[:, None], p, -BIG), axis=0)
    any_valid = jnp.any(v)
    pmin = jnp.where(any_valid, pmin, 0.0)
    pmax = jnp.where(any_valid, pmax, 1.0)
    extent = jnp.maximum(pmax - pmin, 1e-6)
    cell_size = jnp.max(extent) / resolution
    origin = pmin

    n_cells = resolution ** 3
    cells = cell_index_1d(cell_coords(p, origin, cell_size, resolution),
                          resolution)
    cells = jnp.where(v, cells, n_cells)  # invalid -> sentinel, sorts last

    order = jnp.argsort(cells)
    cells_sorted = cells[order]
    offsets = jnp.searchsorted(cells_sorted,
                               jnp.arange(n_cells + 1, dtype=cells.dtype))
    return PhotonGrid(
        position=p[order], power=photons.power[order],
        direction=photons.direction[order],
        offsets=offsets.astype(jnp.int32), origin=origin,
        cell_size=cell_size, resolution=resolution,
        n_valid=jnp.sum(v).astype(jnp.int32))


def gaussian_kernel_weight(distance2: Array, radius2: Array) -> Array:
    """Jensen gaussian filter (IndirectRadianceEstimation.cu:60-67)."""
    alpha = 1.818
    beta = 1.953
    exp_neg_beta = 0.141847
    return alpha * (1.0 - (1.0 - jnp.exp(-beta * distance2 / (2.0 * radius2)))
                    / (1.0 - exp_neg_beta))


def gather_photons(grid: PhotonGrid, position: Array, normal: Array,
                   radius: Array, *, max_cells_per_axis: int = 4,
                   budget_per_run: int = 64, check_normal: bool = True):
    """Accumulate kernel-weighted photon power within ``radius`` of each
    query point [N,3].

    Follows IndirectRadianceEstimation.cu:85-128: cells in the [p-r, p+r]
    box, each (y,z) row's x-range scanned as one contiguous photon interval.
    Static shapes: up to ``max_cells_per_axis``^2 runs, each scanning up to
    ``budget_per_run`` photons (overflow returned for stats).

    Returns (power [N,3], stats dict).
    """
    res = grid.resolution
    r = jnp.broadcast_to(radius, position.shape[:-1])
    radius2 = r * r
    npos = position - grid.origin
    inv_cs = 1.0 / grid.cell_size
    lo = jnp.clip(jnp.floor((npos - r[..., None]) * inv_cs), 0,
                  res - 1).astype(jnp.int32)
    hi = jnp.clip(jnp.floor((npos + r[..., None]) * inv_cs), 0,
                  res - 1).astype(jnp.int32)

    accum = jnp.zeros(position.shape[:-1] + (3,), jnp.float32)
    visited = jnp.zeros(position.shape[:-1], jnp.int32)
    overflow = jnp.zeros(position.shape[:-1], jnp.int32)

    for dz in range(max_cells_per_axis):
        z = lo[..., 2] + dz
        z_ok = z <= hi[..., 2]
        for dy in range(max_cells_per_axis):
            y = lo[..., 1] + dy
            ok = z_ok & (y <= hi[..., 1])
            cfrom = (lo[..., 0] + y * res + z * res * res)
            cto = (hi[..., 0] + y * res + z * res * res)
            start = grid.offsets[jnp.where(ok, cfrom, 0)]
            end = grid.offsets[jnp.where(ok, cto, 0) + 1]
            run = jnp.where(ok, end - start, 0)
            visited = visited + jnp.minimum(run, budget_per_run)
            overflow = overflow + jnp.maximum(run - budget_per_run, 0)
            # vectorized interval scan: [N, B] gathered photon block
            ks = jnp.arange(budget_per_run, dtype=jnp.int32)
            idx = start[..., None] + ks
            in_run = ok[..., None] & (ks < run[..., None])
            safe = jnp.where(in_run, idx, 0)
            ppos = grid.position[safe]        # [N,B,3]
            ppow = grid.power[safe]
            pdir = grid.direction[safe]
            diff = position[..., None, :] - ppos
            d2 = dot(diff, diff)
            # validity: in radius + photon direction opposes the normal
            # (IndirectRadianceEstimation.cu:55-58); volumetric gathers
            # skip the normal test
            ok_p = in_run & (d2 <= radius2[..., None])
            if check_normal:
                ok_p = ok_p & (dot(-pdir, normal[..., None, :]) >= 0.0)
            w = gaussian_kernel_weight(d2, radius2[..., None])
            accum = accum + jnp.sum(
                jnp.where(ok_p[..., None], ppow * w[..., None], 0.0),
                axis=-2)
    stats = dict(photons_visited=visited, photon_overflow=overflow)
    return accum, stats


# ---------------------------------------------------------------------------
# stochastic hash variant (O(1) memory per cell)
# ---------------------------------------------------------------------------

@struct.dataclass
class StochasticHashMap:
    """Fixed-size hash: one surviving photon per slot + collision count
    (store_photon.h:17-24; counts scale surviving photon power). Cell size
    is tied to the gather radius so the 3^3 neighborhood covers the gather
    sphere and the count-scaling stays representative."""

    position: Array   # [H,3]
    power: Array      # [H,3]
    direction: Array  # [H,3]
    count: Array      # [H] int32 photons hashed to the slot
    origin: Array
    cell_size: Array


def _hash_cell(c: Array, n_slots: int) -> Array:
    """3D integer cell -> slot via large-prime mixing."""
    h = (c[..., 0] * 73856093) ^ (c[..., 1] * 19349663) \
        ^ (c[..., 2] * 83492791)
    return (h & (n_slots - 1)).astype(jnp.int32)


def build_stochastic_hash(photons: PhotonBatch, cell_size: Array,
                          table_size_log2: int, key: Array
                          ) -> StochasticHashMap:
    """initializeStochasticHashPhotonMap
    (OptixRenderer_SpatialHash.cu:286-334)."""
    p = photons.position
    v = photons.valid
    pmin = jnp.min(jnp.where(v[:, None], p, BIG), axis=0)
    any_valid = jnp.any(v)
    pmin = jnp.where(any_valid, pmin, 0.0)
    n_slots = 1 << table_size_log2
    c = jnp.floor((p - pmin) / cell_size).astype(jnp.int32)
    slot = _hash_cell(c, n_slots)
    slot = jnp.where(v, slot, n_slots)  # drop invalid

    count = jnp.zeros((n_slots + 1,), jnp.int32).at[slot].add(1)
    # "stochastic": survivor chosen by random priority per photon,
    # deterministic given the key (reference: last-writer-wins race)
    prio = jax.random.uniform(key, (p.shape[0],))
    order = jnp.argsort(prio)
    # scatter in priority order; the last write per slot survives
    pos_t = jnp.zeros((n_slots + 1, 3)).at[slot[order]].set(p[order])
    pow_t = jnp.zeros((n_slots + 1, 3)).at[slot[order]].set(
        photons.power[order])
    dir_t = jnp.zeros((n_slots + 1, 3)).at[slot[order]].set(
        photons.direction[order])
    return StochasticHashMap(
        position=pos_t[:n_slots], power=pow_t[:n_slots],
        direction=dir_t[:n_slots], count=count[:n_slots],
        origin=pmin, cell_size=cell_size)


def gather_stochastic_hash(h: StochasticHashMap, position: Array,
                           normal: Array, radius: Array):
    """3^3 neighborhood scan x collision count
    (IndirectRadianceEstimation.cu:131-166)."""
    n_slots = h.count.shape[0]
    radius2 = jnp.broadcast_to(radius * radius, position.shape[:-1])
    base = jnp.floor((position - h.origin) / h.cell_size).astype(jnp.int32)
    accum = jnp.zeros(position.shape[:-1] + (3,), jnp.float32)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                slot = _hash_cell(base + jnp.asarray([dx, dy, dz]), n_slots)
                diff = position - h.position[slot]
                d2 = dot(diff, diff)
                ok = ((h.count[slot] > 0) & (d2 <= radius2)
                      & (dot(-h.direction[slot], normal) >= 0.0))
                w = gaussian_kernel_weight(d2, radius2)
                contrib = h.power[slot] * (w * h.count[slot])[..., None]
                accum = accum + jnp.where(ok[..., None], contrib, 0.0)
    return accum, {}
