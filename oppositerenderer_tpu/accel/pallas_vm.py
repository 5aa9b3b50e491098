"""Pallas TPU vertex-merging gather: tile-shared light-vertex intervals.

Vertex merging (the half of VCM the reference scaffolds but never ships,
``renderer/OptixRenderer.cpp:300-301``) gathers light vertices within the
merge radius of every camera vertex. The XLA path
(``integrators/vcm._merge_vertices``) pays a budget-64 random row gather
per camera vertex PER DEPTH — measured 22-36x the cost of a plain VC
iteration (PERF_NOTES round-4 table), correct but unusable.

This kernel applies the tile-shared interval pattern proven on the PPM
photon gather (``accel/pallas_gather.py``) to the vertex grid, plus one
twist the photon gather does not need: camera vertices at depth >= 2 are
not image-coherent, so queries are SORTED BY GRID CELL first (one argsort
per merge round) — consecutive sorted queries share cells by construction,
which is exactly the coherence the tile kernel feeds on, at any depth.

The merge weight is not a pure kernel density like PPM's: each (camera
vertex x light vertex) pair evaluates the camera BSDF at the vertex's
incoming direction plus the recursive-MIS weight (SmallVCM
VertexCM::RangeQuery::Process; repo XLA reference `_merge_vertices`). The
per-pair math runs in-kernel on [T, C] blocks; the RGB factors separate as
    f = (kd/pi) * s_lambert(pair) + rho_phong * s_phong(pair)
so the accumulation is TWO [T,C] x [C,3] matmuls against the vertex
throughputs (s_* carry the MIS weight, Jensen kernel and masks), and the
kd/rho products apply per query outside the kernel.

Differentiation: zero-gradient custom_vjp like the PPM tile gather —
jax.grad works through a VM iteration but gradients do not flow through
the merged contribution; select the XLA path (vcm_vm_use_pallas=False)
when those terms matter.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.math import INV_PI, Array
from .pallas_gather import CHUNK, CHUNK_PAD, ROWS, TILE, _tile_tables

EPS_COSINE = 1e-6   # bsdf/bsdf.py EPS_COSINE (reference config.h:42)
EPS_PHONG = 1e-3    # bsdf/bsdf.py EPS_PHONG (reference BxDF.h:265)

# qtab column layout ([TILE, 32] f32 VMEM block per tile)
_QCOLS = 32


def _pack_vertices(vgrid) -> Array:
    """[16, M_pad] f32 transposed SoA of the cell-sorted vertex grid:
    rows 0-2 position, 3-5 wo, 6-8 throughput, 9 dVCM, 10 dVM, 11 cont,
    12 depth, 13-15 pad. Pad vertices park positions at BIG (never pass
    the distance test); layout constraints as pallas_gather._pack_photons."""
    M = vgrid.position.shape[0]
    pad = -(-M // 128) * 128 - M + CHUNK_PAD
    rows = [vgrid.position.T, vgrid.wo.T, vgrid.throughput.T,
            vgrid.dVCM[None, :], vgrid.dVM[None, :], vgrid.cont[None, :],
            vgrid.depth[None, :], jnp.zeros((3, M), jnp.float32)]
    packed = jnp.concatenate(rows, axis=0)               # [16, M]
    tail = jnp.zeros((16, pad), jnp.float32).at[0:3].set(1e30)
    return jnp.concatenate([packed, tail], axis=1)


def _vm_kernel(alpha: float, beta: float, denom: float,
               itab_ref, wtab_ref, scal_ref, qtab_ref, verts_hbm,
               out1_ref, out2_ref, scratch, sem):
    """Per-tile merge. ``itab_ref``/``wtab_ref`` as in pallas_gather's
    kernel (row 0 = starts / weights, row 1 = lens). ``scal_ref`` SMEM
    [1,4]: r2, mis_vc_w, depth1, max_path_length. ``qtab_ref`` [TILE, 32]
    per-query precomputes (see _query_table). Static 64-slot unroll —
    same measured compile/runtime trade as pallas_gather._STATIC_UNROLL."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out1_ref[:] = jnp.zeros_like(out1_ref)
    out2_ref[:] = jnp.zeros_like(out2_ref)
    q = qtab_ref[:]                                      # [T, 32]
    r2 = scal_ref[0, 0]
    mis_vc_w = scal_ref[0, 1]
    depth1 = scal_ref[0, 2]
    max_len = scal_ref[0, 3]

    def slot(s):
        start = itab_ref[0, 0, s]
        ln = itab_ref[0, 1, s]
        w_s = wtab_ref[0, 0, s]

        @pl.when(ln > 0)
        def _(start=start, ln=ln, w_s=w_s):
            start0 = (start // 128) * 128
            shift = start - start0
            dma = pltpu.make_async_copy(
                verts_hbm.at[:, pl.ds(start0, CHUNK_PAD)], scratch, sem)
            dma.start()
            dma.wait()
            p = scratch[0:3, :]                          # [3, Cp]
            wo = scratch[3:6, :]
            thr = scratch[6:9, :]
            pdvcm = scratch[9:10, :]
            pdvm = scratch[10:11, :]
            pcont = scratch[11:12, :]
            pdep = scratch[12:13, :]
            j = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK_PAD), 1)
            cnt = (j >= shift) & (j < shift + ln)

            # distance (per-axis exact d2, pallas_gather round-4 form)
            dx = q[:, 0:1] - p[0:1, :]
            dy = q[:, 1:2] - p[1:2, :]
            dz = q[:, 2:3] - p[2:3, :]
            d2 = dx * dx + dy * dy + dz * dz              # [T, Cp]
            kw = alpha * (1.0 - (1.0 - jnp.exp(-beta * d2 / (2.0 * r2)))
                          / denom)

            # camera-frame local direction of the vertex's wo
            def qdot(c0):
                return (q[:, c0:c0 + 1] * wo[0:1, :]
                        + q[:, c0 + 1:c0 + 2] * wo[1:2, :]
                        + q[:, c0 + 2:c0 + 3] * wo[2:3, :])

            lgz = qdot(9)                                # n . wo
            same = qdot(12) > 0.0                        # (ng*sgn_fix) . wo
            gen_ok = lgz >= EPS_COSINE
            dot_r = qdot(15)       # world-space Phong mirror dir . wo
            ph_ok = dot_r > EPS_PHONG
            e = q[:, 21:22]
            powe = jnp.exp(e * jnp.log(jnp.maximum(dot_r, EPS_PHONG)))
            d_l = jnp.maximum(lgz, 0.0) * INV_PI
            pdf_p = jnp.where(ph_ok, (e + 1.0) * (0.5 * INV_PI) * powe,
                              0.0)
            dpdf = (q[:, 19:20] * d_l + q[:, 20:21] * pdf_p) * pcont
            rpdf = q[:, 19:20] * q[:, 18:19] + q[:, 20:21] * pdf_p
            w_light = pdvcm * mis_vc_w + pdvm * dpdf
            w_cam = q[:, 22:23] + q[:, 23:24] * rpdf
            misw = 1.0 / (w_light + 1.0 + w_cam)

            ok = (cnt & (d2 <= r2) & same & gen_ok
                  & (pdep + depth1 <= max_len) & (q[:, 24:25] > 0.5))
            base = jnp.where(ok, misw * kw, 0.0) * w_s
            s1 = base
            s2 = jnp.where(ph_ok, base * powe, 0.0)
            out1_ref[:] += jax.lax.dot_general(
                s1, thr, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out2_ref[:] += jax.lax.dot_general(
                s2, thr, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    for s in range(ROWS):
        slot(s)


def _query_table(cam_bsdf, cam_pos, a_cam, b_cam, ok_q) -> Array:
    """[N, 32] per-query precomputes for the kernel.

    cols 0:3 position; 9:12 shading normal; 12:15 geometric normal scaled
    by sign(ng . world_fix) (so `same` is one dot + compare); 15:18 the
    Phong mirror direction IN WORLD SPACE (local_reflect of the fixed dir
    mapped through the frame — the kernel dots it with world wo);
    18 reverse-pdf Lambertian term fix_z/pi; 19/20 side-matched pick
    weights of the Lambertian/Phong components; 21 phong exponent;
    22 a_cam = cam_dVCM * mis_vc_w; 23 b_cam = cam_dVM * cam_cont;
    24 query-valid flag. cols 3:9 unused (frame tangent/bitangent not
    needed: only z and the two world-space dots enter the math).
    """
    from ..core.math import local_reflect

    n = cam_pos.shape[0]
    frame = cam_bsdf.frame
    fix = cam_bsdf.local_dir_fix
    fix_z = fix[..., 2]
    wfix = cam_bsdf.world_dir_fix()
    sgn = jnp.where(jnp.sum(cam_bsdf.ng * wfix, axis=-1) >= 0.0, 1.0, -1.0)
    refl_w = frame.to_world(local_reflect(fix))

    pick = cam_bsdf.pick_probs()          # [N,4]
    # same-side matched components: L, P, SPEC_REFL (bsdf._matched_mask)
    sum_same = pick[:, 0] + pick[:, 1] + pick[:, 2]
    safe = jnp.where(sum_same > 0.0, sum_same, 1.0)
    w_l = jnp.where(sum_same > 0.0, pick[:, 0] / safe, 0.0)
    w_p = jnp.where(sum_same > 0.0, pick[:, 1] / safe, 0.0)

    ok = ok_q & (sum_same > 0.0) & (fix_z >= EPS_COSINE)

    q = jnp.zeros((n, _QCOLS), jnp.float32)
    q = q.at[:, 0:3].set(cam_pos)
    q = q.at[:, 9:12].set(frame.n)
    q = q.at[:, 12:15].set(cam_bsdf.ng * sgn[:, None])
    q = q.at[:, 15:18].set(refl_w)
    q = q.at[:, 18].set(jnp.maximum(fix_z, 0.0) * INV_PI)
    q = q.at[:, 19].set(w_l)
    q = q.at[:, 20].set(w_p)
    q = q.at[:, 21].set(cam_bsdf.phong_exp)
    q = q.at[:, 22].set(a_cam)
    q = q.at[:, 23].set(b_cam)
    q = q.at[:, 24].set(ok.astype(jnp.float32))
    return q


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _vm_tiled_core(vgrid_packed, tabs, scal, qtab, kd_pi, rho,
                   n_tiles: int, interpret: bool):
    return _vm_tiled_impl(vgrid_packed, tabs, scal, qtab, kd_pi, rho,
                          n_tiles, interpret)


def _vm_fwd(vgrid_packed, tabs, scal, qtab, kd_pi, rho, n_tiles,
            interpret):
    out = _vm_tiled_core(vgrid_packed, tabs, scal, qtab, kd_pi, rho,
                         n_tiles, interpret)
    return out, (vgrid_packed, tabs, scal, qtab, kd_pi, rho)


def _vm_bwd(n_tiles, interpret, res, g):
    return jax.tree_util.tree_map(jnp.zeros_like, res)


_vm_tiled_core.defvjp(_vm_fwd, _vm_bwd)


def _vm_tiled_impl(packed, tabs, scal, qtab, kd_pi, rho, n_tiles,
                   interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..photon_map import (GAUSS_ALPHA, GAUSS_BETA, GAUSS_EXP_NEG_BETA)

    itab, wtab = tabs
    kernel = partial(_vm_kernel, float(GAUSS_ALPHA), float(GAUSS_BETA),
                     float(1.0 - GAUSS_EXP_NEG_BETA))
    n = qtab.shape[0]
    out1, out2 = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, _QCOLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # vertices stay in HBM
        ],
        out_specs=(pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n, 3), jnp.float32),
                   jax.ShapeDtypeStruct((n, 3), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((16, CHUNK_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(itab, wtab, scal, qtab, packed)
    return kd_pi * out1 + rho * out2


def merge_vertices_tiled(vgrid, cfg, cam_bsdf, cam_pos, cam_thr, cam_dVCM,
                         cam_dVM, active, radius_sq, mis_vc_w,
                         n_light_paths, u_rows, depth1,
                         interpret: bool = False) -> Array:
    """Tile-shared VM merge round -> contribution [N,3] (already times
    cam_thr), the drop-in fast path for integrators/vcm._merge_vertices.

    Queries are cell-sorted before tiling (module docstring), so the tile
    unions stay tight at every camera depth; subsampling/reweighting stays
    unbiased exactly as in the PPM tile gather (`_tile_tables`).
    ``u_rows`` is [N // TILE, ROWS + 2] uniforms; ``depth1`` may be traced.
    """
    from .pallas_gather import ROWS as _R

    n = cam_pos.shape[0]
    assert n % TILE == 0, n
    n_tiles = n // TILE
    radius = jnp.sqrt(radius_sq)

    # ---- cell-sort the queries ------------------------------------------
    from ..photon_map import cell_coords, cell_index_1d
    res = vgrid.resolution
    n_cells = res ** 3
    cells = cell_index_1d(
        cell_coords(cam_pos, vgrid.origin, vgrid.cell_size, res), res)
    cells = jnp.where(active, cells, n_cells)   # inactive sort to the end
    _, order = jax.lax.sort(
        (cells.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)),
        num_keys=1)

    cam_cont = cam_bsdf.continuation_prob()
    if cfg.vcm_force_continuation_prob is not None:
        cam_cont = jnp.full_like(cam_cont, cfg.vcm_force_continuation_prob)
    a_cam = cam_dVCM * mis_vc_w
    b_cam = cam_dVM * cam_cont
    qtab = _query_table(cam_bsdf, cam_pos, a_cam, b_cam, active)
    qtab = qtab[order]
    pos_s = qtab[:, 0:3]
    valid_s = qtab[:, 24] > 0.5

    starts, lens, weights, _ref, _visited, _total = _tile_tables(
        vgrid, pos_s, radius, u_rows, valid=valid_s)
    itab = jnp.zeros((n_tiles, 8, 128), jnp.int32)
    itab = itab.at[:, 0, :_R].set(starts).at[:, 1, :_R].set(lens)
    wtab = jnp.zeros((n_tiles, 8, 128), jnp.float32)
    wtab = wtab.at[:, 0, :_R].set(weights)
    scal = jnp.stack([jnp.asarray(radius_sq, jnp.float32),
                      jnp.asarray(mis_vc_w, jnp.float32),
                      jnp.asarray(depth1, jnp.float32),
                      jnp.asarray(float(cfg.vcm_max_path_length),
                                  jnp.float32)]).reshape(1, 4)

    packed = _pack_vertices(vgrid)
    kd_pi = (cam_bsdf.kd * INV_PI)[order]
    rho = (cam_bsdf.ks
           * ((cam_bsdf.phong_exp + 2.0) * (0.5 * INV_PI))[:, None])[order]
    acc_s = _vm_tiled_core(packed, (itab, wtab),
                           scal, qtab, kd_pi, rho, n_tiles, interpret)

    acc = jnp.zeros_like(acc_s).at[order].set(acc_s)
    norm = 1.0 / (jnp.pi * radius_sq * n_light_paths)
    return cam_thr * acc * norm
