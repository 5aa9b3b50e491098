"""Micro-benchmark for the Pallas packet-traversal design (accel/bvh.py):
a while-loop kernel popping synthetic nodes, reading each node's row via
scalar-dynamic indexing from a VMEM-resident table, then slab-testing 8
children against a 1024-ray tile ([8,128] f32 per coordinate).

Measures ns per node-step per tile — the packet design's unit cost.
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--rows", type=int, default=48 * 1024)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--variant", default="scalar",
                    choices=["scalar", "vmem_smem", "hbm_vmem", "hbm_smem",
                             "fixedrow", "dmaonly", "noreduce", "onereduce", "noscalar"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = args.rows
    W = 128   # row width padded to the 128-lane tile (Mosaic DMA-slice rule)
    A = 8
    STEPS = args.steps
    G = args.tiles
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
    o = jnp.asarray(rng.normal(size=(G, 3, 8, 128)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(G, 3, 8, 128)).astype(np.float32))

    variant = args.variant
    table_space = (pltpu.ANY if variant.startswith("hbm")
                   or variant in ("fixedrow", "dmaonly") else pltpu.VMEM)
    stage_smem = variant.endswith("smem")

    def slab_all(getb, ox, oy, oz, ix, iy, iz, best):
        nxt = jnp.int32(0)
        packed = jnp.zeros((8, 128), jnp.int32)
        for c in range(A):
            b0, b1, b2 = getb(6 * c + 0), getb(6 * c + 1), getb(6 * c + 2)
            b3, b4, b5 = getb(6 * c + 3), getb(6 * c + 4), getb(6 * c + 5)
            t0x = (b0 - ox) * ix
            t0y = (b1 - oy) * iy
            t0z = (b2 - oz) * iz
            t1x = (b3 - ox) * ix
            t1y = (b4 - oy) * iy
            t1z = (b5 - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            hit = (tn <= tf) & (tn < best)
            best = jnp.where(hit, jnp.minimum(best, tn + 1.0), best)
            if variant == "noreduce":
                pass                      # no cross-lane reduction at all
            elif variant == "onereduce":
                packed = packed | (hit.astype(jnp.int32) << c)
            else:
                nxt = nxt + jnp.sum(hit.astype(jnp.int32))
        if variant == "onereduce":
            nxt = jnp.max(packed)         # ONE reduction for all children
        return nxt, best

    def kernel(tab_ref, o_ref, d_ref, out_ref, row_ref, sem_ref):
        ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
        dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
        ix = 1.0 / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)

        def body(k, carry):
            node, t_best = carry
            if variant == "scalar":
                def getb(j):
                    return tab_ref[node, j]
            elif variant == "fixedrow":
                # row staged ONCE outside the loop: isolates the cost of
                # 48 static-offset scalar reads + vector slab per step
                def getb(j):
                    return row_ref[0, j]
            else:
                dma = pltpu.make_async_copy(
                    tab_ref.at[pl.ds(node, 1), :], row_ref, sem_ref)
                dma.start()
                dma.wait()

                def getb(j):
                    return row_ref[0, j]
            if variant == "noscalar":
                # vector row load only; no per-element scalar reads
                r = row_ref[0, :]
                def getb(j):
                    return r[j]
            if variant == "dmaonly":
                # DMA per step + ONE scalar read: isolates DMA latency
                nxt = (row_ref[0, 0] > 1e30).astype(jnp.int32)
                best = t_best + 1e-9
            else:
                nxt, best = slab_all(getb, ox, oy, oz, ix, iy, iz, t_best)
            node = (node * 5 + 1 + (nxt % 2)) % R
            return node, best

        node0 = (pl.program_id(0) * jnp.int32(40503)) % R
        _, best = jax.lax.fori_loop(
            0, STEPS, body, (node0, jnp.full((8, 128), 1e30)))
        out_ref[0] = best

    f = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=table_space),
            pl.BlockSpec((1, 3, 8, 128), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, 3, 8, 128), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((G, 8, 128), jnp.float32),
        scratch_shapes=[
            (pltpu.SMEM((1, W), jnp.float32) if stage_smem
             else pltpu.VMEM((1, W), jnp.float32)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=args.interpret,
    )

    def run():
        return f(table, o.reshape(G, 1, 3, 8, 128)[:, 0],
                 d.reshape(G, 1, 3, 8, 128)[:, 0])

    # NOTE blockspecs above give per-tile blocks (1,3,8,128): kernel refs
    # are [1,3,8,128]; adjust indexing
    runj = jax.jit(run)
    out = runj()
    out.block_until_ready()
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        runj().block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts)
    per_step = t / (G * STEPS)
    per_ray_step = per_step / 1024
    print(f"device={jax.devices()[0]} G={G} STEPS={STEPS} R={R}")
    print(f"total {t*1e3:.2f} ms -> {per_step*1e9:.1f} ns/node-step/tile "
          f"-> {per_ray_step*1e9:.3f} ns/ray/step")


if __name__ == "__main__":
    main()
