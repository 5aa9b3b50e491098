"""Layout experiment: [N, C] (components minor) vs [C, N] (rays minor)
for the BVH traversal's three cost centers — leaf Moller-Trumbore, child
slab test, and the row gather. TPU vector lanes are the MINOR axis (128
wide); putting a size-6/9 component axis there wastes ~95% of the VPU.

Findings feed accel/bvh.py (see its PERF ANALYSIS header).
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(fn, reps):
    out = fn()
    jax_block(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax_block(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--rows", type=int, default=48 * 1024)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    n, K, R = args.n, args.k, args.rows
    W = 64
    L, A = 6, 8
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    oT = o.T.copy()
    dT = d.T.copy()
    rowdat = jnp.asarray(rng.normal(size=(n, W)).astype(np.float32))
    rowdatT = rowdat.T.copy()
    table = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
    tableT = table.T.copy()
    idx0 = jnp.asarray((np.arange(n, dtype=np.int64) * 2654435761 % R
                        ).astype(np.int32))

    print(f"device={jax.devices()[0]} n={n} K={K} R={R}")

    # ---------------- leaf MT: [N, L, 9] form ----------------------------
    def mt_nc(row):
        ob = o[:, None, :]
        db = d[:, None, :]

        def body(k, acc):
            tri = (row[:, :9 * L] + acc[:, None]).reshape(n, L, 9)
            v0, e1, e2 = tri[..., 0:3], tri[..., 3:6], tri[..., 6:9]
            pvec = jnp.cross(db, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            tvec = ob - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(db * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
            tb = jnp.min(jnp.where(ok, t, 1e30), axis=1)
            return acc + jnp.where(tb < 1e30, tb, 0.0) * 1e-9

        return jax.lax.fori_loop(0, K, body, jnp.zeros((n,), jnp.float32))

    _fj = jax.jit(mt_nc)
    t = med(lambda: _fj(rowdat), args.reps)
    print(f"MT   [N,L,9] {t*1e3:9.2f} ms -> {t*1e9/(n*K):6.2f} ns/lane/step")

    # ---------------- leaf MT: SoA [C, N] form ---------------------------
    def mt_cn(rowT):
        ox, oy, oz = oT[0], oT[1], oT[2]
        dx, dy, dz = dT[0], dT[1], dT[2]

        def body(k, acc):
            tb = jnp.full((n,), 1e30)
            for j in range(L):
                c = rowT[9 * j:9 * j + 9] + acc[None, :]
                v0x, v0y, v0z = c[0], c[1], c[2]
                e1x, e1y, e1z = c[3], c[4], c[5]
                e2x, e2y, e2z = c[6], c[7], c[8]
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
                tb = jnp.minimum(tb, jnp.where(ok, t, 1e30))
            return acc + jnp.where(tb < 1e30, tb, 0.0) * 1e-9

        return jax.lax.fori_loop(0, K, body, jnp.zeros((n,), jnp.float32))

    _fj = jax.jit(mt_cn)
    t = med(lambda: _fj(rowdatT), args.reps)
    print(f"MT   [C,N]   {t*1e3:9.2f} ms -> {t*1e9/(n*K):6.2f} ns/lane/step")

    # ---------------- slab: [N, A, 6] form --------------------------------
    def slab_nc(row):
        inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        ob = o[:, None, :]

        def body(k, acc):
            ch = (row[:, :6 * A] + acc[:, None]).reshape(n, A, 6)
            t0 = (ch[..., 0:3] - ob) * inv_d[:, None, :]
            t1 = (ch[..., 3:6] - ob) * inv_d[:, None, :]
            tn = jnp.max(jnp.minimum(t0, t1), -1)
            tf = jnp.min(jnp.maximum(t0, t1), -1)
            key = jnp.where(tn <= tf, tn, 1e30)
            j = jnp.argmin(key, axis=1)
            return acc + j.astype(jnp.float32) * 1e-9

        return jax.lax.fori_loop(0, K, body, jnp.zeros((n,), jnp.float32))

    _fj = jax.jit(slab_nc)
    t = med(lambda: _fj(rowdat), args.reps)
    print(f"slab [N,A,6] {t*1e3:9.2f} ms -> {t*1e9/(n*K):6.2f} ns/lane/step")

    # ---------------- slab: SoA [C, N] form -------------------------------
    def slab_cn(rowT):
        ix = 1.0 / jnp.where(jnp.abs(dT[0]) < 1e-12, 1e-12, dT[0])
        iy = 1.0 / jnp.where(jnp.abs(dT[1]) < 1e-12, 1e-12, dT[1])
        iz = 1.0 / jnp.where(jnp.abs(dT[2]) < 1e-12, 1e-12, dT[2])
        ox, oy, oz = oT[0], oT[1], oT[2]

        def body(k, acc):
            best = jnp.full((n,), 1e30)
            bj = jnp.zeros((n,), jnp.float32)
            for j in range(A):
                c = rowT[6 * j:6 * j + 6] + acc[None, :]
                t0x = (c[0] - ox) * ix
                t0y = (c[1] - oy) * iy
                t0z = (c[2] - oz) * iz
                t1x = (c[3] - ox) * ix
                t1y = (c[4] - oy) * iy
                t1z = (c[5] - oz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.minimum(t0z, t1z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.maximum(t0z, t1z))
                key = jnp.where(tn <= tf, tn, 1e30)
                take = key < best
                best = jnp.where(take, key, best)
                bj = jnp.where(take, float(j), bj)
            return acc + bj * 1e-9

        return jax.lax.fori_loop(0, K, body, jnp.zeros((n,), jnp.float32))

    _fj = jax.jit(slab_cn)
    t = med(lambda: _fj(rowdatT), args.reps)
    print(f"slab [C,N]   {t*1e3:9.2f} ms -> {t*1e9/(n*K):6.2f} ns/lane/step")

    # ---------------- gathers --------------------------------------------
    def g_rows(idx0):
        def body(k, c):
            idx, acc = c
            row = table[idx]
            s = jnp.sum(row[:, ::8], axis=1)
            idx = (idx * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
            return idx, acc + s

        _, acc = jax.lax.fori_loop(0, K, body,
                                   (idx0, jnp.zeros((n,), jnp.float32)))
        return acc

    _fj = jax.jit(g_rows)
    t = med(lambda: _fj(idx0), args.reps)
    print(f"gather [R,W]->[N,W] {t*1e3:9.2f} ms -> "
          f"{t*1e9/(n*K):6.2f} ns/lane/step")

    def g_cols(idx0):
        def body(k, c):
            idx, acc = c
            cols = tableT[:, idx]              # [W, N]
            s = jnp.sum(cols[::8, :], axis=0)
            idx = (idx * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
            return idx, acc + s

        _, acc = jax.lax.fori_loop(0, K, body,
                                   (idx0, jnp.zeros((n,), jnp.float32)))
        return acc

    _fj = jax.jit(g_cols)
    t = med(lambda: _fj(idx0), args.reps)
    print(f"gather [W,R]->[W,N] {t*1e3:9.2f} ms -> "
          f"{t*1e9/(n*K):6.2f} ns/lane/step")

    def g_rows_T(idx0):
        def body(k, c):
            idx, acc = c
            row = table[idx].T                 # [W, N] via transpose
            s = jnp.sum(row[::8, :], axis=0)
            idx = (idx * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
            return idx, acc + s

        _, acc = jax.lax.fori_loop(0, K, body,
                                   (idx0, jnp.zeros((n,), jnp.float32)))
        return acc

    _fj = jax.jit(g_rows_T)
    t = med(lambda: _fj(idx0), args.reps)
    print(f"gather [R,W]->[N,W]->T {t*1e3:9.2f} ms -> "
          f"{t*1e9/(n*K):6.2f} ns/lane/step")

    # 8 separate small-table gathers (SoA tables, one per 8-col group)
    tables8 = [jnp.asarray(rng.normal(size=(R,)).astype(np.float32))
               for _ in range(8)]

    def g_soa(idx0):
        def body(k, c):
            idx, acc = c
            s = jnp.zeros((n,), jnp.float32)
            for tb in tables8:
                s = s + tb[idx]
            idx = (idx * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
            return idx, acc + s

        _, acc = jax.lax.fori_loop(0, K, body,
                                   (idx0, jnp.zeros((n,), jnp.float32)))
        return acc

    _fj = jax.jit(g_soa)
    t = med(lambda: _fj(idx0), args.reps)
    print(f"gather 8x [R]->[N]  {t*1e3:9.2f} ms -> "
          f"{t*1e9/(n*K):6.2f} ns/lane/step")


if __name__ == "__main__":
    main()
