"""Why is the in-traversal-loop row gather 10x slower than a standalone
bulk gather? Isolates: loop context, cross-round index dependency, fori_loop
vs unrolled, row width. Drives the BVH traversal redesign (accel/bvh.py).
"""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def med(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    n = 1 << 20
    K = 20
    for R, W in [(77139, 64), (131072, 16), (524288, 8)]:
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, R, size=(n,)).astype(np.int32))
        idx_k = jnp.asarray(rng.integers(0, R, size=(K, n)).astype(np.int32))

        # 1. one bulk gather
        f1 = jax.jit(lambda i: jnp.sum(table[i], axis=1))
        t1 = med(lambda: f1(idx))
        print(f"[{R}x{W}] standalone gather      "
              f"{t1*1e3:8.3f} ms  {t1*1e9/n:6.2f} ns/row "
              f"{n*W*4/t1/1e9:7.1f} GB/s")

        # 2. K gathers, independent indices, fori_loop
        def loop_indep(idx_k):
            def body(k, acc):
                return acc + jnp.sum(table[idx_k[k]], axis=1)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((n,)))
        t2 = med(lambda: jax.jit(loop_indep)(idx_k))
        print(f"  fori indep-idx  ({K}x)     "
              f"{t2*1e3:8.3f} ms  {t2*1e9/n/K:6.2f} ns/row")

        # 3. K gathers, dependent indices, fori_loop
        def loop_dep(idx):
            def body(k, c):
                i, acc = c
                row = table[i]
                s = jnp.sum(row, axis=1)
                i = (i * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
                return i, acc + s
            return jax.lax.fori_loop(0, K, body, (idx, jnp.zeros((n,))))[1]
        t3 = med(lambda: jax.jit(loop_dep)(idx))
        print(f"  fori dep-idx    ({K}x)     "
              f"{t3*1e3:8.3f} ms  {t3*1e9/n/K:6.2f} ns/row")

        # 4. K gathers, dependent indices, PYTHON-UNROLLED
        def unrolled_dep(idx):
            acc = jnp.zeros((n,))
            i = idx
            for _ in range(K):
                row = table[i]
                s = jnp.sum(row, axis=1)
                i = (i * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
                acc = acc + s
            return acc
        t4 = med(lambda: jax.jit(unrolled_dep)(idx))
        print(f"  unrolled dep    ({K}x)     "
              f"{t4*1e3:8.3f} ms  {t4*1e9/n/K:6.2f} ns/row")


if __name__ == "__main__":
    main()
