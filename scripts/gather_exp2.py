"""Gather pricing model: ns/lane vs row width, table size, dtype, and
index-dependency. Decides the BVH row-table encoding (accel/bvh.py).
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(fn, reps=3):
    out = fn()
    out.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, K = args.n, args.k
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} n={n} K={K}")

    def run(R, W, dtype, dep=True, label=""):
        table = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32)
                            ).astype(dtype)
        idx0 = jnp.asarray((np.arange(n, dtype=np.int64) * 2654435761 % R
                            ).astype(np.int32))

        def f(idx0):
            def body(k, c):
                idx, acc = c
                row = table[idx]
                s = jnp.sum(row[:, :: max(1, W // 8)].astype(jnp.float32),
                            axis=1)
                if dep:
                    idx = (idx * 5 + 1
                           + (s > 1e30).astype(jnp.int32)) % R
                else:
                    idx = (idx * 5 + 1 + k) % R
                return idx, acc + s

            _, acc = jax.lax.fori_loop(0, K, body,
                                       (idx0, jnp.zeros((n,), jnp.float32)))
            return acc

        _fj = jax.jit(f)
        t = med(lambda: _fj(idx0), args.reps)
        print(f"{label:34s} R={R:7d} W={W:3d} {str(dtype):14s} "
              f"dep={int(dep)} {t*1e3:9.2f} ms -> "
              f"{t*1e9/(n*K):6.2f} ns/lane/step")

    for W in (8, 16, 32, 64, 128):
        run(48 * 1024, W, jnp.float32, True, f"width sweep")
    for R in (3 * 1024, 6 * 1024, 12 * 1024, 18 * 1024, 24 * 1024,
              36 * 1024, 48 * 1024, 96 * 1024, 384 * 1024):
        run(R, 64, jnp.float32, True, "table-size sweep")
    run(48 * 1024, 64, jnp.bfloat16, True, "dtype bf16")
    run(48 * 1024, 64, jnp.int8, True, "dtype int8")
    run(48 * 1024, 64, jnp.float32, False, "independent idx")


if __name__ == "__main__":
    main()
