"""Follow-ups to gather_bitcast_exp: (a) int8/int16 price vs width —
is a quantized 64-128 BYTE row encoding cheap; (b) price of a gather
whose indices are mostly duplicates (row 0) — is a split-table design
(inner int8 table + f32 leaf table, dead side clamped to row 0) viable.
"""
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(fn, reps=5):
    fn().block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 1 << 20
    K = 20
    R = 48 * 1024
    rng = np.random.default_rng(0)
    idx_np = (np.arange(n, dtype=np.int64) * 2654435761 % R).astype(np.int32)
    idx0 = jnp.asarray(idx_np)

    def bench(dtype, W, frac_live=1.0, label=None):
        if dtype == jnp.float32:
            table = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
        else:
            table = jnp.asarray(
                rng.integers(-100, 100, size=(R, W)).astype(dtype))
        live = jnp.asarray((np.arange(n) % 100) < frac_live * 100)

        def f(idx0):
            def body(k, c):
                idx, acc = c
                use = jnp.where(live, idx, 0)
                row = table[use]
                s = jnp.sum(row[:, :: max(1, W // 8)]
                            .astype(jnp.float32), axis=1)
                idx = (idx * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
                return idx, acc + s
            _, acc = jax.lax.fori_loop(0, K, body,
                                       (idx0, jnp.zeros((n,), jnp.float32)))
            return acc
        g = jax.jit(f)
        t = med(lambda: g(idx0))
        name = label or f"{np.dtype(dtype).name} [R,{W}] live={frac_live}"
        print(f"{name:34s} {t*1e3:8.2f} ms  {t/n/K*1e9:6.2f} ns/lane/step",
              flush=True)

    for dt, W in ((jnp.int8, 32), (jnp.int8, 64), (jnp.int8, 128),
                  (jnp.int16, 64), (jnp.int16, 128),
                  (jnp.float32, 16), (jnp.float32, 64)):
        bench(dt, W)
    for frac in (1.0, 0.5, 0.25, 0.1):
        bench(jnp.float32, 64, frac_live=frac)


if __name__ == "__main__":
    main()
