"""Is the random-row gather price DTYPE-determined? gather_exp2 measured
f32 rows at ~13.3 ns/lane/step (flat in width) but int8 rows at ~3.9 —
if that price survives when the int8 table is a BITCAST VIEW of the f32
row table (same bytes), the BVH traversal can gather [R, 4W] int8 and
bitcast back per lane for a ~3.4x cut with zero quantization.
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
    R, W = 48 * 1024, 64
    rng = np.random.default_rng(0)
    table_f = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
    # same bytes as int8 [R, 4W] and int32 [R, W]
    table_b = jax.lax.bitcast_convert_type(table_f, jnp.int8).reshape(R, 4 * W)
    table_i = jax.lax.bitcast_convert_type(table_f, jnp.int32)
    idx0 = jnp.asarray((np.arange(n, dtype=np.int64) * 2654435761 % R
                        ).astype(np.int32))

    def mk(table, decode):
        def f(idx0):
            def body(k, c):
                idx, acc = c
                row = table[idx]
                s = decode(row)
                idx = (idx * 5 + 1 + (s > 1e30).astype(jnp.int32)) % R
                return idx, acc + s
            _, acc = jax.lax.fori_loop(0, K, body,
                                       (idx0, jnp.zeros((n,), jnp.float32)))
            return acc
        return jax.jit(f)

    def dec_f32(row):
        return jnp.sum(row[:, ::8], axis=1)

    def dec_bitcast(row):          # int8 [n, 4W] -> f32 view -> same sum
        fr = jax.lax.bitcast_convert_type(
            row.reshape(-1, W, 4), jnp.float32)
        return jnp.sum(fr[:, ::8], axis=1)

    def dec_i32(row):
        fr = jax.lax.bitcast_convert_type(row, jnp.float32)
        return jnp.sum(fr[:, ::8], axis=1)

    for name, tab, dec in (("f32 [R,64]", table_f, dec_f32),
                           ("int8 [R,256] bitcast", table_b, dec_bitcast),
                           ("int32 [R,64] bitcast", table_i, dec_i32)):
        g = mk(tab, dec)
        t = med(lambda: g(idx0))
        print(f"{name:24s} {t*1e3:8.2f} ms  {t/n/K*1e9:6.2f} ns/lane/step",
              flush=True)


if __name__ == "__main__":
    main()
