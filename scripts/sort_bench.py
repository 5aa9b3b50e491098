"""Micro-bench: photon-grid build strategies on the current backend.

The PPM grid build sorts ~4.19M photon rows by cell id each iteration
(OptixRenderer_SpatialHash.cu:209-283 equivalent). Candidate forms:

  a) multi  — one lax.sort with 10 operands (key + 9 payload columns),
              the round-1 design: the sort network co-moves the payload.
  b) perm   — lax.sort (key, iota) then ONE [P,9] packed row gather.
  c) cols   — lax.sort (key, iota) then 9 separate [P] column gathers.
  d) argsort— jnp.argsort(key) then packed row gather.

Plus the offset table: searchsorted(method='sort') vs ('scan').

Usage: python scripts/sort_bench.py [--n 4194304] [--reps 5] [--cpu]
"""
import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(fn, reps):
    r = fn()
    for leaf in r if isinstance(r, tuple) else (r,):
        leaf.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        for leaf in r if isinstance(r, tuple) else (r,):
            leaf.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 22)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cells", type=int, default=100 ** 3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    n = args.n
    key = jax.random.PRNGKey(0)
    cells = jax.random.randint(key, (n,), 0, args.cells, jnp.int32)
    cols = jax.random.normal(jax.random.PRNGKey(1), (9, n), jnp.float32)
    packed = jnp.transpose(cols)  # [n, 9]
    print(f"device={jax.devices()[0]} n={n}")

    @jax.jit
    def multi(cells, cols):
        out = jax.lax.sort((cells,) + tuple(cols[i] for i in range(9)),
                           num_keys=1)
        return out[0], out[1]

    @jax.jit
    def perm(cells, packed):
        k, idx = jax.lax.sort((cells, jnp.arange(n, dtype=jnp.int32)),
                              num_keys=1)
        return k, packed[idx]

    @jax.jit
    def colg(cells, cols):
        k, idx = jax.lax.sort((cells, jnp.arange(n, dtype=jnp.int32)),
                              num_keys=1)
        return k, tuple(cols[i][idx] for i in range(9))[0]

    @jax.jit
    def argsrt(cells, packed):
        idx = jnp.argsort(cells)
        return cells[idx], packed[idx]

    @jax.jit
    def key_only(cells):
        return jax.lax.sort((cells,), num_keys=1)[0]

    @jax.jit
    def offsets_sorted(k):
        return jnp.searchsorted(k, jnp.arange(args.cells + 1,
                                              dtype=k.dtype),
                                method="sort")

    print(f"key_only_sort    {med(lambda: key_only(cells), args.reps)*1e3:9.2f} ms")
    print(f"multi(10-op)     {med(lambda: multi(cells, cols), args.reps)*1e3:9.2f} ms")
    print(f"perm+rowgather   {med(lambda: perm(cells, packed), args.reps)*1e3:9.2f} ms")
    print(f"perm+colgather   {med(lambda: colg(cells, cols), args.reps)*1e3:9.2f} ms")
    print(f"argsort+gather   {med(lambda: argsrt(cells, packed), args.reps)*1e3:9.2f} ms")
    k = key_only(cells)
    print(f"offsets(sorted)  {med(lambda: offsets_sorted(k), args.reps)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
