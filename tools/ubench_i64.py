"""Microbench: i32 vs i64 cost of the exact op shapes in the Q3/Q18 hot
paths (streaming-agg step, merge-probe) on the real TPU.

Measures with value fetches (block_until_ready lies on this backend).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 23          # 8M, the bench batch capacity
G = 1 << 21          # ~2M groups (Q18 first agg scale)


def timeit(fn, *args, iters=3):
    fn(*args)  # compile
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # fetch
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x[:1]), out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    keys64 = np.sort(rng.integers(0, 6_000_000, N)).astype(np.int64)
    idx = rng.integers(0, N, N).astype(np.int32)
    sorted_build64 = np.sort(rng.integers(0, 6_000_000, G)).astype(np.int64)

    for name, dt in (("i32", jnp.int32), ("i64", jnp.int64)):
        k = jnp.asarray(keys64.astype(dt))
        sb = jnp.asarray(sorted_build64.astype(dt))
        ix = jnp.asarray(idx)

        r = {}
        r["gather"] = timeit(jax.jit(lambda k, ix: jnp.take(k, ix)), k, ix)
        r["adj_eq"] = timeit(
            jax.jit(lambda k: (k != jnp.roll(k, 1)).astype(jnp.int32)), k)
        r["where3"] = timeit(
            jax.jit(lambda k: jnp.where(k > 100, k, jnp.where(
                k < 50, k + 1, k * 2))), k)
        r["cumsum_gid"] = timeit(
            jax.jit(lambda k: jnp.cumsum(
                (k != jnp.roll(k, 1)).astype(jnp.int32))), k)
        gid = jnp.asarray(
            np.minimum(np.arange(N) // 4, G - 1).astype(np.int32))
        r["scat_add"] = timeit(
            jax.jit(lambda k, g: jnp.zeros((G,), k.dtype).at[g].add(k)),
            k, gid)
        r["scat_min"] = timeit(
            jax.jit(lambda k, g: jnp.full((G,), 99, jnp.int32).at[
                jnp.where(k > 0, g, G)].min(
                    jnp.arange(N, dtype=jnp.int32), mode="drop")), k, gid)
        r["searchsorted"] = timeit(
            jax.jit(lambda sb, k: jnp.searchsorted(sb, k).astype(
                jnp.int32)), sb, k)
        r["cast_to_i32"] = timeit(
            jax.jit(lambda k: k.astype(jnp.int32)), k)
        print(name, {kk: f"{v*1e3:.1f}ms" for kk, v in r.items()},
              flush=True)


if __name__ == "__main__":
    main()
