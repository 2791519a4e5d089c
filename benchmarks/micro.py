"""Micro-benchmark suite (velox/benchmarks/basic analog).

Times the engine's primitive kernels on the attached device and prints
one row per benchmark. Every measurement reduces to a scalar INSIDE the
jitted program before fetching — on tunneled backends, fetching an
array measures the wire, not the kernel (see BASELINE.md).

Run: python benchmarks/micro.py [rows_log2=22]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import velox_tpu  # noqa: F401  (x64 + compile cache)
import jax
import jax.numpy as jnp
import numpy as np


def bench(name, make_fn, *args, iters=3):
    def wrapped(*a):
        out = make_fn(*a)
        acc = jnp.zeros((), jnp.int32)
        for l in jax.tree_util.tree_leaves(out):
            flat = l.reshape(-1)
            acc = acc + flat[0].astype(jnp.int32) \
                + flat[-1].astype(jnp.int32)
        return acc

    f = jax.jit(wrapped)
    t0 = time.perf_counter()
    int(f(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        int(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<34} {best * 1e3:>9.1f} ms   "
          f"(compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 22)
    rng = np.random.default_rng(0)
    print(f"# rows = {n} on {jax.devices()[0].platform}")

    i32 = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))
    i64 = i32.astype(jnp.int64)
    f64 = jnp.asarray(rng.normal(size=n))
    gid = jnp.asarray(
        np.minimum(np.sort(rng.integers(0, n // 4, n)), n).astype(
            np.int32))
    sel = jnp.asarray(rng.random(n) < 0.5)
    codes = jnp.asarray(rng.integers(0, 1000, n).astype(np.int32))

    # ---- expression eval (fused arithmetic + comparison chain)
    bench("expr: fused arith+cmp (i32)",
          lambda a, b: jnp.where((a * 3 + b) % 7 > 2, a - b, a + b),
          i32, codes)
    bench("expr: dict transform gather",
          lambda c: jnp.take(jnp.arange(1001, dtype=jnp.int32), c + 1,
                             mode="clip"), codes)

    # ---- sort / group / join kernels
    from velox_tpu.ops.groupby import group_ids_sorted
    from velox_tpu.ops.join import (
        build_join_index, build_join_table, probe_join_table)
    from velox_tpu.ops.sort import pack_indices
    from velox_tpu.ops.sortkey import encode_sort_key

    bench("sort: 2-operand i32", lambda k, p: jax.lax.sort(
        [k, p], is_stable=False, num_keys=2), i32, codes)
    bench("sortkey: f64 -> 3xi32 words",
          lambda v: tuple(encode_sort_key(v, None)), f64)
    bench("pack_indices (nonzero repl.)", lambda s: pack_indices(s), sel)
    bench("group_ids_sorted 1 key",
          lambda k, s: group_ids_sorted([(k, None)], s), i32, sel)

    bkeys = jnp.asarray(
        np.sort(rng.choice(1 << 20, 1024, replace=False)).astype(
            np.int32))
    bsel = jnp.ones((1024,), jnp.bool_)
    sk, perm, nact = jax.jit(build_join_index)(bkeys, None, bsel)
    tf, tc = jax.jit(
        lambda s, a: build_join_table(s, a, 0, 1 << 20))(sk, nact)
    bench("join: kArray probe",
          lambda k, s: probe_join_table(tf, tc, 0, k, None, s), i32,
          jnp.ones((n,), jnp.bool_))

    # ---- aggregation
    bench("agg: i32 scatter-add",
          lambda g, v: jnp.zeros((n,), jnp.int32).at[g].add(
              v, mode="drop"), gid, i32)
    bench("agg: clustered cumsum-diff (i64)",
          lambda v: jnp.cumsum(v.astype(jnp.int64)), i32)

    # ---- serializer (host)
    from velox_tpu.serial import deserialize_page, serialize_page
    from velox_tpu.types import BIGINT, DOUBLE
    from velox_tpu.vector.batch import Batch

    b = Batch.from_pydict(
        {"k": [int(x) for x in rng.integers(0, 100, 65536)],
         "v": [float(x) for x in rng.normal(size=65536)]},
        {"k": BIGINT, "v": DOUBLE})
    for mode, label in ((False, "raw"), (True, "zlib"), ("zstd", "zstd")):
        t0 = time.perf_counter()
        for _ in range(5):
            page = serialize_page(b, compress=mode)
            deserialize_page(page)
        dt = (time.perf_counter() - t0) / 5
        print(f"{'page roundtrip 64k rows ' + label:<34} "
              f"{dt * 1e3:>9.1f} ms   ({len(page)} bytes)", flush=True)


if __name__ == "__main__":
    main()
