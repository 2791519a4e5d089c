"""Bisect the StreamingAggregationOp step cost at Q18 scale (8M cap)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 6_001_215
CAP = 1 << 23


def t(fn, *args):
    f = jax.jit(fn)
    f(*args)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[:1]) if hasattr(
        x, "shape") and x.shape else np.asarray(x), out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x[:1]) if hasattr(
            x, "shape") and x.shape else np.asarray(x), out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    keys = np.zeros(CAP, np.int32)
    keys[:N] = np.sort(rng.integers(1, 1_500_000, N)).astype(np.int32)
    qty = np.zeros(CAP, np.int32)
    qty[:N] = rng.integers(100, 5000, N)
    sel = np.zeros(CAP, bool)
    sel[:N] = True
    k = jnp.asarray(keys)
    q = jnp.asarray(qty)
    s = jnp.asarray(sel)

    r = {}
    r["nonzero"] = t(lambda s: jnp.nonzero(
        s, size=CAP, fill_value=CAP)[0].astype(jnp.int32), s)
    pk = jnp.nonzero(s, size=CAP, fill_value=CAP)[0].astype(jnp.int32)
    r["pack2"] = t(lambda k, q, pk: (
        jnp.take(k, pk, mode="clip"), jnp.take(q, pk, mode="clip")), k, q,
        pk)
    kp = jnp.take(k, pk, mode="clip")
    r["head"] = t(lambda kp: (kp != jnp.roll(kp, 1)).at[0].set(True), kp)
    head = (kp != jnp.roll(kp, 1)).at[0].set(True)
    r["gids_cumsum"] = t(
        lambda head: jnp.cumsum(head.astype(jnp.int32)) - 1, head)
    gids = jnp.cumsum(head.astype(jnp.int32)) - 1
    r["scat_add_i64_cap"] = t(
        lambda g, v: jnp.zeros((CAP,), jnp.int64).at[g].add(
            v.astype(jnp.int64), mode="drop"), gids, q)
    r["scat_add_i32_cap"] = t(
        lambda g, v: jnp.zeros((CAP,), jnp.int32).at[g].add(
            v, mode="drop"), gids, q)
    r["scat_cnt_i64"] = t(
        lambda g, s: jnp.zeros((CAP,), jnp.int64).at[g].add(
            s.astype(jnp.int64), mode="drop"), gids, s)
    rr = jnp.arange(CAP, dtype=jnp.int32)
    r["group_rows_scatmin"] = t(
        lambda head, g: jnp.full((CAP,), CAP, jnp.int32).at[
            jnp.where(head, g, CAP)].min(rr, mode="drop"), head, gids)
    group_rows = jnp.full((CAP,), CAP, jnp.int32).at[
        jnp.where(head, gids, CAP)].min(rr, mode="drop")
    r["take_groupkeys"] = t(
        lambda kp, gr: jnp.take(kp, gr, mode="clip"), kp, group_rows)
    # the narrow digit-split sum at n_groups=CAP (what _sum_acc would
    # want but can't: n_groups*chunks too big) vs plain i64
    r["compact_nonzero_gather"] = t(
        lambda s, k, q: tuple(
            jnp.take(x, jnp.nonzero(s, size=1 << 21, fill_value=CAP)[0],
                     mode="clip") for x in (k, q)), s, k, q)
    print({kk: f"{v:.0f}ms" for kk, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
