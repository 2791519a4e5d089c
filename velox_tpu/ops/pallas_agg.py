"""Pallas grouped-aggregation kernel (the hot-op showcase).

Exact grouped int sums without XLA scatters OR 64-bit bulk math: within
each grid block, rows are processed in 1024-row tiles; each tile's
contribution digits (3x14-bit split) multiply a one-hot(group) matrix on
the MXU — ``digits(1,1024) @ onehot(1024,G)`` — giving per-group tile
sums that are exact in f32 (< 2^24), accumulated into int32 block
accumulators (< 2^30), combined to int64 only at (block, group)
granularity. Sentinel group ids (>= G) produce an all-zero one-hot row
and drop out naturally.

This replaces ~6 serialized XLA scatter passes per aggregate with one
MXU-bound pass — the velox HashTable groupProbe hot loop
(velox/exec/HashTable.cpp:470) reimagined as matrix multiplication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 1024
_BLOCK = 64 * 1024  # rows per grid step; digit sums stay < 2^30 in i32
_GPAD = 128         # group axis padded to the TPU lane width


def _kernel(gid_ref, pos_ref, neg_ref, out_ref, *, num_groups: int):
    """One grid block: accumulate 3 digit lanes x {pos, neg} into
    (6, _GPAD) int32 (lanes beyond num_groups stay zero)."""
    del num_groups
    acc = jnp.zeros((8, _GPAD), jnp.int32)

    def tile_body(t, acc):
        sl = pl.ds(t.astype(jnp.int32) * jnp.int32(_TILE), _TILE)
        g = gid_ref[sl]
        onehot = (
            g[:, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (_TILE, _GPAD), 1)).astype(jnp.float32)

        def digits(v):
            return jnp.stack([
                (v & 0x3FFF).astype(jnp.float32),
                ((v >> 14) & 0x3FFF).astype(jnp.float32),
                (v >> 28).astype(jnp.float32),
            ])  # (3, _TILE)

        p = digits(pos_ref[sl])
        q = digits(neg_ref[sl])
        both = jnp.concatenate(
            [p, q, jnp.zeros((2, _TILE), jnp.float32)])  # (8, _TILE)
        # HIGHEST: full-f32 MXU passes — the default (fast bf16) rounds
        # 14-bit digits and breaks exactness
        tile_sums = jnp.dot(
            both, onehot, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        # each tile sum < 2^24: exact in f32; accumulate in i32
        return acc + tile_sums.astype(jnp.int32)

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(_BLOCK // _TILE), tile_body, acc)
    out_ref[...] = acc[:6][None]


@functools.partial(jax.jit, static_argnames=("num_groups", "interpret"))
def grouped_sum_i32(gids: jax.Array, contrib: jax.Array,
                    num_groups: int, interpret: bool = False) -> jax.Array:
    """Exact int64 per-group sums of int32 contributions.

    ``gids`` >= num_groups are dropped. Works for negative contributions
    (pos/neg split). Returns (num_groups,) int64.
    """
    n = gids.shape[0]
    pad = (-n) % _BLOCK
    if pad:
        gids = jnp.concatenate(
            [gids, jnp.full((pad,), num_groups, jnp.int32)])
        contrib = jnp.concatenate([contrib, jnp.zeros((pad,), jnp.int32)])
        n += pad
    g = jnp.where(gids.astype(jnp.int32) < num_groups,
                  gids.astype(jnp.int32), jnp.int32(num_groups))
    c = contrib.astype(jnp.int32)
    pos = jnp.where(c >= 0, c, 0)
    neg = jnp.where(c < 0, -c, 0)

    blocks = n // _BLOCK
    out = pl.pallas_call(
        functools.partial(_kernel, num_groups=num_groups),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((_BLOCK,), lambda i: (i,)),
            pl.BlockSpec((_BLOCK,), lambda i: (i,)),
            pl.BlockSpec((_BLOCK,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec(
            (1, 8 - 2, _GPAD),
            lambda i: (i, jnp.int32(0), jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct((blocks, 6, _GPAD), jnp.int32),
        interpret=interpret,
    )(g, pos, neg)

    per_digit = jnp.sum(
        out.astype(jnp.int64), axis=0)[:, :num_groups]  # (6, G)
    pos64 = (per_digit[0] + (per_digit[1] << 14) + (per_digit[2] << 28))
    neg64 = (per_digit[3] + (per_digit[4] << 14) + (per_digit[5] << 28))
    return pos64 - neg64


def _multi_kernel(gid_ref, pos_ref, neg_ref, out_ref, *, n_cols: int,
                  block: int):
    """All contribution columns in one pass: rows = 3 digits x {pos,neg}
    x n_cols; one one-hot build + one MXU matmul per tile."""
    rows = 6 * n_cols
    rows_pad = -(-rows // 8) * 8
    acc = jnp.zeros((rows_pad, _GPAD), jnp.int32)

    def tile_body(t, acc):
        sl = pl.ds(t.astype(jnp.int32) * jnp.int32(_TILE), _TILE)
        g = gid_ref[sl]
        onehot = (
            g[:, None]
            == jax.lax.broadcasted_iota(
                jnp.int32, (_TILE, _GPAD), 1)).astype(jnp.float32)
        p = pos_ref[:, sl]  # (n_cols, _TILE)
        q = neg_ref[:, sl]

        def digits(v):
            return jnp.concatenate([
                (v & 0x3FFF).astype(jnp.float32),
                ((v >> 14) & 0x3FFF).astype(jnp.float32),
                (v >> 28).astype(jnp.float32),
            ])  # (3*n_cols, _TILE)

        both = jnp.concatenate([digits(p), digits(q)])
        if rows_pad > rows:
            both = jnp.concatenate(
                [both, jnp.zeros((rows_pad - rows, _TILE), jnp.float32)])
        tile_sums = jnp.dot(
            both, onehot, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return acc + tile_sums.astype(jnp.int32)

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(block // _TILE), tile_body, acc)
    out_ref[...] = acc[None]


@functools.partial(jax.jit, static_argnames=("num_groups", "interpret"))
def grouped_multi_sum_i32(
        gids: jax.Array, contribs: jax.Array, num_groups: int,
        interpret: bool = False) -> jax.Array:
    """Exact int64 per-group sums of L int32 contribution columns in ONE
    kernel launch. contribs: (L, n). Returns (L, num_groups) int64."""
    L, n = contribs.shape
    # block sized so double-buffered (pos + neg + gids) stays under VMEM
    block = _BLOCK
    while L * block * 4 * 2 * 2 > 8 * 1024 * 1024 and block > 4096:
        block //= 2
    pad = (-n) % block
    if pad:
        gids = jnp.concatenate(
            [gids, jnp.full((pad,), num_groups, jnp.int32)])
        contribs = jnp.concatenate(
            [contribs, jnp.zeros((L, pad), jnp.int32)], axis=1)
        n += pad
    g = jnp.where(gids.astype(jnp.int32) < num_groups,
                  gids.astype(jnp.int32), jnp.int32(num_groups))
    c = contribs.astype(jnp.int32)
    pos = jnp.where(c >= 0, c, 0)
    neg = jnp.where(c < 0, -c, 0)

    rows = 6 * L
    rows_pad = -(-rows // 8) * 8
    blocks = n // block
    out = pl.pallas_call(
        functools.partial(_multi_kernel, n_cols=L, block=block),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,)),
            pl.BlockSpec((L, block), lambda i: (jnp.int32(0), i)),
            pl.BlockSpec((L, block), lambda i: (jnp.int32(0), i)),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_pad, _GPAD),
            lambda i: (i, jnp.int32(0), jnp.int32(0))),
        out_shape=jax.ShapeDtypeStruct(
            (blocks, rows_pad, _GPAD), jnp.int32),
        interpret=interpret,
    )(g, pos, neg)

    per = jnp.sum(out.astype(jnp.int64), axis=0)[:rows, :num_groups]
    per = per.reshape(2, 3, L, num_groups)  # (sign, digit, col, group)
    tot = (per[:, 0] + (per[:, 1] << 14) + (per[:, 2] << 28))
    return tot[0] - tot[1]  # (L, G)


def pallas_available() -> bool:
    """Real (compiled) pallas only on TPU; CPU uses interpret mode."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
