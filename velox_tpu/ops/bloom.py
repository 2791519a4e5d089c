"""Bloom-filter bitmask for dynamic join filters.

The reference builds a split-block bloom over build-side hashes
(velox/common/base/BloomFilter.h; built in
velox/exec/HashTable.cpp:1036-1048) and probes it per row. The TPU
form is a flat uint64 word array captured as an expression literal:
membership is two mixes + two bit tests — pure elementwise device ops
(64-bit elementwise is cheap on the target backend; only 64-bit
scatters are pathological, BASELINE.md)."""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= _C1
    x ^= x >> np.uint64(33)
    x *= _C2
    x ^= x >> np.uint64(33)
    return x


def build_bloom(values: np.ndarray, bits_per_key: int = 16
                ) -> np.ndarray:
    """uint64 word array with two bits set per distinct value."""
    n = max(len(values), 1)
    nbits = 1 << int(np.ceil(np.log2(max(n * bits_per_key, 128))))
    words = np.zeros(nbits // 64, dtype=np.uint64)
    h = _mix64_np(values.astype(np.int64).view(np.uint64)
                  if values.dtype != np.uint64 else values)
    mask = np.uint64(nbits - 1)
    for shift in (np.uint64(0), np.uint64(32)):
        b = (h >> shift) & mask
        np.bitwise_or.at(words, (b >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (b & np.uint64(63)))
    return words


def bloom_contains_device(v, words):
    """Device-side membership test (two bits; false positives only)."""
    import jax.numpy as jnp

    x = v.astype(jnp.int64).astype(jnp.uint64)
    x = x ^ (x >> 33)
    x = x * jnp.uint64(int(_C1))
    x = x ^ (x >> 33)
    x = x * jnp.uint64(int(_C2))
    x = x ^ (x >> 33)
    nbits = words.shape[0] * 64
    mask = jnp.uint64(nbits - 1)
    out = None
    for shift in (0, 32):
        b = (x >> jnp.uint64(shift)) & mask
        w = jnp.take(words, (b >> jnp.uint64(6)).astype(jnp.int32),
                     mode="clip")
        hit = (w >> (b & jnp.uint64(63))) & jnp.uint64(1)
        out = hit if out is None else out & hit
    return out != 0
