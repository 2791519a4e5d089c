"""Long-decimal (int128) digit-split lanes.

The reference computes DECIMAL(p>18) on int128 (velox/type/HugeInt.h,
velox/type/DecimalUtil.h). TPUs have no 128-bit lanes and emulate even
64-bit scatters poorly, so a wide decimal column SHREDS at ingest into
THREE int64 digit lanes — sign-magnitude base-2^42 digits, the Q1
sum_charge trick generalized:

    value = sign * (d2 * 2^84 + d1 * 2^42 + d0),   each lane = sign * d_i

* |d0|, |d1| < 2^42; |d2| < 10^38 / 2^84 ~ 5.2e12 — every lane fits
  int64 with ~20 bits of headroom, so per-lane segment sums of up to
  ~2^20 rows cannot overflow before a host carry-normalize.
* signed-digit lanes compare LEXICOGRAPHICALLY in value order (the
  sign lives in every digit), so (d2, d1, d0) is directly a sort /
  min-max / equality key.

Lane columns are named ``{col}#w2|#w1|#w0``; the logical column keeps
its DECIMAL(p, s) type in the table's ``wide_decimals`` map and
reassembles to arrow decimal128 at output.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

BASE_BITS = 42
BASE = 1 << BASE_BITS
MASK = BASE - 1

def lane_names(col: str, scale: int) -> List[str]:
    """Lane columns ``{col}#w{digit}s{scale}`` — the decimal scale rides
    the name so every layer (resolve, aggregation rewrite, arrow
    output) recovers it without side-channel metadata."""
    return [f"{col}#w{d}s{scale}" for d in (2, 1, 0)]


def parse_lane(name: str):
    """(base, digit, scale) for a wide-decimal lane name, else None."""
    i = name.rfind("#w")
    if i < 0:
        return None
    tail = name[i + 2:]
    j = tail.find("s")
    if j < 1:
        return None
    try:
        return name[:i], int(tail[:j]), int(tail[j + 1:])
    except ValueError:
        return None


def split_ints(values: List[int]) -> Tuple[np.ndarray, ...]:
    """Python ints -> three signed-digit int64 arrays (None -> 0)."""
    n = len(values)
    d2 = np.zeros(n, np.int64)
    d1 = np.zeros(n, np.int64)
    d0 = np.zeros(n, np.int64)
    for i, v in enumerate(values):
        if v is None:
            continue
        s = -1 if v < 0 else 1
        a = -v if v < 0 else v
        d0[i] = s * (a & MASK)
        d1[i] = s * ((a >> BASE_BITS) & MASK)
        d2[i] = s * (a >> (2 * BASE_BITS))
    return d2, d1, d0


def combine_ints(d2: np.ndarray, d1: np.ndarray, d0: np.ndarray
                 ) -> List[int]:
    """Signed-digit int64 arrays -> Python ints (exact; digits may be
    un-normalized after summation — plain weighted addition of Python
    ints carries automatically)."""
    return [int(a) * (1 << (2 * BASE_BITS)) + int(b) * BASE + int(c)
            for a, b, c in zip(d2, d1, d0)]
