"""t-digest / qdigest: mergeable quantile sketches as VARBINARY blobs.

Reference: velox/functions/prestosql/aggregates/TDigestAggregate.cpp,
QDigestAggAggregate.cpp and velox/functions/prestosql/TDigestFunctions.h
(value_at_quantile / quantile_at_value / merge). Re-designed TPU-first:
the engine's collect path already delivers every group's values as one
SORTED contiguous run (one global lax.sort — the operation the sketch
exists to avoid on CPUs), so digest *construction* is a vectorized
numpy pass over all groups at once: assign each element its in-group
quantile midpoint, bucket by the t-digest k1 scale function, and
segment-average buckets. No per-value streaming insertion exists
anywhere.

Serialization is this engine's own compact ASCII format (documented
deviation: NOT Presto wire-compatible — digests round-trip within
velox_tpu only):

    TD1|<kind>|<n>|<min>|<max>|m1:w1,m2:w2,...

where kind is 'i' (integral source) or 'f'. qdigest_agg produces the
same centroid structure tagged ``QD1`` (both are consumed by the same
quantile evaluators; qdigest answers are rounded for integral sources,
matching Presto's qdigest(bigint) behavior in value only — the return
type here is DOUBLE).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

DEFAULT_COMPRESSION = 100


def _k1_buckets(q: np.ndarray, compression: int) -> np.ndarray:
    """t-digest k1 scale: bucket index in [0, compression) with finer
    buckets near q=0 and q=1 (the tails quantile sketches must protect)."""
    return np.floor(
        compression * (np.arcsin(2.0 * q - 1.0) / np.pi + 0.5)
    ).astype(np.int64)


def _serialize(tag: str, kind: str, n: float, lo: float, hi: float,
               means: np.ndarray, weights: np.ndarray) -> str:
    cent = ",".join(
        f"{m:.17g}:{w:.17g}" for m, w in zip(means, weights))
    return f"{tag}|{kind}|{n:.17g}|{lo:.17g}|{hi:.17g}|{cent}"


def build_group_digests(
    counts: np.ndarray,
    starts: np.ndarray,
    sorted_vals: np.ndarray,
    kind: str,
    tag: str = "TD1",
    compression: int = DEFAULT_COMPRESSION,
) -> List[Optional[str]]:
    """Per-group digests from group-contiguous VALUE-SORTED runs.

    One vectorized bucketing over the flat element array, then a cheap
    per-group serialization loop (≤ ``compression`` centroids each).
    """
    counts = counts.astype(np.int64)
    starts = starts.astype(np.int64)
    vals = np.asarray(sorted_vals, dtype=np.float64)
    n_slots = counts.shape[0]
    total = int(counts.sum())
    out: List[Optional[str]] = [None] * n_slots
    if total == 0:
        return out
    live = np.nonzero(counts > 0)[0]
    # collect_runs lays live groups' elements contiguously at the
    # prefix-cumsum starts, so the flat element order IS [0, total)
    owner = np.repeat(np.arange(n_slots), counts)[:total]
    v = vals[:total]
    i_in = np.arange(total) - starts[owner]
    q = (i_in + 0.5) / counts[owner]
    b = np.clip(_k1_buckets(q, compression), 0, compression - 1)
    key = owner * compression + b
    size = n_slots * compression
    w = np.bincount(key, minlength=size).astype(np.float64)
    s = np.bincount(key, weights=v, minlength=size)
    for g in live:
        seg = slice(g * compression, (g + 1) * compression)
        wg, sg = w[seg], s[seg]
        nz = np.nonzero(wg)[0]
        means = sg[nz] / wg[nz]
        lo = vals[starts[g]]
        hi = vals[starts[g] + counts[g] - 1]
        out[g] = _serialize(tag, kind, float(counts[g]), lo, hi,
                            means, wg[nz])
    return out


def parse_digest(s: str):
    """-> (kind, n, lo, hi, means, weights); raises on malformed input."""
    tag, kind, n, lo, hi, cent = s.split("|")
    if tag not in ("TD1", "QD1"):
        raise ValueError(f"not a velox_tpu digest: {tag!r}")
    if cent:
        pairs = [c.split(":") for c in cent.split(",")]
        means = np.array([float(p[0]) for p in pairs])
        weights = np.array([float(p[1]) for p in pairs])
    else:
        means = np.zeros(0)
        weights = np.zeros(0)
    return kind, float(n), float(lo), float(hi), means, weights


def merge_digests(blobs: Sequence[str],
                  compression: int = DEFAULT_COMPRESSION) -> Optional[str]:
    """Merge digests: pool centroids, re-bucket by cumulative-weight
    quantile (the standard t-digest merge), re-serialize."""
    parsed = [parse_digest(b) for b in blobs if b is not None]
    if not parsed:
        return None
    tag = "TD1" if blobs[0].startswith("TD1") else "QD1"
    kind = parsed[0][0]
    n = sum(p[1] for p in parsed)
    lo = min(p[2] for p in parsed)
    hi = max(p[3] for p in parsed)
    means = np.concatenate([p[4] for p in parsed])
    weights = np.concatenate([p[5] for p in parsed])
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights)
    q = (cum - weights / 2.0) / n
    b = np.clip(_k1_buckets(q, compression), 0, compression - 1)
    w = np.bincount(b, weights=weights, minlength=compression)
    s = np.bincount(b, weights=means * weights, minlength=compression)
    nz = np.nonzero(w)[0]
    return _serialize(tag, kind, n, lo, hi, s[nz] / w[nz], w[nz])


def value_at_quantile(digest: str, q) -> Optional[float]:
    """Quantile estimate by linear interpolation between centroid
    midpoints (TDigestFunctions.h valueAtQuantile contract), clamped to
    the exact [min, max] the digest records."""
    kind, n, lo, hi, means, weights = parse_digest(digest)
    q = float(q)
    if n <= 0 or len(means) == 0:
        return None
    if q <= 0:
        v = lo
    elif q >= 1:
        v = hi
    else:
        cum = np.cumsum(weights)
        mid = (cum - weights / 2.0) / n
        v = float(np.interp(q, mid, means, left=lo, right=hi))
        v = min(max(v, lo), hi)
    return float(round(v)) if kind == "i" else float(v)


def quantile_at_value(digest: str, v) -> Optional[float]:
    """Inverse of value_at_quantile (rank of a value in [0, 1])."""
    kind, n, lo, hi, means, weights = parse_digest(digest)
    v = float(v)
    if n <= 0 or len(means) == 0:
        return None
    if v <= lo:
        return 0.0
    if v >= hi:
        return 1.0
    cum = np.cumsum(weights)
    mid = (cum - weights / 2.0) / n
    return float(np.interp(v, means, mid, left=0.0, right=1.0))


def scale_tdigest_blob(blob: str, factor: float) -> "Optional[str]":
    """scale_tdigest(tdigest, scale) — multiply every centroid weight
    (velox/functions/prestosql/TDigestFunctions.h scale_tdigest;
    blob format is this engine's ASCII centroid list)."""
    if blob is None:
        return None
    factor = float(factor)
    if factor <= 0:
        raise ValueError("scale factor should be positive")
    kind, n, lo, hi, means, weights = parse_digest(blob)
    tag = blob.split("|", 1)[0]
    return _serialize(tag, kind, n * factor, lo, hi, means,
                      weights * factor)


def trimmed_mean_blob(blob: str, lo_q: float, hi_q: float
                      ) -> "Optional[float]":
    """trimmed_mean(tdigest, lo, hi) — mean of the mass between the
    two quantiles, partial centroids pro-rated
    (velox/functions/prestosql/TDigestFunctions.h)."""
    if blob is None:
        return None
    _kind, n, _lo, _hi, means, weights = parse_digest(blob)
    if n <= 0 or len(means) == 0:
        return None
    lo_w, hi_w = float(lo_q) * n, float(hi_q) * n
    cum = np.cumsum(weights)
    start = cum - weights
    take = np.clip(np.minimum(cum, hi_w) - np.maximum(start, lo_w),
                   0.0, None)
    tw = take.sum()
    if tw <= 0:
        return None
    return float((means * take).sum() / tw)
