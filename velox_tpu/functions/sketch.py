"""Set-membership sketches: HyperLogLog, SetDigest, KHyperLogLog.

Reference: velox/functions/prestosql/aggregates/HyperLogLogAggregate.cpp
(approx_set / merge), SetDigestFunctions (make_set_digest,
merge_set_digest, intersection_cardinality, jaccard_index, hash_counts)
and KHyperLogLogFunctions (khyperloglog_agg, merge_khll,
uniqueness_distribution, reidentification_potential). Re-designed for
this engine: sketch *construction* happens once per group over the
group-contiguous value runs the collect path already produces (one
global sort — no per-row streaming insertion), and sketch *values* are
compact ASCII blobs living in a string Dictionary, exactly like the
t-digest family (functions/digest.py).

Blob formats (documented deviation: NOT Presto wire-compatible —
sketches round-trip within velox_tpu only):

    HL1|<log2m>|<b64 uint8 registers>                 HyperLogLog
    SD1|<log2m>|<b64 regs>|<b64 minhash u64 BE> (K min hashes + counts)
    KH1|<K>|<UCAP>|<b64 records>                      KHyperLogLog

KHyperLogLog records are ``xhash(u64 BE) | n(u8) | n * uiihash(u64 BE)``
— the K minimum x-hashes, each carrying up to UCAP minimum uii-hashes
(a per-bucket KMV sketch standing in for Presto's per-bucket HLL; exact
while a bucket holds <= UCAP distinct uii values, which covers the
uniqueness-distribution histogram range exactly).
"""

from __future__ import annotations

import base64
import hashlib
import struct
from typing import Dict, List, Optional, Sequence

import numpy as np

HLL_LOG2M = 11                    # 2048 registers, stderr ~2.3%
SD_K = 2048                       # SetDigest min-hash capacity
KHLL_K = 512                      # KHyperLogLog bucket capacity
KHLL_UCAP = 32                    # per-bucket uii KMV capacity
_TWO64 = float(1 << 64)


def hash64(v) -> int:
    """Stable unsigned 64-bit hash of a scalar value (strings hash
    their text; integral floats hash as ints so 3 == 3.0 across
    columns, matching one hash domain per value like Presto's
    XxHash64 over the canonical encoding)."""
    if isinstance(v, (np.floating, float)):
        f = float(v)
        v = int(f) if f.is_integer() else f
    elif isinstance(v, (np.integer, int, np.bool_, bool)):
        v = int(v)
    b = repr(v).encode() if not isinstance(v, str) else v.encode()
    return struct.unpack("<Q", hashlib.blake2b(b, digest_size=8)
                         .digest())[0]


def hash64_array(vals: np.ndarray) -> np.ndarray:
    return np.fromiter((hash64(v) for v in vals.tolist()),
                       np.uint64, len(vals))


# ------------------------------------------------------------------ HLL

def _hll_regs_from_hashes(h: np.ndarray, log2m: int) -> np.ndarray:
    m = 1 << log2m
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    rest = (h >> np.uint64(log2m)).astype(np.uint64)
    # rank = number of leading-ish zeros + 1 over the remaining bits
    width = 64 - log2m
    bl = np.zeros(len(h), np.int64)
    nz = rest != 0
    bl[nz] = np.frexp(rest[nz].astype(np.float64))[1]  # bit_length
    rank = np.where(nz, width - bl + 1, width + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_build(vals: np.ndarray) -> str:
    regs = _hll_regs_from_hashes(hash64_array(vals), HLL_LOG2M)
    return "HL1|%d|%s" % (
        HLL_LOG2M, base64.b64encode(regs.tobytes()).decode())


def _hll_parse(blob: str) -> np.ndarray:
    _, log2m, b = blob.split("|")
    return np.frombuffer(base64.b64decode(b), np.uint8).copy()


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(
        np.ldexp(1.0, -regs.astype(np.int64)))
    zeros = int(np.sum(regs == 0))
    if zeros and est <= 2.5 * m:
        est = m * np.log(m / zeros)
    return float(est)


def hll_merge(blobs: Sequence[str]) -> str:
    regs = _hll_parse(blobs[0])
    for b in blobs[1:]:
        np.maximum(regs, _hll_parse(b), out=regs)
    return "HL1|%d|%s" % (
        HLL_LOG2M, base64.b64encode(regs.tobytes()).decode())


# ------------------------------------------------------------ SetDigest

def _pack_u64(a: np.ndarray) -> str:
    return base64.b64encode(
        a.astype(">u8").tobytes()).decode()


def _unpack_u64(s: str) -> np.ndarray:
    return np.frombuffer(base64.b64decode(s), ">u8").astype(np.uint64)


def setdigest_build(vals: np.ndarray) -> str:
    h = np.unique(hash64_array(vals))
    regs = _hll_regs_from_hashes(h, HLL_LOG2M)
    mins = np.sort(h)[:SD_K]
    return "SD1|%d|%s|%s" % (
        HLL_LOG2M, base64.b64encode(regs.tobytes()).decode(),
        _pack_u64(mins))


def _sd_parse(blob: str):
    _, log2m, regs_b, mins_b = blob.split("|")
    return (np.frombuffer(base64.b64decode(regs_b), np.uint8).copy(),
            _unpack_u64(mins_b))


def setdigest_merge(blobs: Sequence[str]) -> str:
    regs, mins = _sd_parse(blobs[0])
    for b in blobs[1:]:
        r2, m2 = _sd_parse(b)
        np.maximum(regs, r2, out=regs)
        mins = np.unique(np.concatenate([mins, m2]))[:SD_K]
    return "SD1|%d|%s|%s" % (
        HLL_LOG2M, base64.b64encode(regs.tobytes()).decode(),
        _pack_u64(mins))


def sketch_cardinality(blob: str) -> Optional[int]:
    """cardinality() over any sketch blob (HLL / SetDigest / KHLL)."""
    if blob is None:
        return None
    if blob.startswith("HL1|"):
        return int(round(_hll_estimate(_hll_parse(blob))))
    if blob.startswith("SD1|"):
        regs, mins = _sd_parse(blob)
        if len(mins) < SD_K:        # exact below capacity
            return int(len(mins))
        return int(round(_hll_estimate(regs)))
    if blob.startswith("KH1|"):
        recs = _khll_parse(blob)
        if len(recs) < KHLL_K:
            return len(recs)
        mx = max(recs) if recs else 0
        return int(round((KHLL_K - 1) * _TWO64 / max(mx, 1)))
    return None


def _minhash_jaccard(a: np.ndarray, b: np.ndarray, k: int) -> float:
    """Jaccard estimate from two bottom-k min-hash sets: the overlap
    fraction within the bottom-k of the union (standard KMV/bottom-k
    estimator, also what Presto's SetDigest does)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    u = np.unique(np.concatenate([a, b]))[:k]
    inter = np.intersect1d(a, b, assume_unique=True)
    return float(len(np.intersect1d(u, inter, assume_unique=True))
                 / max(len(u), 1))


def intersection_cardinality(a: str, b: str) -> Optional[int]:
    """|A ∩ B| = jaccard * |A ∪ B| (SetDigest or KHLL blobs)."""
    if a is None or b is None:
        return None
    if a.startswith("SD1|") and b.startswith("SD1|"):
        ra, ma = _sd_parse(a)
        rb, mb = _sd_parse(b)
        j = _minhash_jaccard(ma, mb, SD_K)
        union = sketch_cardinality(setdigest_merge([a, b]))
    elif a.startswith("KH1|") and b.startswith("KH1|"):
        ma = np.array(sorted(_khll_parse(a)), np.uint64)
        mb = np.array(sorted(_khll_parse(b)), np.uint64)
        j = _minhash_jaccard(ma, mb, KHLL_K)
        union = sketch_cardinality(khll_merge([a, b]))
    else:
        return None
    return int(round(j * union))


def jaccard_index(a: str, b: str) -> Optional[float]:
    if a is None or b is None:
        return None
    if a.startswith("SD1|") and b.startswith("SD1|"):
        _, ma = _sd_parse(a)
        _, mb = _sd_parse(b)
        return _minhash_jaccard(ma, mb, SD_K)
    if a.startswith("KH1|") and b.startswith("KH1|"):
        ma = np.array(sorted(_khll_parse(a)), np.uint64)
        mb = np.array(sorted(_khll_parse(b)), np.uint64)
        return _minhash_jaccard(ma, mb, KHLL_K)
    return None


def hash_counts(blob: str) -> Optional[str]:
    """SetDigest min-hash -> count map as JSON text (deviation: Presto
    returns map<bigint, smallint>; counts here are 1 per distinct value
    since construction dedupes — the Presto semantics for digests built
    via make_set_digest over distinct-counted inputs)."""
    if blob is None or not blob.startswith("SD1|"):
        return None
    import json

    _, mins = _sd_parse(blob)
    return json.dumps(
        {str(np.int64(h.astype(np.uint64))): 1 for h in mins})


# --------------------------------------------------------- KHyperLogLog

def khll_build(xh: np.ndarray, uh: np.ndarray) -> str:
    """Build from parallel (x-hash, uii-hash) arrays: keep the KHLL_K
    minimum x-hashes, each with its KHLL_UCAP minimum uii-hashes."""
    order = np.lexsort((uh, xh))
    xs, us = xh[order], uh[order]
    recs: Dict[int, np.ndarray] = {}
    starts = np.searchsorted(xs, np.unique(xs))
    uniq = xs[starts]
    for i, x in enumerate(uniq[:]):
        if len(recs) >= KHLL_K and int(x) > max(recs):
            continue
        end = starts[i + 1] if i + 1 < len(starts) else len(xs)
        recs[int(x)] = np.unique(us[starts[i]:end])[:KHLL_UCAP]
        if len(recs) > KHLL_K:
            del recs[max(recs)]
    return _khll_serialize(recs)


def _khll_serialize(recs: Dict[int, np.ndarray]) -> str:
    out = bytearray()
    for x in sorted(recs):
        u = recs[x]
        out += struct.pack(">QB", x, len(u))
        out += u.astype(">u8").tobytes()
    return "KH1|%d|%d|%s" % (
        KHLL_K, KHLL_UCAP, base64.b64encode(bytes(out)).decode())


def _khll_parse(blob: str) -> Dict[int, np.ndarray]:
    _, k, ucap, b = blob.split("|")
    raw = base64.b64decode(b)
    recs: Dict[int, np.ndarray] = {}
    i = 0
    while i < len(raw):
        x, n = struct.unpack_from(">QB", raw, i)
        i += 9
        recs[x] = np.frombuffer(raw, ">u8", n, i).astype(np.uint64)
        i += 8 * n
    return recs


def khll_merge(blobs: Sequence[str]) -> str:
    recs = _khll_parse(blobs[0])
    for b in blobs[1:]:
        for x, u in _khll_parse(b).items():
            if x in recs:
                recs[x] = np.unique(
                    np.concatenate([recs[x], u]))[:KHLL_UCAP]
            else:
                recs[x] = u
    for x in sorted(recs)[KHLL_K:]:
        del recs[x]
    return _khll_serialize(recs)


def _bucket_uniqueness(u: np.ndarray) -> int:
    """Distinct-uii estimate for one bucket's KMV sample."""
    if len(u) < KHLL_UCAP:
        return len(u)
    return int(round((KHLL_UCAP - 1) * _TWO64 / max(int(u[-1]), 1)))


def uniqueness_distribution(blob: str, hist: int = 256) -> Optional[str]:
    """histogram of per-value uniqueness as JSON {uniqueness: value_count}
    (deviation: Presto returns map<bigint, double>)."""
    if blob is None or not blob.startswith("KH1|"):
        return None
    import json

    recs = _khll_parse(blob)
    out: Dict[int, int] = {}
    for u in recs.values():
        q = min(_bucket_uniqueness(u), int(hist))
        out[q] = out.get(q, 0) + 1
    return json.dumps({str(k): out[k] for k in sorted(out)})


def reidentification_potential(blob: str, threshold: int
                               ) -> Optional[float]:
    """Fraction of sampled values whose uii uniqueness <= threshold."""
    if blob is None or not blob.startswith("KH1|"):
        return None
    recs = _khll_parse(blob)
    if not recs:
        return None
    low = sum(1 for u in recs.values()
              if _bucket_uniqueness(u) <= int(threshold))
    return low / len(recs)


# ----------------------------------------------------- merge dispatch

def merge_blobs(blobs: Sequence[str]) -> Optional[str]:
    """merge() aggregate over any sketch-blob family (also TD1/QD1
    t-digests, delegated to functions/digest.py)."""
    blobs = [b for b in blobs if b is not None]
    if not blobs:
        return None
    tag = blobs[0][:4]
    if tag in ("TD1|", "QD1|"):
        from velox_tpu.functions.digest import merge_digests

        return merge_digests(blobs)
    if tag == "HL1|":
        return hll_merge(blobs)
    if tag == "SD1|":
        return setdigest_merge(blobs)
    if tag == "KH1|":
        return khll_merge(blobs)
    raise ValueError(f"unknown sketch blob tag {tag!r}")
