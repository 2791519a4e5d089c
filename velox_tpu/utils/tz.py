"""IANA timezone offset tables for device-side timestamp adjustment.

The reference carries a full tz database (velox/type/tz/,
TimeZoneMap.h) and adjusts timestamps per session zone
(velox/core/QueryConfig.h:103 adjust_timestamp_to_session_timezone).
The TPU design turns a zone into two device arrays — transition
instants and UTC offsets — so "interpret this instant in zone Z"
compiles to one searchsorted + gather. Tables parse directly from the
system TZif files (/usr/share/zoneinfo, RFC 8536 v1/v2/v3), ~40 lines
and no third-party dependency.
"""

from __future__ import annotations

import os
import struct
from functools import lru_cache
from typing import Tuple

import numpy as np

_ZONEINFO = os.environ.get("VELOX_TPU_ZONEINFO", "/usr/share/zoneinfo")

#: sentinel well before any real transition
_NEG_INF = -(1 << 62)


def _parse_tzif(data: bytes) -> Tuple[np.ndarray, np.ndarray]:
    """(transition times s, utc offsets s) from a TZif blob."""
    def read_header(off):
        magic, ver = data[off:off + 4], data[off + 4:off + 5]
        assert magic == b"TZif", "not a TZif file"
        (isutcnt, isstdcnt, leapcnt, timecnt, typecnt,
         charcnt) = struct.unpack(">6I", data[off + 20:off + 44])
        return ver, isutcnt, isstdcnt, leapcnt, timecnt, typecnt, charcnt

    ver, isut, isstd, leap, timecnt, typecnt, charcnt = read_header(0)
    if ver in (b"2", b"3"):
        # skip the v1 block, parse the 64-bit v2 block
        v1len = 44 + timecnt * 5 + typecnt * 6 + charcnt \
            + leap * 8 + isstd + isut
        off = v1len
        (ver, isut, isstd, leap, timecnt, typecnt,
         charcnt) = read_header(off)
        off += 44
        tsize, tfmt = 8, ">q"
    else:
        off = 44
        tsize, tfmt = 4, ">i"

    times = np.frombuffer(
        data[off: off + timecnt * tsize],
        dtype=(">i8" if tsize == 8 else ">i4"),
        count=timecnt).astype(np.int64)
    off += timecnt * tsize
    idx = np.frombuffer(data[off: off + timecnt], dtype=np.uint8,
                        count=timecnt)
    off += timecnt
    ttinfo = []
    for i in range(typecnt):
        utoff, isdst, abbrind = struct.unpack(
            ">iBB", data[off + 6 * i: off + 6 * i + 6])
        ttinfo.append(utoff)
    offsets = np.asarray(ttinfo, dtype=np.int64)

    # first ttinfo applies before the first transition (RFC 8536 §3.2)
    first = offsets[0] if typecnt else 0
    trans = np.concatenate([[_NEG_INF], times])
    offs = np.concatenate(
        [[first], offsets[idx] if timecnt else []]).astype(np.int64)
    return trans, offs


@lru_cache(maxsize=64)
def zone_tables_us(zone: str) -> Tuple[np.ndarray, np.ndarray]:
    """(transition instants µs, utc offsets µs) for an IANA zone name.
    'UTC' and fixed offsets ('+05:30', '-08:00') need no file."""
    z = zone.strip()
    if z.upper() in ("UTC", "GMT", "Z") or z == "":
        return (np.asarray([_NEG_INF], np.int64),
                np.asarray([0], np.int64))
    if z and z[0] in "+-":
        sign = -1 if z[0] == "-" else 1
        hh, _, mm = z[1:].partition(":")
        off = sign * (int(hh) * 3600 + int(mm or 0)) * 1_000_000
        return (np.asarray([_NEG_INF], np.int64),
                np.asarray([off], np.int64))
    path = os.path.join(_ZONEINFO, z)
    if not os.path.realpath(path).startswith(
            os.path.realpath(_ZONEINFO)):
        raise ValueError(f"invalid timezone name {zone!r}")
    with open(path, "rb") as f:
        trans, offs = _parse_tzif(f.read())
    return (np.where(trans == _NEG_INF, trans,
                     trans * 1_000_000).astype(np.int64),
            (offs * 1_000_000).astype(np.int64))
