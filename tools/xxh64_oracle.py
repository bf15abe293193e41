"""Independent pure-Python XXH64 for the similarity fuzzer's oracle side.

Restates the PUBLIC xxHash64 algorithm (Yann Collet's spec,
https://github.com/Cyan4973/xxHash — canonical little-endian reads) in
the three input shapes Spark's ``xxhash64`` expression consumes, plus
Spark's documented multi-column chaining rule (start at seed 42, each
non-null child's hash becomes the seed for the next). Used as the
independent oracle for minhash/simhash restatements in
tools/similarity_fuzz.py — written from the spec, then verified against
the engine by the differential itself.

NOTE Spark semantics being restated (all public, from the SQL function
docs + the xxHash spec):
- a string column hashes its UTF-8 bytes (full streaming XXH64);
- a long column hashes as the 8-byte "one round" shortcut
  (seed + P5 + 8, one mergeable lane);
- an int column hashes as the 4-byte shortcut (values are NOT widened
  to long);
- NULL children leave the running seed unchanged.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    x &= _M
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h &= _M
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long (Spark's hashLong)."""
    seed &= _M
    value &= _M
    h = (seed + P5 + 8) & _M
    k1 = (_rotl((value * P2) & _M, 31) * P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte little-endian int (Spark's hashInt)."""
    seed &= _M
    h = (seed + P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Streaming XXH64 over a byte string (Spark's hashUnsafeBytes for
    string columns: the UTF-8 bytes)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed
        v4 = (seed - P1) & _M
        while i + 32 <= n:
            for off, acc in ((0, 1), (8, 2), (16, 3), (24, 4)):
                w = int.from_bytes(data[i + off:i + off + 8], "little")
                if acc == 1:
                    v1 = (_rotl((v1 + w * P2) & _M, 31) * P1) & _M
                elif acc == 2:
                    v2 = (_rotl((v2 + w * P2) & _M, 31) * P1) & _M
                elif acc == 3:
                    v3 = (_rotl((v3 + w * P2) & _M, 31) * P1) & _M
                else:
                    v4 = (_rotl((v4 + w * P2) & _M, 31) * P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & _M, 31) * P1) & _M
            h = (h * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        w = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((w * P2) & _M, 31) * P1) & _M
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i + 4 <= n:
        w = int.from_bytes(data[i:i + 4], "little")
        h ^= (w * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    u &= _M
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*values) -> int:
    """Spark's ``xxhash64(c1, c2, ...)``: running seed starts at 42,
    each non-null child re-seeds. Values: str hashes UTF-8 bytes;
    ('int', v) hashes as a 4-byte int; plain Python int hashes as an
    8-byte long; None is skipped. Returns the SIGNED 64-bit value Spark
    surfaces (bigint)."""
    h = 42
    for v in values:
        if v is None:
            continue
        if isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, tuple) and v[0] == "int":
            h = xxh64_int(v[1], h)
        else:
            h = xxh64_long(v, h)
    return _signed(h)
