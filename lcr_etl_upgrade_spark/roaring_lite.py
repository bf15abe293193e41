"""Pure-Python readers for the two PUBLIC formats Delta deletion
vectors are built from — no roaring/bitmap package dependency:

- **Z85** (ZeroMQ spec 32/Z85): the ASCII armor Delta uses for inline
  deletion vectors and for the UUID part of on-disk DV file names.
- **RoaringBitmapArray** (Delta's 64-bit extension of the public
  RoaringFormatSpec "portable" serialization): a little-endian magic
  ``1681511377``, an i64 count of 32-bit bitmaps, then that many
  standard portable 32-bit roaring bitmaps back-to-back; the i-th
  bitmap holds the low 32 bits of values whose high 32 bits equal i.

Both are parsed defensively: any structural violation raises
``ValueError`` with the offending detail — a deletion vector read must
never silently drop or invent deleted rows.

Used by ``delta_lite`` (deletionVectors reader feature); cites only the
public specs (delta.io PROTOCOL.md "Deletion Vectors", RoaringFormatSpec,
rfc.zeromq.org/spec/32).
"""

from __future__ import annotations

import struct

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

ROARING_ARRAY_MAGIC = 1681511377  # delta's RoaringBitmapArray magic
_COOKIE_RUN = 12347  # SERIAL_COOKIE (run containers possible)
_COOKIE_NO_RUN = 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
_NO_OFFSET_THRESHOLD = 4


def z85_decode(text: str) -> bytes:
    """Z85 (ZeroMQ spec 32) decode: 5 ASCII chars -> 4 bytes, big-endian
    base-85."""
    if len(text) % 5 != 0:
        raise ValueError(f"z85 length {len(text)} is not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid z85 character {ch!r}") from None
        if acc > 0xFFFFFFFF:
            raise ValueError(f"z85 group {text[i:i+5]!r} overflows 32 bits")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """Inverse of :func:`z85_decode` (used only by tests/fixtures)."""
    if len(data) % 4 != 0:
        raise ValueError(f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        group = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            group.append(_Z85_CHARS[rem])
        out.extend(reversed(group))
    return "".join(out)


def _walk_roaring32(
    buf: bytes,
    pos: int,
    max_values: int | None = None,
    out: set[int] | None = None,
) -> tuple[int, int]:
    """Walk ONE portable 32-bit roaring bitmap at ``pos``; returns
    (distinct_value_count, next_pos), collecting the values into ``out``
    when given. Format per the public RoaringFormatSpec.

    With ``out=None`` this is a COUNT-ONLY pass: memory stays O(one
    container) — array containers dedup at most 4096 values, bitsets
    popcount, runs merge as intervals — so a multi-million-row deletion
    vector can be integrity-verified without materializing positions.
    Both modes perform the same structural validation and, on valid
    input, report the same count (container keys are required strictly
    increasing, as the spec orders them, so no cross-container dedup can
    make the collected set smaller than the streamed count).

    ``max_values`` bounds materialization DURING the walk (checked per
    container) so an adversarial bitmap cannot exhaust memory before a
    post-hoc check could run."""

    def need(n: int, what: str) -> None:
        if pos + n > len(buf):
            raise ValueError(f"truncated roaring bitmap: {what}")

    need(4, "cookie")
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n_containers = (cookie >> 16) + 1
        run_bits_len = (n_containers + 7) // 8
        need(run_bits_len, "run-flag bitset")
        run_bitset = buf[pos : pos + run_bits_len]
        pos += run_bits_len
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        need(4, "container count")
        (n_containers,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        run_bitset = b"\x00" * ((n_containers + 7) // 8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie:#x}")
    need(4 * n_containers, "descriptive headers")
    headers = [
        struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n_containers)
    ]
    pos += 4 * n_containers
    if has_offsets:
        # offsets enable random access; sequential parse ignores them
        need(4 * n_containers, "offsets")
        pos += 4 * n_containers
    total = 0
    prev_key = -1
    for i, (key, card_minus_1) in enumerate(headers):
        if key <= prev_key:
            # the spec stores containers sorted by key; accepting a
            # repeat would let the collected-set and streamed counts
            # disagree (silent dedup)
            raise ValueError(
                f"roaring container keys not strictly increasing "
                f"({key} after {prev_key})"
            )
        prev_key = key
        cardinality = card_minus_1 + 1
        if max_values is not None and total + cardinality > max_values:
            raise ValueError(
                f"roaring bitmap exceeds the {max_values}-value "
                "materialization bound"
            )
        base = key << 16
        if run_bitset[i // 8] & (1 << (i % 8)):
            need(2, "run count")
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            need(4 * n_runs, "runs")
            # merge as intervals: overlapping/unsorted runs in corrupt
            # input still count exactly what the collect pass would keep
            runs = sorted(
                struct.unpack_from("<HH", buf, pos + 4 * r)
                for r in range(n_runs)
            )
            n_distinct = 0
            hi = -1
            for start, length in runs:
                end = start + length  # inclusive
                if start > hi:
                    n_distinct += end - start + 1
                    hi = end
                elif end > hi:
                    n_distinct += end - hi
                    hi = end
            total += n_distinct
            if out is not None:
                for start, length in runs:
                    out.update(
                        base + v for v in range(start, start + length + 1)
                    )
            pos += 4 * n_runs
        elif cardinality <= 4096:
            need(2 * cardinality, "array container")
            vals = struct.unpack_from(f"<{cardinality}H", buf, pos)
            distinct = set(vals)
            total += len(distinct)
            if out is not None:
                out.update(base + v for v in distinct)
            pos += 2 * cardinality
        else:
            need(8192, "bitset container")
            for word_i in range(1024):
                (word,) = struct.unpack_from("<Q", buf, pos + 8 * word_i)
                total += word.bit_count()
                if out is not None:
                    while word:
                        low = word & -word
                        out.add(base + 64 * word_i + low.bit_length() - 1)
                        word ^= low
            pos += 8192
        # re-check against ACTUAL content: a run/bitset container whose
        # descriptive-header cardinality lies low would otherwise slip
        # past the pre-expansion bound
        if max_values is not None and total > max_values:
            raise ValueError(
                f"roaring bitmap exceeds the {max_values}-value "
                "materialization bound"
            )
    return total, pos


def parse_roaring_bitmap_array(
    data: bytes, max_values: int | None = None
) -> set[int]:
    """Delta RoaringBitmapArray serialization -> set of 64-bit values.

    Layout: i32 LE magic 1681511377, i64 LE bitmap count, then that many
    portable 32-bit bitmaps; bitmap i contributes ``(i << 32) | v32``.
    ``max_values`` bounds materialization during the parse (ValueError
    on breach, before memory is spent)."""
    if len(data) < 12:
        raise ValueError(f"deletion-vector bitmap too short ({len(data)} B)")
    magic, count = struct.unpack_from("<iq", data, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(expected {ROARING_ARRAY_MAGIC})"
        )
    if count < 0:
        raise ValueError(f"negative bitmap count {count}")
    pos = 12
    out: set[int] = set()
    for i in range(count):
        budget = None if max_values is None else max_values - len(out)
        values: set[int] = set()
        _, pos = _walk_roaring32(data, pos, budget, values)
        out.update((i << 32) | v for v in values)
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after the last bitmap"
        )
    return out


def count_roaring_bitmap_array(data: bytes) -> int:
    """Exact distinct-value count of a Delta RoaringBitmapArray WITHOUT
    materializing the values — same structural validation and the same
    result as ``len(parse_roaring_bitmap_array(data))``, in O(one
    container) memory. This is the driver-side cardinality-verification
    path for deletion vectors of arbitrary size (the position expansion
    itself happens executor-side in delta_lite)."""
    if len(data) < 12:
        raise ValueError(f"deletion-vector bitmap too short ({len(data)} B)")
    magic, count = struct.unpack_from("<iq", data, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(expected {ROARING_ARRAY_MAGIC})"
        )
    if count < 0:
        raise ValueError(f"negative bitmap count {count}")
    pos = 12
    total = 0
    for _ in range(count):
        n, pos = _walk_roaring32(data, pos, None, None)
        total += n
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after the last bitmap"
        )
    return total
