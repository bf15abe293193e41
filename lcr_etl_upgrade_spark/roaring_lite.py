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

One generator (``_iter_containers``) is the single implementation all
three public entry points share, so the count, collect and streaming
paths can never diverge structurally:

- ``parse_roaring_bitmap_array`` — full value set (driver-side small
  bitmaps, tests);
- ``count_roaring_bitmap_array`` — exact distinct count in O(one
  container) memory (driver-side integrity check for DVs of ANY size;
  bitset containers count by popcount, never expanding);
- ``iter_roaring_bitmap_array`` — per-container value batches in O(one
  container) memory (executor-side streaming expansion in delta_lite).

Used by ``delta_lite`` (deletionVectors reader feature); cites only the
public specs (delta.io PROTOCOL.md "Deletion Vectors", RoaringFormatSpec,
rfc.zeromq.org/spec/32).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

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


def _iter_containers(
    data: bytes, max_values: int | None, collect: bool
) -> Iterator[tuple[int, set[int] | None]]:
    """THE walker: validate a whole RoaringBitmapArray structurally and
    yield ``(n_distinct, values64 | None)`` per container, values only
    when ``collect`` — so count/collect/stream consumers share one
    implementation and can never disagree on what a blob contains.

    Per the spec: container keys strictly increase within a bitmap
    (violations raise — silent cross-container dedup would let a
    streamed count and a collected set disagree), and a run must stay
    inside its container's 16-bit space (a run crossing 0xFFFF would
    spill values into the NEXT container's keyspace — same divergence,
    raised instead). ``max_values`` bounds the running total of ACTUAL
    distinct content, checked after each container — never the
    descriptive header's cardinality claim, which this walker tolerates
    overstating (duplicate array values, overlapping runs): counting
    the claim would make a blob pass the driver's count-based verify
    yet fail the same-bound expansion at action time. The overshoot is
    capped at one container (≤65,536 values) before the raise.
    Structural errors surface even in count-only mode; the final
    trailing-bytes check runs when the iterator is exhausted."""
    if len(data) < 12:
        raise ValueError(f"deletion-vector bitmap too short ({len(data)} B)")
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(expected {ROARING_ARRAY_MAGIC})"
        )
    if n_bitmaps < 0:
        raise ValueError(f"negative bitmap count {n_bitmaps}")
    pos = 12
    total = 0

    def need(n: int, what: str) -> None:
        if pos + n > len(data):
            raise ValueError(f"truncated roaring bitmap: {what}")

    def bound(what: str) -> None:
        if max_values is not None and total > max_values:
            raise ValueError(
                f"roaring bitmap exceeds the {max_values}-value "
                f"materialization bound ({what})"
            )

    for bm in range(n_bitmaps):
        high = bm << 32
        need(4, "cookie")
        (cookie,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if (cookie & 0xFFFF) == _COOKIE_RUN:
            n_containers = (cookie >> 16) + 1
            run_bits_len = (n_containers + 7) // 8
            need(run_bits_len, "run-flag bitset")
            run_bitset = data[pos : pos + run_bits_len]
            pos += run_bits_len
            has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
        elif cookie == _COOKIE_NO_RUN:
            need(4, "container count")
            (n_containers,) = struct.unpack_from("<I", data, pos)
            pos += 4
            run_bitset = b"\x00" * ((n_containers + 7) // 8)
            has_offsets = True
        else:
            raise ValueError(f"bad roaring cookie {cookie:#x}")
        need(4 * n_containers, "descriptive headers")
        headers = [
            struct.unpack_from("<HH", data, pos + 4 * i)
            for i in range(n_containers)
        ]
        pos += 4 * n_containers
        if has_offsets:
            # offsets enable random access; sequential parse ignores them
            need(4 * n_containers, "offsets")
            pos += 4 * n_containers
        prev_key = -1
        for i, (key, card_minus_1) in enumerate(headers):
            if key <= prev_key:
                raise ValueError(
                    f"roaring container keys not strictly increasing "
                    f"({key} after {prev_key})"
                )
            prev_key = key
            cardinality = card_minus_1 + 1
            base = high | (key << 16)
            values: set[int] | None = set() if collect else None
            if run_bitset[i // 8] & (1 << (i % 8)):
                need(2, "run count")
                (n_runs,) = struct.unpack_from("<H", data, pos)
                pos += 2
                need(4 * n_runs, "runs")
                runs = sorted(
                    struct.unpack_from("<HH", data, pos + 4 * r)
                    for r in range(n_runs)
                )
                pos += 4 * n_runs
                n_distinct = 0
                hi = -1
                for start, length in runs:
                    end = start + length  # inclusive
                    if end > 0xFFFF:
                        raise ValueError(
                            f"roaring run ({start}, len {length}) crosses "
                            "the container's 16-bit boundary"
                        )
                    if start > hi:
                        n_distinct += end - start + 1
                        hi = end
                    elif end > hi:
                        n_distinct += end - hi
                        hi = end
                if values is not None:
                    for start, length in runs:
                        values.update(
                            base + v for v in range(start, start + length + 1)
                        )
            elif cardinality <= 4096:
                need(2 * cardinality, "array container")
                vals = struct.unpack_from(f"<{cardinality}H", data, pos)
                pos += 2 * cardinality
                n_distinct = len(set(vals))
                if values is not None:
                    values.update(base + v for v in set(vals))
            else:
                need(8192, "bitset container")
                n_distinct = 0
                for word_i in range(1024):
                    (word,) = struct.unpack_from("<Q", data, pos + 8 * word_i)
                    n_distinct += word.bit_count()
                    if values is not None:
                        while word:
                            low = word & -word
                            values.add(base + 64 * word_i + low.bit_length() - 1)
                            word ^= low
                pos += 8192
            total += n_distinct
            bound("container content")
            yield n_distinct, values
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after the last bitmap"
        )


def parse_roaring_bitmap_array(
    data: bytes, max_values: int | None = None
) -> set[int]:
    """Delta RoaringBitmapArray serialization -> set of 64-bit values.

    Layout: i32 LE magic 1681511377, i64 LE bitmap count, then that many
    portable 32-bit bitmaps; bitmap i contributes ``(i << 32) | v32``.
    ``max_values`` bounds materialization during the parse (ValueError
    on breach, before memory is spent)."""
    out: set[int] = set()
    for _, values in _iter_containers(data, max_values, collect=True):
        out.update(values)  # type: ignore[arg-type]
    return out


def count_roaring_bitmap_array(data: bytes) -> int:
    """Exact distinct-value count of a Delta RoaringBitmapArray WITHOUT
    materializing the values — same structural validation and the same
    result as ``len(parse_roaring_bitmap_array(data))`` (shared walker),
    in O(one container) memory: array containers dedup at most 4096
    values, bitsets count by popcount, runs merge as intervals. This is
    the driver-side cardinality-verification path for deletion vectors
    of arbitrary size."""
    return sum(n for n, _ in _iter_containers(data, None, collect=False))


def iter_roaring_bitmap_array(
    data: bytes, max_values: int | None = None
) -> Iterator[set[int]]:
    """Stream the values of a Delta RoaringBitmapArray as per-container
    sets (each ≤ 65,536 values) in O(one container) memory — the
    executor-side expansion path in delta_lite, which re-batches these
    into bounded Arrow chunks so a single multi-hundred-million-row DV
    never materializes whole in any one process. Same validation, same
    values as :func:`parse_roaring_bitmap_array` by construction."""
    for _, values in _iter_containers(data, max_values, collect=True):
        yield values  # type: ignore[misc]


def serialize_roaring_bitmap_array(values) -> bytes:
    """Set/iterable of 64-bit row indexes -> Delta RoaringBitmapArray
    bytes, the WRITE direction of :func:`parse_roaring_bitmap_array`
    (delete_rows in delta_lite). Emits the
    SERIAL_COOKIE_NO_RUNCONTAINER layout — always-valid per the
    RoaringFormatSpec (run containers are an optional optimization) and
    exactly what the spec-anchored walker above validates: array
    containers up to 4096 values, bitset containers beyond, offset
    headers always present under the no-run cookie. Bitmap i holds the
    low 32 bits of values whose high 32 bits equal i; empty
    intermediate bitmaps are emitted so the index-is-high-part
    invariant holds. Round-trip identity with the parser is pinned by
    test for every container kind and boundary."""
    vals = sorted(set(int(v) for v in values))
    if vals and (vals[0] < 0 or vals[-1] >= (1 << 64)):
        raise ValueError("row indexes must be unsigned 64-bit")
    n_bitmaps = (vals[-1] >> 32) + 1 if vals else 0
    # the array indexes bitmaps by high word, emitting EMPTY bitmaps for
    # gaps — so one huge value drives the loop (2^63 -> 2^31 iterations,
    # ~17 GiB of empties). Row indexes are per-FILE positions; 2^44
    # (4096 bitmaps, <=32 KiB of empties) is absurdly beyond any real
    # file, so refuse rather than hang.
    if n_bitmaps > 4096:
        raise ValueError(
            f"max row index {vals[-1]} needs {n_bitmaps} bitmaps "
            "(> 4096); refusing to serialize a pathological sparse range"
        )
    out = bytearray(struct.pack("<iq", ROARING_ARRAY_MAGIC, n_bitmaps))
    from itertools import groupby

    by_high: dict[int, list[int]] = {
        h: [v & 0xFFFFFFFF for v in grp]
        for h, grp in groupby(vals, key=lambda v: v >> 32)
    }
    for bm in range(n_bitmaps):
        v32 = by_high.get(bm, [])
        containers: list[tuple[int, list[int]]] = [
            (k, [v & 0xFFFF for v in grp])
            for k, grp in groupby(v32, key=lambda v: v >> 16)
        ]
        out += struct.pack("<II", _COOKIE_NO_RUN, len(containers))
        for key, lows in containers:  # descriptive headers
            out += struct.pack("<HH", key, len(lows) - 1)
        # offsets: byte position of each container's data from the
        # START of this bitmap's serialization (cookie byte 0)
        header_end = 8 + 4 * len(containers) + 4 * len(containers)
        running = header_end
        sizes = [
            2 * len(lows) if len(lows) <= 4096 else 8192
            for _, lows in containers
        ]
        for size in sizes:
            out += struct.pack("<I", running)
            running += size
        for (_key, lows), size in zip(containers, sizes):
            if len(lows) <= 4096:
                out += struct.pack(f"<{len(lows)}H", *lows)
            else:
                words = [0] * 1024
                for v in lows:
                    words[v >> 6] |= 1 << (v & 63)
                out += struct.pack("<1024Q", *words)
    return bytes(out)
