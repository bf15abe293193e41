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


def _parse_roaring32(
    buf: bytes, pos: int, max_values: int | None = None
) -> tuple[set[int], int]:
    """Parse ONE portable 32-bit roaring bitmap at ``pos``; returns
    (values, next_pos). Format per the public RoaringFormatSpec.
    ``max_values`` bounds materialization DURING the parse (checked per
    container) so an adversarial bitmap cannot exhaust driver memory
    before a post-hoc check could run."""

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
    values: set[int] = set()
    for i, (key, card_minus_1) in enumerate(headers):
        cardinality = card_minus_1 + 1
        if max_values is not None and len(values) + cardinality > max_values:
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
            for r in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos + 4 * r)
                values.update(base + v for v in range(start, start + length + 1))
            pos += 4 * n_runs
        elif cardinality <= 4096:
            need(2 * cardinality, "array container")
            values.update(
                base + v
                for v in struct.unpack_from(f"<{cardinality}H", buf, pos)
            )
            pos += 2 * cardinality
        else:
            need(8192, "bitset container")
            for word_i in range(1024):
                (word,) = struct.unpack_from("<Q", buf, pos + 8 * word_i)
                while word:
                    low = word & -word
                    values.add(base + 64 * word_i + low.bit_length() - 1)
                    word ^= low
            pos += 8192
    return values, pos


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
        values, pos = _parse_roaring32(data, pos, budget)
        out.update((i << 32) | v for v in values)
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after the last bitmap"
        )
    return out
