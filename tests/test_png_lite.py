"""png_lite: PNG decode against hand-composed spec goldens (W3C PNG
chunk grammar + filter definitions) and an independent test-side
encoder — the five filters are exactly invertible, so random images
through random per-row filter choices must decode to the original
pixels, bit for bit."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from lcr_etl_upgrade_spark.png_lite import decode_png

# ---- independent test-side composer ---------------------------------------

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_rows(arr: np.ndarray, bpp: int, filters) -> bytes:
    """Apply the spec's FORWARD filters row by row (the encoder side,
    re-derived independently): arr is (h, stride) uint8."""
    h, stride = arr.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        cur = arr[y].astype(np.int64)
        f = filters[y % len(filters)]
        out.append(f)
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - a
            elif f == 2:
                v = cur[x] - b
            elif f == 3:
                v = cur[x] - ((a + b) >> 1)
            else:
                v = cur[x] - _paeth(a, b, c)
            out.append(int(v) & 0xFF)
        prev = cur
    return bytes(out)


def _encode_png(
    pixels: np.ndarray,
    color: int,
    depth: int = 8,
    filters=(0,),
    interlace: int = 0,
    plte: bytes = b"",
) -> bytes:
    """pixels: (h, w, channels) uint8 samples (palette indices for
    color type 3; 16-bit depth takes each sample as the HIGH byte with
    a zero low byte)."""
    h, w, channels = pixels.shape
    bpp = max(1, channels * depth // 8)

    def rows_of(img: np.ndarray) -> np.ndarray:
        ph, pw = img.shape[:2]
        if depth == 8:
            return img.reshape(ph, pw * channels)
        if depth == 16:
            wide = np.zeros((ph, pw, channels, 2), dtype=np.uint8)
            wide[..., 0] = img
            return wide.reshape(ph, pw * channels * 2)
        # sub-byte: pack MSB-first
        bits = np.unpackbits(img.reshape(ph, -1), axis=1)
        keep = bits.reshape(ph, -1, 8)[:, :, 8 - depth :].reshape(ph, -1)
        pad = (-keep.shape[1]) % 8
        keep = np.pad(keep, ((0, 0), (0, pad)))
        return np.packbits(keep, axis=1)

    if interlace == 0:
        raster = _filter_rows(rows_of(pixels), bpp, filters)
    else:
        raster = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raster += _filter_rows(rows_of(sub), bpp, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    comp = zlib.compress(raster)
    # split IDAT to exercise concatenation
    mid = len(comp) // 2
    out += _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    return out + _chunk(b"IEND", b"")


def _got(payload: bytes) -> tuple[dict, np.ndarray]:
    out = decode_png(payload)
    arr = np.frombuffer(out["pixels"], np.uint8).reshape(
        out["height"], out["width"], out["components"]
    )
    return out, arr


# ---- goldens ---------------------------------------------------------------


def test_rgb_all_filters_roundtrip_exact():
    """Random RGB images through every filter (and mixed per-row
    choices) decode to the original pixels exactly — the filters are
    invertible by construction."""
    rng = np.random.default_rng(3)
    for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
        px = rng.integers(0, 256, size=(13, 17, 3)).astype(np.uint8)
        out, arr = _got(_encode_png(px, color=2, filters=filters))
        assert (out["width"], out["height"], out["components"]) == (17, 13, 3)
        np.testing.assert_array_equal(arr, px, err_msg=str(filters))


def test_hand_computed_sub_and_paeth_golden():
    """Byte-level check independent of the test encoder: a 2x2 grey
    image with literal filtered bytes composed by hand."""
    # row 0, Sub: filtered [10, 250] -> decoded [10, (250+10)&255 = 4]
    # row 1, Paeth: filtered [7, 3];
    #   x=0: a=0, b=10, c=0 -> p=10, picks b=10 -> 7+10 = 17
    #   x=1: a=17, b=4, c=10 -> p=11, pa=6/pb=7/pc=1 -> c=10 -> 3+10 = 13
    raster = bytes([1, 10, 250, 4, 7, 3])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raster))
        + _chunk(b"IEND", b"")
    )
    _, arr = _got(payload)
    assert arr[..., 0].tolist() == [[10, 4], [17, 13]]


def test_palette_greyscale_alpha_and_16bit():
    rng = np.random.default_rng(5)
    # palette at depth 4: 7 entries, indices 0..6
    plte = bytes(
        v for entry in [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                        (7, 8, 9), (1, 2, 3), (200, 100, 50), (0, 0, 0)]
        for v in entry
    )
    idx = rng.integers(0, 7, size=(5, 9, 1)).astype(np.uint8)
    out, arr = _got(
        _encode_png(idx, color=3, depth=4, filters=(0, 2), plte=plte)
    )
    want = np.frombuffer(plte, np.uint8).reshape(-1, 3)[idx[..., 0]]
    np.testing.assert_array_equal(arr, want)
    # out-of-range palette index refuses
    bad = idx.copy()
    bad[0, 0, 0] = 9
    with pytest.raises(ValueError, match="outside the 7-entry"):
        decode_png(_encode_png(bad, color=3, depth=4, plte=plte))

    # greyscale depth 1 scales to 0/255
    g1 = rng.integers(0, 2, size=(3, 10, 1)).astype(np.uint8)
    _, a1 = _got(_encode_png(g1, color=0, depth=1))
    np.testing.assert_array_equal(a1[..., 0], g1[..., 0] * 255)

    # grey+alpha and RGBA: alpha dropped
    ga = rng.integers(0, 256, size=(4, 6, 2)).astype(np.uint8)
    _, aga = _got(_encode_png(ga, color=4, filters=(4,)))
    np.testing.assert_array_equal(aga[..., 0], ga[..., 0])
    rgba = rng.integers(0, 256, size=(4, 6, 4)).astype(np.uint8)
    _, argba = _got(_encode_png(rgba, color=6, filters=(3,)))
    np.testing.assert_array_equal(argba, rgba[..., :3])

    # 16-bit reduces to the high byte
    rgb = rng.integers(0, 256, size=(3, 4, 3)).astype(np.uint8)
    _, a16 = _got(_encode_png(rgb, color=2, depth=16, filters=(1,)))
    np.testing.assert_array_equal(a16, rgb)


def test_adam7_interlace_equals_progressive_layout():
    """The same pixels encoded interlaced and non-interlaced must
    decode identically (pass scatter exactness), including dimensions
    not divisible by 8."""
    rng = np.random.default_rng(7)
    for shape in [(11, 13), (8, 8), (3, 5), (1, 1), (2, 9)]:
        px = rng.integers(0, 256, size=(*shape, 3)).astype(np.uint8)
        plain = _got(_encode_png(px, color=2, filters=(0, 1, 2, 3, 4)))[1]
        inter = _got(
            _encode_png(
                px, color=2, filters=(4, 3, 2, 1, 0), interlace=1
            )
        )[1]
        np.testing.assert_array_equal(plain, px)
        np.testing.assert_array_equal(inter, px)


def test_malformed_pngs_refuse():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    good = _encode_png(px, color=2)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    # flip a byte inside IDAT: CRC catches it
    bad = bytearray(good)
    idat_at = good.find(b"IDAT")
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-8])
    # unknown filter byte inside a VALID zlib stream
    raster = bytes([9]) + bytes(12)
    ihdr = struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raster)) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unknown PNG filter"):
        decode_png(payload)
    # geometry guard fires before inflating anything
    huge = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="decode bound"):
        decode_png(
            b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", huge)
            + _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b"")
        )
    # oversized inflate stops at the bound; undersized fails the
    # raster-length check
    hdr_1x1 = _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(
            b"\x89PNG\r\n\x1a\n" + hdr_1x1
            + _chunk(b"IDAT", zlib.compress(bytes(4)))
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError, match="inflated raster"):
        decode_png(
            b"\x89PNG\r\n\x1a\n" + hdr_1x1
            + _chunk(b"IDAT", zlib.compress(bytes(1)))
            + _chunk(b"IEND", b"")
        )


# ---- exception totality ----------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payload=st.binary(min_size=0, max_size=300))
def test_decode_total_on_random_bytes(payload):
    try:
        decode_png(b"\x89PNG\r\n\x1a\n" + payload)
    except ValueError:
        pass


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    pos=st.integers(min_value=8, max_value=4095),
    byte=st.integers(min_value=0, max_value=255),
)
def test_decode_total_on_mutated_valid(pos, byte):
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 6, 3)).astype(np.uint8)
    base = _encode_png(px, color=2, filters=(0, 1, 2, 3, 4), interlace=1)
    mutated = bytearray(base)
    mutated[pos % len(mutated)] = byte
    try:
        decode_png(bytes(mutated))
    except ValueError:
        pass


def test_adam7_passes_tile_every_pixel_exactly_once():
    """Pin the pass table itself: across several geometries the seven
    sub-lattices must cover each pixel exactly once (a wrong offset
    shows up as gap + overlap)."""
    from lcr_etl_upgrade_spark.png_lite import _ADAM7

    for w, h in [(8, 8), (11, 13), (1, 1), (5, 2), (16, 9)]:
        count = np.zeros((h, w), dtype=np.int64)
        for x0, y0, dx, dy in _ADAM7:
            count[y0::dy, x0::dx] += 1
        assert (count == 1).all(), (w, h)


def test_idat_decompression_bomb_is_bounded():
    """A 1x1 PNG whose IDAT inflates to far more than the declared
    raster must refuse WITHOUT materializing the inflate output — the
    decompression-bomb guard (review finding r7 pass 6)."""
    import resource

    bomb = zlib.compress(bytes(200_000_000), 9)  # ~190 KB compressed
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(payload)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is KB on linux: the 200 MB inflate must not have landed
    assert after - before < 50_000, (before, after)
