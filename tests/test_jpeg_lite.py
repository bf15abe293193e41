"""jpeg_lite: baseline JPEG pixel decode against hand-composed spec
goldens (ISO/IEC 10918-1 segment grammar + Annex C/F entropy coding) and
a test-local general encoder + direct-cosine IDCT oracle, both written
independently of the module under test."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lcr_etl_upgrade_spark.jpeg_lite import (
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg_flat,
)

# ---- independent test-side helpers ---------------------------------------


def _canon_codes(bits: list[int], huffval: bytes) -> dict[int, tuple[int, int]]:
    """Annex C canonical code construction, re-derived for the tests:
    {symbol -> (code, length)}."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BW:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, v: int, n: int) -> None:
        self.bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    def scan_bytes(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


# shared test tables: DC categories 0..11 at length 4, the full AC
# run/size alphabet at length 8 — sizes 0..10 for every run, so EOB,
# ZRL and all the progressive EOBn symbols are codable (176 codes,
# none all-ones)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_SYMS = bytes(s for s in range(256) if (s & 0x0F) <= 10)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMS)  # length 8
_DC_CODE = _canon_codes(_DC_BITS, _DC_VALS)
_AC_CODE = _canon_codes(_AC_BITS, _AC_SYMS)


def _mag(bw: _BW, v: int) -> None:
    v = int(v)
    t = abs(v).bit_length()
    code, ln = _DC_CODE[t]
    bw.put(code, ln)
    if t:
        bw.put(v if v > 0 else v + (1 << t) - 1, t)


def _encode_block(bw: _BW, zz: list[int], pred: int) -> int:
    zz = [int(v) for v in zz]
    dc = zz[0]
    _mag(bw, dc - pred)
    k, run = 1, 0
    last = max((i for i in range(1, 64) if zz[i]), default=0)
    while k <= last:
        if zz[k] == 0:
            run += 1
        else:
            while run >= 16:
                code, ln = _AC_CODE[0xF0]
                bw.put(code, ln)
                run -= 16
            t = abs(zz[k]).bit_length()
            code, ln = _AC_CODE[(run << 4) | t]
            bw.put(code, ln)
            bw.put(zz[k] if zz[k] > 0 else zz[k] + (1 << t) - 1, t)
            run = 0
        k += 1
    if last < 63:
        code, ln = _AC_CODE[0x00]
        bw.put(code, ln)
    return dc


def _encode_general(
    width: int,
    height: int,
    comps: list[dict],
    quant: list[int],
    blocks: dict[int, np.ndarray],
    dri: int = 0,
) -> bytes:
    """Independent baseline encoder: interleaved single scan, shared
    quant + huffman tables. ``blocks[ci]`` holds quantized coefficients
    in ZIGZAG order, shape (rows, cols, 64) over the padded MCU grid."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    out = b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + bytes(quant))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC0, sof)
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMS,
    )
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    out += _seg(0xDA, sos + bytes([0, 63, 0]))
    bw = _BW()
    preds = [0] * len(comps)
    scan = b""
    rst = 0
    for m in range(mcus_x * mcus_y):
        if dri and m and m % dri == 0:
            scan += bw.scan_bytes() + bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            bw = _BW()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            for v in range(c["v"]):
                for h in range(c["h"]):
                    zz = blocks[ci][my * c["v"] + v, mx * c["h"] + h]
                    preds[ci] = _encode_block(bw, list(zz), preds[ci])
    scan += bw.scan_bytes()
    return out + scan + b"\xff\xd9"


def _idct_direct(coefs_natural: np.ndarray) -> np.ndarray:
    """T.81 A.3.3 inverse DCT as the literal double cosine sum — the
    slow, obviously-correct oracle for the module's matmul IDCT."""
    F = coefs_natural.reshape(8, 8)
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def _oracle_decode(
    width: int,
    height: int,
    comps: list[dict],
    quant: list[int],
    blocks: dict[int, np.ndarray],
) -> np.ndarray:
    """Independent pipeline: dequant (zigzag->natural) -> direct-cosine
    IDCT -> +128 clamp -> replicate-upsample -> BT.601."""
    qnat = np.zeros(64)
    for k in range(64):
        qnat[ZIGZAG[k]] = quant[k]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        rows, cols, _ = blocks[ci].shape
        plane = np.zeros((rows * 8, cols * 8))
        for r in range(rows):
            for col in range(cols):
                nat = np.zeros(64)
                for k in range(64):
                    nat[ZIGZAG[k]] = blocks[ci][r, col, k] * qnat[ZIGZAG[k]]
                plane[r * 8 : r * 8 + 8, col * 8 : col * 8 + 8] = (
                    _idct_direct(nat)
                )
        plane = np.clip(np.round(plane) + 128, 0, 255)
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return planes[0][..., None]
    y, cb, cr = planes
    r = np.clip(np.round(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(
        np.round(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
        0,
        255,
    )
    b = np.clip(np.round(y + 1.772 * (cb - 128.0)), 0, 255)
    return np.stack([r, g, b], axis=-1)


def _got(payload: bytes) -> tuple[dict, np.ndarray]:
    out = decode_jpeg_pixels(payload)
    arr = np.frombuffer(out["pixels"], dtype=np.uint8).reshape(
        out["height"], out["width"], out["components"]
    )
    return out, arr


# ---- byte-level goldens ---------------------------------------------------


def test_flat_gray_8x8_hand_composed_golden():
    """One grayscale 8x8 block composed byte-by-byte from the spec:
    quant[0]=8 cancels the orthonormal IDCT's 1/8, so pixel == 128+DC.
    DC diff 72: category 7 -> DC code '0111' (12 symbols at length 4),
    magnitude bits 1001000, then AC EOB (first length-8 code)."""
    quant = [8] + [1] * 63
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes(quant))
        + _seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _seg(
            0xC4,
            bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
            + bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMS,
        )
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    bw = _BW()
    code, ln = _DC_CODE[7]
    bw.put(code, ln)
    bw.put(72, 7)
    code, ln = _AC_CODE[0x00]
    bw.put(code, ln)
    payload += bw.scan_bytes() + b"\xff\xd9"
    out, arr = _got(payload)
    assert (out["width"], out["height"], out["components"]) == (8, 8, 1)
    assert (arr == 200).all()  # 128 + 72


def test_single_ac_coefficient_vs_direct_cosine():
    """DC=0 with one AC coefficient: the decoded block must equal the
    literal T.81 double cosine sum, pixel for pixel."""
    quant = [1] * 64
    for zz_pos, val in [(1, 40), (5, -33), (63, 25)]:
        zz = np.zeros((1, 1, 64), dtype=np.int64)
        zz[0, 0, zz_pos] = val
        payload = _encode_general(
            8, 8, [{"id": 1, "h": 1, "v": 1}], quant, {0: zz}
        )
        _, arr = _got(payload)
        expected = _oracle_decode(
            8, 8, [{"id": 1, "h": 1, "v": 1}], quant, {0: zz}
        )
        assert (arr == expected.astype(np.uint8)).all(), zz_pos


def test_random_blocks_differential_grayscale():
    """Random quantized coefficients through the independent encoder,
    decoded and compared against the direct-cosine oracle — exercises
    DC prediction across blocks, AC run lengths, ZRL, EOB placement."""
    rng = np.random.default_rng(7)
    quant = [8, 6, 6, 7, 6, 5, 8, 7] + [9] * 56
    comps = [{"id": 1, "h": 1, "v": 1}]
    for _ in range(5):
        zz = np.zeros((2, 3, 64), dtype=np.int64)
        for r in range(2):
            for c in range(3):
                n = rng.integers(0, 12)
                pos = rng.choice(64, size=n, replace=False)
                zz[r, c, pos] = rng.integers(-40, 41, size=n)
        payload = _encode_general(24, 16, comps, quant, {0: zz})
        _, arr = _got(payload)
        expected = _oracle_decode(24, 16, comps, quant, {0: zz})
        np.testing.assert_array_equal(arr, expected.astype(np.uint8))


def test_non_flat_420_color_vs_oracle():
    """4:2:0 color with per-block-distinct luma DC — catches MCU
    block-ordering and chroma upsample placement bugs a flat image
    cannot see. 20x12 crops the padded 32x16 grid on both axes."""
    comps = [
        {"id": 1, "h": 2, "v": 2},
        {"id": 2, "h": 1, "v": 1},
        {"id": 3, "h": 1, "v": 1},
    ]
    quant = [8] + [4] * 63
    y = np.zeros((2, 4, 64), dtype=np.int64)
    for r in range(2):
        for c in range(4):
            y[r, c, 0] = (r * 4 + c) * 3 - 10  # distinct per block
            y[r, c, 3] = 5
    cb = np.zeros((1, 2, 64), dtype=np.int64)
    cb[0, 0, 0], cb[0, 1, 0] = 6, -6
    cr = np.zeros((1, 2, 64), dtype=np.int64)
    cr[0, 0, 1] = 9
    blocks = {0: y, 1: cb, 2: cr}
    payload = _encode_general(20, 12, comps, quant, blocks)
    out, arr = _got(payload)
    assert (out["width"], out["height"], out["components"]) == (20, 12, 3)
    expected = _oracle_decode(20, 12, comps, quant, blocks)
    np.testing.assert_array_equal(arr, expected.astype(np.uint8))


def test_restart_markers_reset_predictors():
    """DRI=1 over three grayscale blocks: predictors reset at each RSTn,
    so each interval re-codes the full DC — and markers must appear in
    RST0,RST1 sequence (an out-of-sequence marker raises)."""
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [1] * 63
    zz = np.zeros((1, 3, 64), dtype=np.int64)
    zz[0, :, 0] = 50
    payload = _encode_general(24, 8, comps, quant, {0: zz}, dri=1)
    assert b"\xff\xd0" in payload and b"\xff\xd1" in payload
    _, arr = _got(payload)
    assert (arr == 178).all()  # 128 + 50
    # corrupt the sequence: RST0 -> RST5
    bad = payload.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_pixels(bad)


def test_byte_stuffing_in_scan():
    """A DC magnitude of eight 1-bits lands a literal 0xFF in the scan;
    the encoder must stuff 0x00 and the decoder must unstuff it."""
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [1] * 64
    zz = np.zeros((1, 2, 64), dtype=np.int64)
    # block 1: DC 0 (4 bits) + EOB (8 bits) = 12 bits; block 2's DC
    # category code (4 bits) completes the byte, so the 8 magnitude
    # bits of 255 land byte-aligned as a literal 0xFF
    zz[0, 1, 0] = 255
    payload = _encode_general(16, 8, comps, quant, {0: zz})
    assert b"\xff\x00" in payload
    _, arr = _got(payload)
    assert (arr[:, :8] == 128).all()
    # DC 255 * quant 1 / 8 = 31.875 -> round 32 -> +128
    assert (arr[:, 8:] == 160).all()


# ---- the flat writer used by the oracled query ----------------------------


def test_flat_writer_decodes_to_exact_bt601():
    """encode_jpeg_flat -> decode_jpeg_pixels equals the clamp/round
    BT.601 formula EXACTLY (the property the DuckDB oracle restates),
    including non-MCU-aligned crops."""
    for w, h, y, cb, cr in [
        (8, 8, 128, 128, 128),
        (10, 6, 200, 30, 99),
        (33, 17, 0, 255, 0),
        (1, 1, 255, 0, 255),
        (100, 50, 77, 11, 250),
    ]:
        out, arr = _got(encode_jpeg_flat(w, h, y, cb, cr))
        assert (out["width"], out["height"]) == (w, h)
        r = min(255, max(0, round(y + 1.402 * (cr - 128))))
        g = min(
            255,
            max(0, round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
        )
        b = min(255, max(0, round(y + 1.772 * (cb - 128))))
        assert {tuple(v) for row in arr for v in row} == {(r, g, b)}


# ---- refusals --------------------------------------------------------------


def _minimal_with_sof(sof_marker: int, precision: int = 8, nf: int = 1):
    body = bytes([precision, 0, 8, 0, 8, nf])
    for i in range(nf):
        body += bytes([i + 1, 0x11, 0])
    return b"\xff\xd8" + _seg(sof_marker, body)


def test_arithmetic_refuses_and_scanless_progressive_is_malformed():
    # arithmetic coding is a genuinely different entropy coder
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(_minimal_with_sof(0xC9))
    # progressive is now DECODED; a header-only SOF2 stream with no scan
    # is structurally incomplete, not unsupported
    with pytest.raises(ValueError, match="before SOS"):
        decode_jpeg_pixels(_minimal_with_sof(0xC2))


def test_unsupported_shapes_raise_value_error():
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg_pixels(_minimal_with_sof(0xC0, precision=12))
    with pytest.raises(ValueError, match="4-component"):
        decode_jpeg_pixels(_minimal_with_sof(0xC0, nf=4))
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg_pixels(_minimal_with_sof(0xC3))  # lossless
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_pixels(b"P6 1 1 255 rgb")


def test_structural_corruption_raises():
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [1] * 63
    zz = np.zeros((1, 1, 64), dtype=np.int64)
    zz[0, 0, 0] = 10
    good = _encode_general(8, 8, comps, quant, {0: zz})
    with pytest.raises(ValueError, match="truncated|exhausted|entropy"):
        decode_jpeg_pixels(good[:-4])  # cut into the scan
    # zero quant divisor
    bad_q = good.replace(
        _seg(0xDB, bytes([0x00]) + bytes(quant)),
        _seg(0xDB, bytes([0x00]) + bytes([8] + [0] * 63)),
    )
    with pytest.raises(ValueError, match="zero divisor"):
        decode_jpeg_pixels(bad_q)
    # strip the DHT segment entirely
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMS,
    )
    with pytest.raises(ValueError, match="missing DC huffman"):
        decode_jpeg_pixels(good.replace(dht, b""))
    # non-interleaved: SOS listing 1 of 3 frame components
    color = _encode_general(
        8,
        8,
        [
            {"id": 1, "h": 1, "v": 1},
            {"id": 2, "h": 1, "v": 1},
            {"id": 3, "h": 1, "v": 1},
        ],
        quant,
        {
            0: zz,
            1: np.zeros((1, 1, 64), dtype=np.int64),
            2: np.zeros((1, 1, 64), dtype=np.int64),
        },
    )
    sos_full = bytes([3, 1, 0, 2, 0, 3, 0, 0, 63, 0])
    sos_one = bytes([1, 1, 0, 0, 63, 0])
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg_pixels(
            color.replace(_seg(0xDA, sos_full), _seg(0xDA, sos_one))
        )


def test_pixel_budget_guard():
    """A hostile SOF claiming giant geometry must refuse BEFORE the
    coefficient store is allocated (34 GB for 65535x65535), with a
    ValueError _media_features_one downgrades to metadata features."""
    body = bytes([8]) + (60000).to_bytes(2, "big") + (60000).to_bytes(2, "big")
    body += bytes([1, 1, 0x11, 0])
    with pytest.raises(ValueError, match="pixel decode bound"):
        decode_jpeg_pixels(b"\xff\xd8" + _seg(0xC0, body))


# ---- exception totality ----------------------------------------------------
# operators/multimodal.py catches ValueError and NotImplementedError from
# the pixel stage; anything else would kill the executor task.

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payload=st.binary(min_size=0, max_size=400))
def test_decode_total_on_random_bytes(payload):
    try:
        decode_jpeg_pixels(payload)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    pos=st.integers(min_value=0, max_value=4095),
    byte=st.integers(min_value=0, max_value=255),
    which=st.integers(min_value=0, max_value=2),
)
def test_decode_total_on_mutated_valid(pos, byte, which):
    """Single-byte mutations of VALID baseline AND progressive JPEGs
    (right magic, broken interior — tables, scan bits, scan scripts,
    marker grammar) must decode or raise the two permitted types, never
    IndexError/KeyError/struct errors or a numpy shape blowup."""
    if which == 0:
        base = encode_jpeg_flat(20, 12, 77, 11, 250)
    elif which == 1:
        zz = np.zeros((1, 2, 64), dtype=np.int64)
        zz[0, 0, 0], zz[0, 0, 5], zz[0, 1, 63] = 40, -9, 3
        base = _encode_general(
            16, 8, [{"id": 1, "h": 1, "v": 1}], [8] + [2] * 63, {0: zz}
        )
    else:
        zz = np.zeros((1, 2, 64), dtype=np.int64)
        zz[0, 0, 0], zz[0, 0, 5], zz[0, 1, 63] = 40, -9, 3
        base = _encode_progressive(
            16, 8, [{"id": 1, "h": 1, "v": 1}], [8] + [2] * 63, {0: zz},
            [
                ((0,), 0, 0, 0, 1),
                ((0,), 1, 63, 0, 1),
                ((0,), 0, 0, 1, 0),
                ((0,), 1, 63, 1, 0),
            ],
        )
    mutated = bytearray(base)
    mutated[pos % len(mutated)] = byte
    try:
        decode_jpeg_pixels(bytes(mutated))
    except (ValueError, NotImplementedError):
        pass


def test_zigzag_matches_spec_diagonal_walk():
    """Pin the module's ZIGZAG table against an independent derivation
    (the T.81 Figure 5 diagonal walk) — the differential tests share the
    table between encoder, oracle and decoder, so a wrong table would
    cancel out of them."""
    order = []
    r = c = 0
    up = True
    for _ in range(64):
        order.append(r * 8 + c)
        if up:
            if c == 7:
                r, up = r + 1, False
            elif r == 0:
                c, up = c + 1, False
            else:
                r, c = r - 1, c + 1
        else:
            if r == 7:
                c, up = c + 1, True
            elif c == 0:
                r, up = r + 1, True
            else:
                r, c = r + 1, c - 1
    assert list(ZIGZAG) == order


def test_single_component_scan_is_non_interleaved():
    """T.81 A.2: a one-component scan has ONE data unit per MCU over the
    component's own ceil(w/8) x ceil(h/8) raster grid, whatever sampling
    factors the SOF declares. A 24x8 grayscale declaring 2x2 is exactly
    3 raster blocks — an (incorrect) interleaved MCU walk would expect
    8 blocks and fail, or tile them at wrong positions."""
    quant = [8] + [1] * 63
    zz = np.zeros((1, 3, 64), dtype=np.int64)
    zz[0, :, 0] = [10, 20, 30]  # distinct per raster block
    payload = _encode_general(
        24, 8, [{"id": 1, "h": 1, "v": 1}], quant, {0: zz}
    )
    # rewrite the SOF sampling byte 1x1 -> 2x2 (same entropy data)
    sof_11 = _seg(
        0xC0,
        bytes([8]) + (8).to_bytes(2, "big") + (24).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    sof_22 = sof_11.replace(bytes([1, 0x11, 0]), bytes([1, 0x22, 0]))
    assert sof_11 in payload and sof_11 != sof_22
    _, base = _got(payload)
    _, declared22 = _got(payload.replace(sof_11, sof_22))
    np.testing.assert_array_equal(base, declared22)
    assert [int(base[0, c * 8, 0]) for c in range(3)] == [138, 148, 158]


# ---- progressive (T.81 Annex G) -------------------------------------------
# Test-side progressive encoder, re-derived independently from the spec
# (jcphuff-equivalent semantics): DC first/refine, AC first with EOB
# runs, AC refinement with buffered correction bits. The decisive check
# is CROSS-MODE: a progressive encoding of random coefficients must
# decode to exactly the same pixels as the (independently oracled)
# baseline encoding of the same coefficients.


def _emit_eobrun(bw: _BW, state: dict) -> None:
    e = state["eobrun"]
    if e:
        r = e.bit_length() - 1
        code, ln = _AC_CODE[r << 4]
        bw.put(code, ln)
        if r:
            bw.put(e - (1 << r), r)
        bw.bits.extend(state["pending"])
        state["eobrun"] = 0
        state["pending"] = []


def _enc_ac_first_block(bw, zz, ss, se, al, state):
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        mag = abs(v) >> al
        vals.append(mag if v >= 0 else -mag)
    last = max((i for i, v in enumerate(vals) if v), default=-1)
    if last == -1:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, state)
        return
    _emit_eobrun(bw, state)
    r = 0
    for i in range(last + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, ln = _AC_CODE[0xF0]
            bw.put(code, ln)
            r -= 16
        t = abs(v).bit_length()
        code, ln = _AC_CODE[(r << 4) | t]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << t) - 1, t)
        r = 0
    if last < se - ss:
        state["eobrun"] += 1
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, state)


def _enc_ac_refine_block(bw, zz, ss, se, al, state):
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_idx = -1
    for i, a in enumerate(absv):
        if a == 1:
            eob_idx = i
    r, br = 0, []
    for i, a in enumerate(absv):
        v = int(zz[ss + i])
        if a == 0:
            r += 1
            continue
        while r > 15 and i <= eob_idx:
            _emit_eobrun(bw, state)
            code, ln = _AC_CODE[0xF0]
            bw.put(code, ln)
            r -= 16
            bw.bits.extend(br)
            br = []
        if a > 1:
            br.append(a & 1)
            continue
        _emit_eobrun(bw, state)
        code, ln = _AC_CODE[(r << 4) | 1]
        bw.put(code, ln)
        r = 0
        bw.put(1 if v > 0 else 0, 1)
        bw.bits.extend(br)
        br = []
    if r > 0 or br:
        state["eobrun"] += 1
        state["pending"].extend(br)
        if state["eobrun"] == 0x7FFF:
            _emit_eobrun(bw, state)


def _comp_grid(width, height, c, hmax, vmax):
    xw = -(-width * c["h"] // hmax)
    yh = -(-height * c["v"] // vmax)
    return -(-xw // 8), -(-yh // 8)


def _encode_progressive(width, height, comps, quant, blocks, script, dri=0):
    """Progressive encoder: ``script`` is a list of scans
    (comp_indices, Ss, Se, Ah, Al). DC scans may interleave all comps;
    AC scans take one comp. Shared test huffman tables for all scans.
    ``dri`` emits RSTn every dri MCUs/data-units within every scan."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    out = b"\xff\xd8" + _seg(0xDB, bytes([0x00]) + bytes(quant))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += _seg(0xC2, sof)
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
        + bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMS,
    )
    if dri:
        out += _seg(0xDD, struct.pack(">H", dri))
    for comp_idx, ss, se, ah, al in script:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([comps[ci]["id"], 0x00])
        out += _seg(0xDA, sos + bytes([ss, se, (ah << 4) | al]))
        bw = _BW()
        state = {"eobrun": 0, "pending": []}
        preds = {ci: 0 for ci in comp_idx}
        if ss == 0 and len(comp_idx) > 1:
            # interleaved DC scan: one "unit" = one MCU (all its blocks)
            units = [
                [
                    (ci, blocks[ci][my * comps[ci]["v"] + v,
                                    mx * comps[ci]["h"] + h])
                    for ci in comp_idx
                    for v in range(comps[ci]["v"])
                    for h in range(comps[ci]["h"])
                ]
                for m in range(mcus_x * mcus_y)
                for my, mx in [divmod(m, mcus_x)]
            ]
        else:
            ci = comp_idx[0]
            bw_, bh_ = _comp_grid(width, height, comps[ci], hmax, vmax)
            units = [
                [(ci, blocks[ci][m // bw_, m % bw_])]
                for m in range(bw_ * bh_)
            ]
        rst = 0
        for m, unit in enumerate(units):
            if dri and m and m % dri == 0:
                _emit_eobrun(bw, state)
                out += bw.scan_bytes() + bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                bw = _BW()
                preds = {ci: 0 for ci in comp_idx}
            for ci, zz in unit:
                if ss == 0:
                    if ah == 0:
                        v = int(zz[0]) >> al  # arithmetic point transform
                        _mag(bw, v - preds[ci])
                        preds[ci] = v
                    else:
                        bw.put((int(zz[0]) >> al) & 1, 1)
                elif ah == 0:
                    _enc_ac_first_block(bw, zz, ss, se, al, state)
                else:
                    _enc_ac_refine_block(bw, zz, ss, se, al, state)
        _emit_eobrun(bw, state)
        out += bw.scan_bytes()
    return out + b"\xff\xd9"


def _rand_blocks(rng, rows, cols, max_ac=40, n_ac=10, max_dc=200):
    zz = np.zeros((rows, cols, 64), dtype=np.int64)
    for r in range(rows):
        for c in range(cols):
            n = rng.integers(0, n_ac + 1)
            pos = rng.choice(63, size=n, replace=False) + 1
            zz[r, c, pos] = rng.integers(-max_ac, max_ac + 1, size=n)
            zz[r, c, 0] = rng.integers(-max_dc, max_dc + 1)
    return zz


def test_progressive_spectral_selection_equals_baseline():
    """DC scan + two AC band scans (no successive approximation) must
    decode to EXACTLY the baseline decode of the same coefficients."""
    rng = np.random.default_rng(11)
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [3] * 63
    for _ in range(3):
        zz = {0: _rand_blocks(rng, 2, 3)}
        base = _got(_encode_general(24, 16, comps, quant, zz))[1]
        prog = _got(
            _encode_progressive(
                24, 16, comps, quant, zz,
                [((0,), 0, 0, 0, 0), ((0,), 1, 5, 0, 0), ((0,), 6, 63, 0, 0)],
            )
        )[1]
        np.testing.assert_array_equal(prog, base)


def test_progressive_successive_approximation_equals_baseline():
    """The full libjpeg-style script — DC first at Al=1, AC bands at
    Al=2, DC refine, then two AC refinement sweeps down to Al=0 — must
    reconstruct the coefficients EXACTLY (cross-mode differential)."""
    rng = np.random.default_rng(13)
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [3] * 63
    script = [
        ((0,), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2),
        ((0,), 6, 63, 0, 2),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 63, 2, 1),
        ((0,), 1, 63, 1, 0),
    ]
    for _ in range(3):
        zz = {0: _rand_blocks(rng, 3, 2)}
        base = _got(_encode_general(16, 24, comps, quant, zz))[1]
        prog = _got(_encode_progressive(16, 24, comps, quant, zz, script))[1]
        np.testing.assert_array_equal(prog, base)


def test_progressive_color_420_equals_baseline():
    """3-component 4:2:0 with an interleaved DC scan and per-component
    AC scans, with successive approximation — catches the
    non-interleaved component-grid walk (smaller than the padded MCU
    grid for the luma of a 20x12 image) and chroma refinement."""
    rng = np.random.default_rng(17)
    comps = [
        {"id": 1, "h": 2, "v": 2},
        {"id": 2, "h": 1, "v": 1},
        {"id": 3, "h": 1, "v": 1},
    ]
    quant = [8] + [4] * 63
    zz = {
        0: _rand_blocks(rng, 2, 4, max_ac=20, n_ac=6, max_dc=60),
        1: _rand_blocks(rng, 1, 2, max_ac=12, n_ac=4, max_dc=30),
        2: _rand_blocks(rng, 1, 2, max_ac=12, n_ac=4, max_dc=30),
    }
    base = _got(_encode_general(20, 12, comps, quant, zz))[1]
    script = [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 63, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((2,), 1, 63, 0, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((2,), 1, 63, 1, 0),
    ]
    prog = _got(_encode_progressive(20, 12, comps, quant, zz, script))[1]
    np.testing.assert_array_equal(prog, base)


def test_progressive_eob_runs_span_blocks():
    """A mostly-empty band (few nonzero blocks among many all-zero
    ones) exercises multi-block EOB runs in both first and refinement
    scans."""
    rng = np.random.default_rng(19)
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [2] * 63
    zz = np.zeros((4, 8, 64), dtype=np.int64)
    zz[:, :, 0] = rng.integers(-50, 51, size=(4, 8))
    zz[1, 3, 17], zz[3, 6, 33] = 21, -13  # two lonely AC coefficients
    blocks = {0: zz}
    base = _got(_encode_general(64, 32, comps, quant, blocks))[1]
    script = [
        ((0,), 0, 0, 0, 0),
        ((0,), 1, 63, 0, 1),
        ((0,), 1, 63, 1, 0),
    ]
    prog = _got(_encode_progressive(64, 32, comps, quant, blocks, script))[1]
    np.testing.assert_array_equal(prog, base)


def test_progressive_dc_only_stream_renders():
    """A progressive stream that ends after the DC scans (a truncated
    download cut at a scan boundary) still renders — blurry, but valid:
    every pixel equals the block's DC reconstruction."""
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [1] * 63
    zz = np.zeros((1, 2, 64), dtype=np.int64)
    zz[0, :, 0] = [72, -40]
    payload = _encode_progressive(
        16, 8, comps, quant, {0: zz}, [((0,), 0, 0, 0, 0)]
    )
    out, arr = _got(payload)
    assert (arr[:, :8] == 200).all() and (arr[:, 8:] == 88).all()
    # but a stream with NO DC scan for the component refuses
    with pytest.raises(ValueError, match="DC scan"):
        decode_jpeg_pixels(
            _encode_progressive(
                16, 8, comps, quant, {0: zz}, [((0,), 1, 63, 0, 0)]
            )
        )


def test_progressive_zrl_in_refinement():
    """Zero-history runs >15 before a newly-significant coefficient
    force ZRL symbols inside an AC refinement scan, with correction
    bits for already-significant coefficients buffered across them."""
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [2] * 63
    zz = np.zeros((1, 1, 64), dtype=np.int64)
    zz[0, 0, 1] = 7    # significant from the first AC scan (7>>1 = 3)
    zz[0, 0, 40] = 2   # zero at al=1, newly significant at al=0...
    zz[0, 0, 60] = -3  # ...after a >15 zero-history gap, and another
    blocks = {0: zz}
    base = _got(_encode_general(8, 8, comps, quant, blocks))[1]
    script = [
        ((0,), 0, 0, 0, 0),
        ((0,), 1, 63, 0, 1),
        ((0,), 1, 63, 1, 0),
    ]
    prog = _got(_encode_progressive(8, 8, comps, quant, blocks, script))[1]
    np.testing.assert_array_equal(prog, base)


def test_progressive_random_scripts_differential():
    """Many random coefficient fields through two scan scripts — the
    broad cross-mode net for EOB-run, ZRL, refinement-order and
    predictor interactions the targeted cases might miss."""
    rng = np.random.default_rng(23)
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [3] * 63
    scripts = [
        [((0,), 0, 0, 0, 0), ((0,), 1, 63, 0, 0)],
        [
            ((0,), 0, 0, 0, 2),
            ((0,), 1, 8, 0, 1),
            ((0,), 9, 63, 0, 1),
            ((0,), 0, 0, 1, 1),
            ((0,), 0, 0, 2, 0),  # wait: Ah must be Al+1 of PREVIOUS
        ],
    ]
    # fix script 2's DC chain: Al 2 -> refine to 1 -> refine to 0
    scripts[1][3] = ((0,), 0, 0, 2, 1)
    scripts[1][4] = ((0,), 0, 0, 1, 0)
    scripts[1] += [((0,), 1, 63, 1, 0)]
    for script in scripts:
        for _ in range(4):
            zz = {0: _rand_blocks(rng, 2, 2, max_ac=60, n_ac=16)}
            base = _got(_encode_general(16, 16, comps, quant, zz))[1]
            prog = _got(
                _encode_progressive(16, 16, comps, quant, zz, script)
            )[1]
            np.testing.assert_array_equal(prog, base)


def test_progressive_restart_markers_reset_predictors_and_eobrun():
    """RSTn inside progressive scans resets the DC predictors AND the
    EOB run — an unreset run would swallow the blocks after the marker."""
    rng = np.random.default_rng(29)
    comps = [{"id": 1, "h": 1, "v": 1}]
    quant = [8] + [3] * 63
    zz = {0: _rand_blocks(rng, 2, 3, max_ac=25, n_ac=5)}
    script = [
        ((0,), 0, 0, 0, 1),
        ((0,), 1, 63, 0, 1),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]
    base = _got(_encode_general(24, 16, comps, quant, zz))[1]
    payload = _encode_progressive(24, 16, comps, quant, zz, script, dri=2)
    assert payload.count(b"\xff\xd0") >= 4  # RST0 in several scans
    prog = _got(payload)[1]
    np.testing.assert_array_equal(prog, base)


def test_review_fixes_hostile_and_truncated_streams():
    """Round-7 review pass: four decoder contract holes."""
    # 1. Ns=0 SOS passes the length equation but must ValueError, not
    #    IndexError (which would escape the totality catch)
    hostile = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
        + _seg(0xDA, bytes([0, 0, 0, 0]))
    )
    with pytest.raises(ValueError, match="component count"):
        decode_jpeg_pixels(hostile)

    # 2. a hostile DC-first scan accumulating the predictor past int32
    #    must ValueError (silent int32 wraparound / OverflowError before)
    comps = [{"id": 1, "h": 1, "v": 1}]
    bw = _BW()
    pred = 0
    for _ in range(16 * 12):  # 96x96 grayscale = 144 blocks
        _mag(bw, 2047)
        pred += 2047
    payload = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _seg(0xC2, bytes([8, 0, 96, 0, 96, 1, 1, 0x11, 0]))
        + _seg(
            0xC4,
            bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
            + bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMS,
        )
        + _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x0D]))  # Al=13
        + bw.scan_bytes()
        + b"\xff\xd9"
    )
    assert pred << 13 >= 2**31
    with pytest.raises(ValueError, match="outside int32"):
        decode_jpeg_pixels(payload)

    # 3. truncation right after a COMPLETE scan (EOI lost) renders
    full = encode_jpeg_flat(16, 16, 100, 50, 60)
    out, arr = _got(full[:-2])
    assert (out["width"], out["height"]) == (16, 16)
    np.testing.assert_array_equal(arr, _got(full)[1])

    # 4. progressive-ARITHMETIC (SOF10) refuses as arithmetic, and
    #    differential-hierarchical (SOF6) as unsupported — neither may
    #    reach the huffman-progressive decoder
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(_minimal_with_sof(0xCA))
    with pytest.raises(ValueError, match="unsupported SOF"):
        decode_jpeg_pixels(_minimal_with_sof(0xC6))
