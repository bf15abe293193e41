"""Pure-numpy JPEG decoder — no image-library dependency.

Implements the Huffman DCT processes of the PUBLIC spec (ISO/IEC
10918-1 / ITU-T T.81) — baseline/extended sequential (Annex F) AND
progressive (Annex G): marker-segment walk (DQT/DHT/SOF/DRI/SOS),
canonical Huffman decode (Annex C code construction, Annex F decoding
procedure with EXTEND sign recovery), run-length AC decode, multi-scan
spectral-selection / successive-approximation coefficient refinement,
dequantization in zigzag order, 8x8 inverse DCT (orthonormal basis,
batched numpy matmul), chroma upsampling by sample-factor replication,
and the Rec. ITU-R BT.601 YCbCr -> RGB conversion from the JFIF spec.
No reference counterpart (/root/reference/ingest.py has no media code);
consumed by operators/multimodal.py, where a JPEG payload previously
stopped at the SOF-geometry seam.

Scope — the Huffman processes real curation corpora use:

- SOF0/SOF1 (baseline / extended sequential) AND SOF2 (progressive:
  spectral selection + successive approximation per T.81 Annex G — DC
  and AC first/refinement scans, EOB runs, any libjpeg-style scan
  script);
- 8-bit sample precision, 1 (grayscale) or 3 (YCbCr) components;
- interleaved and non-interleaved scans (T.81 A.2: single-component
  scans walk the component's own data-unit grid);
- restart markers (DRI/RSTn) and 0xFF00 byte stuffing;
- sampling factors whose ratio to the frame maximum is integral
  (covers 4:4:4, 4:2:2, 4:2:0, 4:1:1 — everything common encoders emit).

Everything else REFUSES loudly rather than mis-decoding:
arithmetic-coded frames (SOF9+) raise NotImplementedError naming the
remedy (a different entropy coder, not an edge case of this one);
12-bit precision, 4-component (CMYK/Adobe), and lossless/differential
SOFs raise ValueError. Structural corruption (truncated entropy data,
invalid Huffman code, missing table, bad marker grammar, out-of-band
runs) raises ValueError with the offending detail.

The entropy walk is sequential Python per image — it runs executor-side
inside mapInPandas (operators/multimodal.py), so at 100 TB it
parallelizes per file like every other payload decode; a production
deployment would bind a native codec at the same seam for raw speed,
but the seam is now FUNCTIONAL, not stubbed.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index k in the entropy stream -> row-major position
# in the 8x8 block (T.81 Figure 5)
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
)

# orthonormal 8-point DCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi/16);
# spatial = A.T @ coeffs @ A  (T.81 A.3.3 with the 1/2 c(u) scaling)
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# decode-size guard: coefficient storage is allocated from the SOF
# geometry BEFORE any entropy data proves the image real, so a hostile
# header claiming 65535x65535 would commit tens of GB up front. With
# the staged-release reconstruction below, peak memory is ~30 B/pixel
# for 4:4:4 color (~3 GB at this bound — the coefficient stores of all
# components coexist through the scan). 100 MP covers every real
# photograph; raise it deliberately for stitched imagery, never
# implicitly.
MAX_JPEG_PIXELS = 100_000_000

_SOF_BASELINE = {0xC0, 0xC1}
_SOF_PROGRESSIVE = {0xC2}  # huffman progressive ONLY — 0xCA/0xCE are
# progressive but ARITHMETIC-coded (walking their entropy data with
# huffman tables would mis-decode), 0xC6 is differential-hierarchical
_SOF_ARITHMETIC = {0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
_SOF_OTHER = {0xC3, 0xC5, 0xC6, 0xC7}  # lossless / differential huffman
_STANDALONE = frozenset({0x01, 0xD8}) | frozenset(range(0xD0, 0xD8))


def _build_huffman(
    bits: list[int], huffval: bytes
) -> tuple[list[tuple[int, int] | None], dict[tuple[int, int], int]]:
    """Canonical Huffman table per T.81 Annex C: codes of each length are
    assigned consecutively in HUFFVAL order, doubling the running code at
    each length step. Returns ``(lut8, full)``: an 8-bit-prefix lookup
    (every code of length <= 8 resolved in ONE probe — the hot path; real
    tables put all frequent symbols there) and the exact
    {(length, code) -> symbol} map for longer codes and the stream tail."""
    full: dict[tuple[int, int], int] = {}
    lut8: list[tuple[int, int] | None] = [None] * 256
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("overfull huffman table (BITS exceeds codespace)")
            full[(length, code)] = huffval[k]
            if length <= 8:
                base = code << (8 - length)
                for suffix in range(1 << (8 - length)):
                    lut8[base | suffix] = (huffval[k], length)
            code += 1
            k += 1
        code <<= 1
    return lut8, full


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    0xFF00, stops AT any real marker (exposing it via ``marker_ahead``),
    and serves RSTn alignment for restart intervals."""

    def __init__(self, data: bytes, pos: int):
        self._d = data
        self._pos = pos
        self._bitbuf = 0
        self._nbits = 0

    def _fill(self) -> None:
        if self._pos >= len(self._d):
            raise ValueError("truncated entropy-coded data")
        b = self._d[self._pos]
        if b == 0xFF:
            if self._pos + 1 >= len(self._d):
                raise ValueError("truncated entropy-coded data at 0xFF")
            nxt = self._d[self._pos + 1]
            if nxt == 0x00:  # stuffed literal 0xFF
                self._pos += 2
            else:  # a real marker: entropy data for this interval is over
                raise ValueError(
                    f"entropy data exhausted at marker 0xff{nxt:02x} "
                    "(more coefficients expected)"
                )
        else:
            self._pos += 1
        # mask to the live window: without it the buffer grows one byte
        # per fill into a scan-sized bignum and every shift goes O(scan)
        self._bitbuf = ((self._bitbuf << 8) | b) & 0xFFFFFFFF
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._bitbuf >> self._nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self._nbits < n:
            self._fill()
        self._nbits -= n
        return (self._bitbuf >> self._nbits) & ((1 << n) - 1)

    def decode(
        self,
        table: tuple[list[tuple[int, int] | None], dict[tuple[int, int], int]],
    ) -> int:
        lut8, full = table
        if self._nbits < 8:
            try:
                while self._nbits < 8:
                    self._fill()
            except ValueError:
                pass  # stream tail: the per-bit walk below serves
                # whatever bits remain (a short final code before the
                # trailing marker is legal), and re-raises on real
                # exhaustion
        if self._nbits >= 8:
            hit = lut8[(self._bitbuf >> (self._nbits - 8)) & 0xFF]
            if hit is not None:
                sym, length = hit
                self._nbits -= length
                return sym
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = full.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code (no match within 16 bits)")

    def restart(self, expected_mod8: int) -> None:
        """Consume the RSTn marker between restart intervals: drop the
        pad bits to the byte boundary, then require 0xFF 0xD0+m with the
        right modulo-8 sequence (a skipped/duplicated restart means lost
        MCUs — fail, don't desync silently)."""
        self._bitbuf = 0
        self._nbits = 0
        if self._pos + 2 > len(self._d):
            raise ValueError("truncated restart marker")
        ff, m = self._d[self._pos], self._d[self._pos + 1]
        if ff != 0xFF or not 0xD0 <= m <= 0xD7:
            raise ValueError(
                f"expected restart marker, got {ff:#04x}{m:02x}"
            )
        if (m - 0xD0) != expected_mod8:
            raise ValueError(
                f"restart marker out of sequence: got RST{m - 0xD0}, "
                f"expected RST{expected_mod8}"
            )
        self._pos += 2


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): recover the signed value from t magnitude
    bits — a leading 0 bit means negative."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _skip_to_marker(payload: bytes, start: int) -> int:
    """Position of the next real marker (0xFF followed by a non-stuffing
    byte) at or after ``start`` — used to step past a decoded scan's
    entropy tail (pad bits) to the following segment. Returns
    ``len(payload)`` when none follows: a file truncated right after a
    COMPLETE scan (common in scraped corpora — the EOI is the first
    thing a cut download loses) must render what landed, not refuse."""
    i = start
    while i + 1 < len(payload):
        if payload[i] == 0xFF and payload[i + 1] != 0x00:
            return i
        i += 1
    return len(payload)


def _decode_dc_first(reader, c, dc_tab, al: int) -> int:
    """DC category + EXTEND diff into the component's predictor,
    returning the (point-transform-shifted) coefficient with a
    fail-loudly bound: legitimate 8-bit quantized DC values sit far
    inside int32 even at maximum successive-approximation shift, so a
    predictor outside it is a corrupt/hostile stream accumulating
    diffs, not data — the int32 store would otherwise silently wrap
    (numpy 1.x) or raise OverflowError past the totality contract
    (numpy 2.x)."""
    t = reader.decode(dc_tab)
    if t > 11:
        raise ValueError(f"bad DC category {t}")
    c["pred"] += _extend(reader.receive(t), t)
    val = c["pred"] << al
    if not -(2**31) <= val < 2**31:
        raise ValueError(
            "accumulated DC coefficient outside int32 (corrupt stream)"
        )
    return val


def _decode_baseline_block(reader, c, huff, coef_zz) -> None:
    """One full-precision data unit (T.81 F.2.2): DC diff + RLE AC into
    ``coef_zz`` (64 QUANTIZED values, natural order)."""
    coef_zz[0] = _decode_dc_first(reader, c, huff[(0, c["td"])], 0)
    ac_tab = huff[(1, c["ta"])]
    k = 1
    while k < 64:
        rs = reader.decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        coef_zz[ZIGZAG[k]] = _extend(reader.receive(s), s)
        k += 1


def _decode_ac_first(reader, ac_tab, blk, ss, se, al, state) -> None:
    """Progressive AC first scan for one data unit (T.81 G.1.2.2):
    run/size pairs within the band, EOB-run across blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past the scan's spectral band")
        blk[ZIGZAG[k]] = _extend(reader.receive(s), s) << al
        k += 1


def _decode_ac_refine(reader, ac_tab, blk, ss, se, al, state) -> None:
    """Progressive AC refinement for one data unit (T.81 G.1.2.3):
    correction bits for already-nonzero coefficients, run/size pairs
    inserting newly-significant ±1<<al values, EOB-run refinement."""
    p1, m1 = 1 << al, -1 << al

    def correct(z: int) -> None:
        if reader.read_bit() and (blk[z] & p1) == 0:
            blk[z] += p1 if blk[z] >= 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newly = 0
            if s == 0:
                if r < 15:
                    # the run INCLUDES the current block, whose band
                    # tail still carries correction bits — the clause
                    # below sweeps it, then decrements
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise ValueError(
                        f"AC refinement size {s} (only ±1 is codable)"
                    )
                newly = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    correct(z)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newly:
                if k > se:
                    raise ValueError("AC refinement run past the band")
                blk[ZIGZAG[k]] = newly
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0:
                correct(z)
            k += 1
        state["eobrun"] -= 1


def _decode_scan(payload, pos, sos, frame, qt, huff, restart_interval):
    """Decode ONE scan's entropy data into the frame's quantized
    coefficient stores. Returns the payload offset of the marker that
    follows the scan. Handles all four progressive scan kinds (DC/AC ×
    first/refine) and the baseline full-band scan through the same MCU /
    raster walk."""
    if len(sos) < 4 or len(sos) != 1 + 2 * sos[0] + 3:
        raise ValueError("malformed SOS header")
    ns = sos[0]
    if not 1 <= ns <= 4:
        # Ns=0 would pass the length equation above (1+0+3 == 4) and
        # reach scan_order[0] as an IndexError past the totality contract
        raise ValueError(f"bad SOS component count {ns}")
    ss, se, aa = sos[1 + 2 * ns], sos[2 + 2 * ns], sos[3 + 2 * ns]
    ah, al = aa >> 4, aa & 0x0F
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    scan_order = []
    for j in range(ns):
        cs, tt = sos[1 + 2 * j], sos[2 + 2 * j]
        if cs not in by_id:
            raise ValueError(f"SOS names unknown component {cs}")
        c = by_id[cs]
        c["td"], c["ta"] = tt >> 4, tt & 0x0F
        scan_order.append(c)
    if len({id(c) for c in scan_order}) != ns:
        raise ValueError("duplicate component in SOS")

    progressive = frame["progressive"]
    if progressive:
        if not (0 <= al <= 13 and ah in (0, al + 1)):
            raise ValueError(f"bad successive approximation {ah}/{al}")
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            kind = "dc_first" if ah == 0 else "dc_refine"
        else:
            if not (1 <= ss <= se <= 63):
                raise ValueError(f"bad spectral band {ss}..{se}")
            if ns != 1:
                raise ValueError(
                    "progressive AC scans must be non-interleaved (Ns=1)"
                )
            kind = "ac_first" if ah == 0 else "ac_refine"
        if kind.startswith("ac") and not scan_order[0]["dc_seen"]:
            raise ValueError("AC scan before the component's DC scan")
        if kind == "dc_refine" and not all(
            c["dc_seen"] for c in scan_order
        ):
            raise ValueError("DC refinement before the first DC scan")
    else:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("baseline scan must cover Ss=0..Se=63, Ah=Al=0")
        if ns != len(comps):
            raise ValueError(
                f"non-interleaved baseline scan ({ns} of {len(comps)} "
                "components) unsupported"
            )
        kind = "baseline"

    # table presence per scan kind (DC refinement reads raw bits only)
    for c in scan_order:
        if kind in ("baseline", "dc_first") and (0, c["td"]) not in huff:
            raise ValueError(f"missing DC huffman table {c['td']}")
        if kind in ("baseline", "ac_first", "ac_refine") and (
            (1, c["ta"]) not in huff
        ):
            raise ValueError(f"missing AC huffman table {c['ta']}")
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        c["pred"] = 0

    reader = _BitReader(payload, pos)
    state = {"eobrun": 0}
    mcus_x, mcus_y = frame["mcus_x"], frame["mcus_y"]

    def at_restart(m: int) -> None:
        if restart_interval and m and m % restart_interval == 0:
            reader.restart((m // restart_interval - 1) % 8)
            state["eobrun"] = 0
            for c in comps:
                c["pred"] = 0

    interleaved = ns > 1 or kind == "baseline"
    if interleaved:
        for m in range(mcus_x * mcus_y):
            at_restart(m)
            my, mx = divmod(m, mcus_x)
            for c in scan_order:
                for v in range(c["v"]):
                    for h in range(c["h"]):
                        blk = c["coef"][
                            my * c["v"] + v, mx * c["h"] + h
                        ].reshape(64)
                        if kind == "baseline":
                            _decode_baseline_block(reader, c, huff, blk)
                        elif kind == "dc_first":
                            blk[0] = _decode_dc_first(
                                reader, c, huff[(0, c["td"])], al
                            )
                        else:  # dc_refine
                            blk[0] |= reader.read_bit() << al
    else:
        # non-interleaved: the component's OWN data-unit grid (T.81
        # A.2) — smaller than the padded MCU grid when sampling pads
        c = scan_order[0]
        xw = -(-frame["width"] * c["h"] // frame["hmax"])
        yh = -(-frame["height"] * c["v"] // frame["vmax"])
        bw, bh = -(-xw // 8), -(-yh // 8)
        for m in range(bw * bh):
            at_restart(m)
            by, bx = divmod(m, bw)
            blk = c["coef"][by, bx].reshape(64)
            if kind == "dc_first":
                blk[0] = _decode_dc_first(reader, c, huff[(0, c["td"])], al)
            elif kind == "dc_refine":
                blk[0] |= reader.read_bit() << al
            elif kind == "ac_first":
                _decode_ac_first(
                    reader, huff[(1, c["ta"])], blk, ss, se, al, state
                )
            else:  # ac_refine
                _decode_ac_refine(
                    reader, huff[(1, c["ta"])], blk, ss, se, al, state
                )

    if kind in ("baseline", "dc_first"):
        for c in scan_order:
            c["dc_seen"] = True
    return _skip_to_marker(payload, reader._pos)


def decode_jpeg_pixels(payload: bytes) -> dict:
    """Full JPEG decode — baseline sequential (SOF0/SOF1) AND
    progressive (SOF2: spectral selection + successive approximation,
    T.81 Annex G) Huffman processes. Returns ``{"width", "height",
    "components", "pixels"}`` where pixels is the row-major interleaved
    RGB (3 components, JFIF BT.601 conversion) or grayscale (1
    component) raster as bytes — the same contract as ``decode_ppm``.
    See the module docstring for scope and refusal behavior."""
    if len(payload) < 4 or payload[0] != 0xFF or payload[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}  # id -> 64 values in NATURAL order
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> code table
    frame: dict | None = None
    restart_interval = 0
    scans_done = 0

    while True:
        if pos + 1 >= len(payload):
            if frame is not None and scans_done:
                break  # EOI lost but a full scan landed: render it
            raise ValueError("reached end of payload before SOS")
        if payload[pos] != 0xFF:
            raise ValueError(
                f"expected marker at {pos}, got {payload[pos]:#x}"
            )
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1  # optional fill bytes
        if pos >= len(payload):
            raise ValueError("reached end of payload before SOS")
        marker = payload[pos]
        pos += 1
        if marker in _STANDALONE:
            continue
        if marker == 0xD9:  # EOI
            if frame is None or not scans_done:
                raise ValueError("EOI before SOS (no image data)")
            break
        if pos + 2 > len(payload):
            raise ValueError("truncated segment length")
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        if seg_len < 2 or pos + seg_len > len(payload):
            raise ValueError(f"bad segment length {seg_len} at {pos}")
        body = payload[pos + 2 : pos + seg_len]

        if marker == 0xDB:  # DQT: one or more tables
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                n = 64 * (2 if pq == 1 else 1)
                if pq > 1 or b + n > len(body):
                    raise ValueError("malformed DQT segment")
                raw = (
                    struct.unpack(">64H", body[b : b + 128])
                    if pq == 1
                    else body[b : b + 64]
                )
                b += n
                tab = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    tab[ZIGZAG[k]] = raw[k]
                if (tab == 0).any():
                    raise ValueError("zero divisor in quantization table")
                qt[tq] = tab
        elif marker == 0xC4:  # DHT: one or more tables
            b = 0
            while b < len(body):
                if b + 17 > len(body):
                    raise ValueError("malformed DHT segment")
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                b += 17
                if tc > 1 or b + n > len(body):
                    raise ValueError("malformed DHT segment")
                huff[(tc, th)] = _build_huffman(bits, body[b : b + n])
                b += n
        elif marker in _SOF_ARITHMETIC:
            raise NotImplementedError(
                "arithmetic-coded JPEG is a different entropy coder; "
                "transcode to huffman or bind a native codec"
            )
        elif marker in _SOF_OTHER:
            raise ValueError(f"unsupported SOF marker 0xff{marker:02x}")
        elif marker in _SOF_BASELINE or marker in _SOF_PROGRESSIVE:
            if frame is not None:
                raise ValueError("multiple SOF frame headers")
            if len(body) < 6:
                raise ValueError("short SOF segment")
            precision = body[0]
            height, width = struct.unpack(">HH", body[1:5])
            nf = body[5]
            if precision != 8:
                raise ValueError(
                    f"{precision}-bit precision unsupported (8-bit only)"
                )
            if width == 0 or height == 0:
                raise ValueError(f"bad SOF geometry {width}x{height}")
            if width * height > MAX_JPEG_PIXELS:
                raise ValueError(
                    f"SOF geometry {width}x{height} exceeds the "
                    f"{MAX_JPEG_PIXELS}-pixel decode bound"
                )
            if nf not in (1, 3):
                raise ValueError(
                    f"{nf}-component JPEG unsupported (1=gray or 3=YCbCr; "
                    "4-component CMYK needs the Adobe transform tag)"
                )
            if len(body) < 6 + 3 * nf:
                raise ValueError("short SOF segment")
            comps = []
            for i in range(nf):
                ci, hv, tqi = body[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 4 and 1 <= v <= 4):
                    raise ValueError(f"bad sampling factors {h}x{v}")
                comps.append(
                    {
                        "id": ci,
                        "h": h,
                        "v": v,
                        "tq": tqi,
                        "pred": 0,
                        "dc_seen": False,
                    }
                )
            if nf == 1:
                # T.81 A.2: every scan of a single-component frame is
                # non-interleaved — one data unit per MCU over the
                # component's own ceil(w/8) x ceil(h/8) grid, its
                # declared sampling factors notwithstanding (they only
                # position it relative to OTHER components)
                comps[0]["h"] = comps[0]["v"] = 1
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    raise ValueError(
                        f"non-integral sampling ratio {c['h']}x{c['v']} "
                        f"vs max {hmax}x{vmax} unsupported"
                    )
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            for c in comps:
                # QUANTIZED coefficient store, one 8x8 block per
                # (block-row, block-col) of the padded MCU grid;
                # dequantization happens once at reconstruction
                c["coef"] = np.zeros(
                    (mcus_y * c["v"], mcus_x * c["h"], 8, 8),
                    dtype=np.int32,
                )
            frame = {
                "width": width,
                "height": height,
                "comps": comps,
                "progressive": marker in _SOF_PROGRESSIVE,
                "hmax": hmax,
                "vmax": vmax,
                "mcus_x": mcus_x,
                "mcus_y": mcus_y,
            }
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise ValueError("malformed DRI segment")
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("reached SOS without a SOF frame header")
            pos = _decode_scan(
                payload, pos + seg_len, body, frame, qt, huff,
                restart_interval,
            )
            scans_done += 1
            if not frame["progressive"]:
                break  # one full-band scan IS the whole baseline image
            continue
        pos += seg_len

    # every break out of the marker loop guarantees frame is set and at
    # least one scan decoded
    if frame["progressive"] and not all(
        c["dc_seen"] for c in frame["comps"]
    ):
        raise ValueError(
            "progressive stream ended before every component's DC scan"
        )
    comps = frame["comps"]
    width, height = frame["width"], frame["height"]
    hmax, vmax = frame["hmax"], frame["vmax"]

    # reconstruction keeps a strict memory diet: every float64
    # intermediate (8 B/pixel) is freed as soon as its uint8 form
    # (1 B/pixel) exists, so peak RSS stays ~2-3 float64 stages (~25
    # B/pixel) instead of every stage of every component living at once
    # (~70 B/pixel — 7 GB at the 100 MP guard)
    planes = []
    for c in comps:
        # dequantize the int32 store (exact int64 products), then
        # batched IDCT: (rows, cols, 8, 8) coefficient blocks through
        # the orthonormal basis in two einsums, stitched into a plane
        coef = c.pop("coef") * qt[c["tq"]].reshape(8, 8)
        br, bc = coef.shape[:2]
        spatial = np.einsum("ux,rcuv,vy->rcxy", _A, coef, _A, optimize=True)
        del coef
        plane = spatial.transpose(0, 2, 1, 3).reshape(br * 8, bc * 8)
        plane = (np.clip(np.round(plane) + 128, 0, 255)).astype(np.uint8)
        del spatial
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(
            hmax // c["h"], axis=1
        )
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        pixels = np.ascontiguousarray(planes[0]).tobytes()
    else:
        # channels one at a time (float64 math on the uint8 planes —
        # numpy upcasts — then straight back to uint8)
        y, cb, cr = planes
        cbf = cb.astype(np.float64) - 128.0
        crf = cr.astype(np.float64) - 128.0
        rgb = np.empty((height, width, 3), dtype=np.uint8)
        rgb[..., 0] = np.clip(np.round(y + 1.402 * crf), 0, 255)
        rgb[..., 1] = np.clip(
            np.round(y - 0.344136 * cbf - 0.714136 * crf), 0, 255
        )
        rgb[..., 2] = np.clip(np.round(y + 1.772 * cbf), 0, 255)
        pixels = rgb.tobytes()
    return {
        "width": width,
        "height": height,
        "components": len(planes),
        "pixels": pixels,
    }


# ------------------------------------------------------------- encoder --


def encode_jpeg_flat(
    width: int, height: int, y: int, cb: int, cr: int
) -> bytes:
    """Minimal REAL baseline JPEG writer for a flat-color image: 4:2:0
    YCbCr, all-8s quantization tables, two tiny canonical Huffman tables
    (9 DC categories, EOB/ZRL for AC). Because every block is DC-only
    and quant[0] == 8 cancels the orthonormal IDCT's 1/8, the decoded
    planes equal (y, cb, cr) EXACTLY — which is what makes JPEGs built
    here oracle-able: DuckDB can restate the expected pixels as the
    BT.601 clamp/round formula with no DCT math. Used by the oracled
    multimodal query and the test fixtures (the general-coefficient
    differential encoder lives test-side)."""
    for name, v in (("y", y), ("cb", cb), ("cr", cr)):
        if not 0 <= v <= 255:
            raise ValueError(f"{name}={v} outside 0..255")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError(f"bad geometry {width}x{height}")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0x00]) + bytes([8]) * 64)
    sof = seg(
        0xC0,
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # DC table 0: categories 0..8 as nine 4-bit codes (codes 0000..1000,
    # never all-ones); AC table 0: EOB='00', ZRL='01'
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes([0, 0, 0, 9] + [0] * 12) + bytes(range(9))
        + bytes([0x10]) + bytes([0, 2] + [0] * 14) + bytes([0x00, 0xF0]),
    )
    sos_hdr = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    bits: list[int] = []

    def put(code: int, n: int) -> None:
        bits.extend((code >> (n - 1 - i)) & 1 for i in range(n))

    def put_dc(diff: int) -> None:
        t = diff.bit_length() if diff else 0
        put(t, 4)  # category code: value t at length 4
        if t:
            put(diff if diff > 0 else diff + (1 << t) - 1, t)
        put(0b00, 2)  # EOB

    mcus_x = -(-width // 16)
    mcus_y = -(-height // 16)
    first = True
    for _ in range(mcus_x * mcus_y):
        for comp_val, n_blocks in ((y, 4), (cb, 1), (cr, 1)):
            for b in range(n_blocks):
                # flat image: every block's DC equals value-128, so only
                # the very first block of each component carries a diff
                put_dc((comp_val - 128) if first and b == 0 else 0)
        first = False
    while len(bits) % 8:
        bits.append(1)  # pad with 1-bits per F.1.2.3
    scan = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for bit in bits[i : i + 8]:
            byte = (byte << 1) | bit
        scan.append(byte)
        if byte == 0xFF:
            scan.append(0x00)  # byte stuffing
    return (
        b"\xff\xd8" + dqt + sof + dht + sos_hdr + bytes(scan) + b"\xff\xd9"
    )
