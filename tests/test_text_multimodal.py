"""L4 text analysis and L5 multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lcr_etl_upgrade_spark.operators.text import (
    fingerprint,
    language_id,
    quality_features,
    token_count_expr,
)


def test_token_count(spark):
    df = spark.createDataFrame([("one two  three",), ("solo",)], ["text"])
    got = [r.n for r in df.select(token_count_expr(F.col("text")).alias("n")).collect()]
    assert got == [3, 1]


def test_token_count_equals_array_size(spark):
    """regexp_count('\\S+') must equal size(tokens_expr(c)) on hostile
    edge shapes — pins the r6 no-array-materialization fast path to the
    array tokenization it replaced (NULL, empty, whitespace-only, edge
    whitespace, tabs/newlines, unicode, punctuation runs)."""
    from lcr_etl_upgrade_spark.operators.text import tokens_expr

    cases = [
        (None,), ("",), ("   ",), ("\t\n ",), ("a",), (" a ",),
        ("\none\ttwo  three\r\n",), ("a b",), ("a  b",),
        ("!!! ?? ..",), ("日本語 テスト",), ("mixed nbsp",),
        ("x " * 500,), (" em-space sep ",),
    ]
    df = spark.createDataFrame(cases, "text string")
    rows = df.select(
        token_count_expr(F.col("text")).alias("fast"),
        F.size(tokens_expr(F.col("text"))).cast("long").alias("arr"),
    ).collect()
    for r in rows:
        assert r.fast == r.arr, (r.fast, r.arr)


def test_quality_features(spark):
    df = spark.createDataFrame([("the cat, the dog!",)], ["text"])
    row = quality_features(df).collect()[0]
    assert row.n_tokens == 4
    assert row.stopword_ratio == 0.5  # "the" twice out of 4 tokens
    assert row.punct_ratio == pytest.approx(2 / 17)


def test_language_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is in the house and it is warm"),
            (1, "der hund ist nicht in das haus und die katze"),
            (2, "le chat est dans la maison et les chiens"),
            (3, "zzz qqq xxx"),  # no stopword hits anywhere
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr"
    assert got[3] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "different")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in fingerprint(df).collect()}
    assert rows[0].content_md5 != rows[1].content_md5        # raw differs
    assert rows[0].normalized_fp == rows[1].normalized_fp    # normalized equal
    assert rows[0].normalized_fp != rows[2].normalized_fp


def test_multimodal_feature_extraction(spark):
    from lcr_etl_upgrade_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
    )

    df = spark.createDataFrame(
        [(0, bytearray(b"payload-a")), (1, bytearray(b"payload-a")), (2, bytearray(b"payload-b"))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r.features for r in extract_features(df).collect()}
    assert len(got[0]) == FEATURE_DIM
    assert got[0] == got[1]            # deterministic: same bytes, same features
    assert got[0] != got[2]
    assert all(0.0 <= v < 1.0 for v in got[0])


def _jpeg_bytes(width: int, height: int, sof_marker: int = 0xC0) -> bytes:
    """Hand-assembled JPEG prefix: SOI + JFIF APP0 + SOFn with the given
    geometry (3 components, 8-bit precision). Golden values below are
    computed from these literal bytes, not from the decoder."""
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_body = (
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([3])
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"  # 3 component specs
    )
    sof = bytes([0xFF, sof_marker]) + (len(sof_body) + 2).to_bytes(2, "big") + sof_body
    return b"\xff\xd8" + app0 + sof


def test_jpeg_header_golden():
    from lcr_etl_upgrade_spark.operators.multimodal import decode_jpeg_header

    got = decode_jpeg_header(_jpeg_bytes(456, 123))
    assert got == {
        "width": 456, "height": 123, "components": 3,
        "precision": 8, "progressive": False,
    }
    # progressive (SOF2) and a 0xFF fill byte before the marker
    prog = _jpeg_bytes(16, 9, sof_marker=0xC2)
    prog = prog[:2] + b"\xff" + prog[2:]
    got2 = decode_jpeg_header(prog)
    assert (got2["width"], got2["height"], got2["progressive"]) == (16, 9, True)


def test_jpeg_header_malformed():
    from lcr_etl_upgrade_spark.operators.multimodal import decode_jpeg_header

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_header(b"PNG...")
    with pytest.raises(ValueError, match="no SOF|truncated"):
        decode_jpeg_header(b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9")
    # SOS before any SOF frame header
    with pytest.raises(ValueError, match="SOS"):
        decode_jpeg_header(b"\xff\xd8\xff\xda\x00\x04\x00\x00")
    # truncated SOF segment (declared length runs past the payload)
    with pytest.raises(ValueError, match="bad segment length"):
        decode_jpeg_header(_jpeg_bytes(456, 123)[:-5])
    # DHT (0xC4) shares the Cx range but is NOT a frame header
    dht_only = b"\xff\xd8\xff\xc4\x00\x04\x00\x00\xff\xd9"
    with pytest.raises(ValueError, match="no SOF"):
        decode_jpeg_header(dht_only)


def test_mp3_header_golden():
    from lcr_etl_upgrade_spark.operators.multimodal import decode_mp3_header

    # 0xFF 0xFB 0x90 0x00 = MPEG1 Layer III, bitrate idx 9 -> 128 kbps,
    # sample-rate idx 0 -> 44100 Hz, stereo; 1000 bytes at 128 kbps
    # -> 1000*8/128000 = 0.0625 s
    frame = b"\xff\xfb\x90\x00" + b"\x00" * 996
    got = decode_mp3_header(frame)
    assert got == {
        "version": "1", "layer": 3, "bitrate_kbps": 128,
        "sample_rate": 44100, "channels": 2, "est_duration_sec": 0.0625,
    }
    # ID3v2 tag (syncsafe size 257) skipped; 100 audio bytes remain
    id3 = b"ID3\x04\x00\x00\x00\x00\x02\x01" + b"\x00" * 257
    got2 = decode_mp3_header(id3 + b"\xff\xfb\x90\x00" + b"\x00" * 96)
    assert got2["est_duration_sec"] == pytest.approx(100 * 8 / 128000)
    # MPEG2 Layer III mono: 0xFF 0xF3, bitrate idx 2 -> 16 kbps,
    # sr idx 1 -> 24000, mode 3 (0xC0) -> mono
    got3 = decode_mp3_header(b"\xff\xf3\x24\xc0" + b"\x00" * 60)
    assert (got3["version"], got3["bitrate_kbps"], got3["sample_rate"],
            got3["channels"]) == ("2", 16, 24000, 1)


def test_mp3_header_malformed():
    from lcr_etl_upgrade_spark.operators.multimodal import decode_mp3_header

    with pytest.raises(ValueError, match="no MPEG frame sync"):
        decode_mp3_header(b"\x00" * 64)
    with pytest.raises(ValueError, match="bitrate index"):
        decode_mp3_header(b"\xff\xfb\xf0\x00")  # idx 15 = invalid
    with pytest.raises(ValueError, match="bitrate index"):
        decode_mp3_header(b"\xff\xfb\x00\x00")  # idx 0 = free-format
    with pytest.raises(ValueError, match="sample-rate"):
        decode_mp3_header(b"\xff\xfb\x9c\x00")  # sr idx 3 = reserved
    with pytest.raises(ValueError, match="layer"):
        decode_mp3_header(b"\xff\xf9\x90\x00")  # layer bits 00 = reserved
    with pytest.raises(ValueError, match="syncsafe"):
        decode_mp3_header(b"ID3\x04\x00\x00\xff\xff\xff\xff")


def test_media_features_jpeg_mp3_rows(spark):
    """extract_media_features routes JPEG/MP3 payloads through the
    metadata decoders inside mapInPandas; malformed rich payloads still
    yield NULL-kind rows, not task failures."""
    from lcr_etl_upgrade_spark.operators.multimodal import extract_media_features

    rows = [
        (0, bytearray(_jpeg_bytes(640, 480))),
        (1, bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 996)),
        (2, bytearray(b"\xff\xd8\xff\xda\x00\x04\x00\x00")),  # malformed JPEG
        (3, bytearray(b"ID3\x04\x00\x00\xff\xff\xff\xff")),   # malformed tag
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in extract_media_features(df).collect()}
    assert (got[0].kind, got[0].width, got[0].height, got[0].components) == (
        "image", 640, 480, 3
    )
    assert got[0].mean_c0 is None  # pixel stats stay behind the codec seam
    assert (got[1].kind, got[1].sample_rate, got[1].bitrate_kbps) == (
        "audio", 44100, 128
    )
    assert got[1].est_duration_sec == pytest.approx(0.0625)
    assert got[1].rms is None  # sample stats stay behind the codec seam
    assert got[2].kind is None and got[3].kind is None


def test_multimodal_raise_stub_marks_codec_seam(spark):
    from lcr_etl_upgrade_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(0, bytearray(b"x"))], "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        extract_features(df, decode_stub="raise").collect()


def test_frame_sample_stub(spark):
    from lcr_etl_upgrade_spark.operators.multimodal import frame_sample_stub

    df = spark.createDataFrame(
        [(0, (None, None, None, 4096))],
        "media_id long, meta struct<width:int,height:int,sample_rate:int,n_bytes:bigint>",
    )
    got = [r.frame_idx for r in frame_sample_stub(df, every_n=2).collect()]
    assert got == [0, 2]  # 4 'frames', every 2nd


def test_binary_file_source(spark, tmp_path):
    from lcr_etl_upgrade_spark.operators.multimodal import read_binary_files

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.bin").write_bytes(b"\x00\x01payload-a")
    (d / "b.bin").write_bytes(b"payload-b")
    (d / "skip.txt").write_bytes(b"nope")
    df = read_binary_files(spark, str(d), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert rows["a.bin"] == b"\x00\x01payload-a"


# --------------------------------------------------------------------------
# Real dependency-free codecs (PPM / WAV) — roundtrip + malformed goldens
# --------------------------------------------------------------------------


def test_ppm_codec_roundtrip():
    from lcr_etl_upgrade_spark.operators.multimodal import decode_ppm, encode_ppm

    px = bytes(range(2 * 2 * 3))
    img = decode_ppm(encode_ppm(2, 2, px))
    assert (img["width"], img["height"], img["maxval"]) == (2, 2, 255)
    assert img["pixels"] == px
    # comments in the header are part of the P6 grammar
    with_comment = b"P6\n# a comment\n2 2\n255\n" + px
    assert decode_ppm(with_comment)["pixels"] == px


def test_wav_codec_roundtrip():
    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    samples = [0, 1000, -1000, 32767, -32768]
    wav = decode_wav(encode_wav_pcm16(44100, samples))
    assert wav["sample_rate"] == 44100
    assert wav["n_channels"] == 1
    assert list(wav["samples"]) == samples
    # unknown chunks before fmt/data are skipped (word-aligned walk)
    raw = encode_wav_pcm16(8000, [7, -7])
    extra = b"RIFF" + raw[4:8] + b"WAVE" + b"LIST\x03\x00\x00\x00abc\x00" + raw[12:]
    assert list(decode_wav(extra)["samples"]) == [7, -7]


def test_malformed_payload_goldens():
    """Every malformation class raises ValueError from the parsers and
    becomes an all-NULL feature row (never a task failure) through
    _media_features_one."""
    import pytest

    from lcr_etl_upgrade_spark.operators.multimodal import (
        _media_features_one,
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav_pcm16,
    )

    good_ppm = encode_ppm(2, 2, bytes(12))
    good_wav = encode_wav_pcm16(8000, [1, 2, 3])
    bad = {
        "wrong_magic": b"JUNK" + good_ppm[2:],
        "truncated_ppm_header": b"P6\n2 ",
        "ppm_maxval_overflow": b"P6\n2 2\n65535\n" + bytes(24),
        "ppm_short_raster": good_ppm[:-3],
        "wav_bad_preamble": b"RIFF\x00\x00\x00\x00WAVX" + good_wav[12:],
        "wav_truncated_chunk": good_wav[:-2],
        "wav_missing_data": good_wav[: 12 + 8 + 16],
    }
    for name, payload in bad.items():
        with pytest.raises(ValueError):
            if name.startswith("wav"):
                decode_wav(payload)
            else:
                decode_ppm(payload)
        feats = _media_features_one(payload)
        assert feats["kind"] is None, name
        assert all(v is None for v in feats.values()), name
    # non-PCM compression code is rejected too
    import struct as _struct

    non_pcm = bytearray(good_wav)
    non_pcm[20:22] = _struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError, match="PCM-16"):
        decode_wav(bytes(non_pcm))

    # zero-channel fmt chunk must raise ValueError, not ZeroDivisionError
    # (anything but ValueError would escape _media_features_one and kill
    # the executor task)
    zero_chan = bytearray(good_wav)
    zero_chan[22:24] = _struct.pack("<H", 0)
    with pytest.raises(ValueError, match="zero channels"):
        decode_wav(bytes(zero_chan))
    assert _media_features_one(bytes(zero_chan))["kind"] is None

    # '<I' sample rate past int32: the feature schema declares int32, so
    # a structurally valid WAV with rate 0xFFFFFFFF must classify as
    # malformed here, not blow up later in Arrow conversion
    huge_rate = bytearray(good_wav)
    huge_rate[24:28] = _struct.pack("<I", 0xFFFFFFFF)
    with pytest.raises(ValueError, match="implausible sample rate"):
        decode_wav(bytes(huge_rate))
    assert _media_features_one(bytes(huge_rate))["kind"] is None

    # same for PPM header ints (unbounded ASCII) vs the int32 schema
    wide = b"P6\n2147483648 1\n255\n" + bytes(12)
    with pytest.raises(ValueError, match="implausible PPM dimensions"):
        decode_ppm(wide)
    assert _media_features_one(wide)["kind"] is None


def test_zero_sample_wav_is_valid_audio():
    """A structurally valid WAV with an empty data chunk classifies as
    audio with n_samples=0 (extrema/rms NULL) — not as malformed."""
    from lcr_etl_upgrade_spark.operators.multimodal import (
        _media_features_one,
        encode_wav_pcm16,
    )

    feats = _media_features_one(encode_wav_pcm16(8000, []))
    assert feats["kind"] == "audio"
    assert feats["sample_rate"] == 8000
    assert feats["n_samples"] == 0
    assert feats["vmin"] is None and feats["vmax"] is None
    assert feats["rms"] is None


def test_extract_media_features_mixed_batch(spark):
    """The mapInPandas path decodes a mixed image/audio/malformed batch
    into typed rows; malformed -> NULL kind."""
    from lcr_etl_upgrade_spark.operators.multimodal import (
        encode_ppm,
        encode_wav_pcm16,
        extract_media_features,
    )

    rows = [
        (1, encode_ppm(2, 1, bytes([10, 20, 30, 40, 50, 60]))),
        (2, encode_wav_pcm16(16000, [100, -100, 300, -300])),
        (3, b"not media at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in extract_media_features(df).collect()}
    img = got[1]
    assert (img.kind, img.width, img.height) == ("image", 2, 1)
    assert (img.mean_c0, img.mean_c1, img.mean_c2) == (25.0, 35.0, 45.0)
    assert (img.vmin, img.vmax) == (10, 60)
    aud = got[2]
    assert (aud.kind, aud.sample_rate, aud.n_samples) == ("audio", 16000, 4)
    assert (aud.vmin, aud.vmax) == (-300, 300)
    assert abs(aud.rms - (100**2 * 2 + 300**2 * 2) ** 0.5 / 2) < 1e-9
    assert got[3].kind is None and got[4].kind is None


def test_token_count_empty_and_edge_whitespace(spark):
    """Empty / whitespace-only text counts 0 tokens (split('') yields
    ['']); leading newlines never create phantom tokens; avg_token_len
    is the true mean token length, not the length-arithmetic shortcut
    that inflated on padded text."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\n\t"), (4, " a "), (5, "a\t\tb")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.avg_token_len)
        for r in quality_features(df)
        .select("doc_id", "n_tokens", "avg_token_len")
        .collect()
    }
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)
    assert got[3] == (0, 0.0)
    assert got[4] == (1, 1.0)  # was 3.0 under the length shortcut
    assert got[5] == (2, 1.0)  # was 1.5


def test_extract_features_rejects_unknown_stub(spark):
    """A typo at the decode seam must fail fast, not silently return
    hash-based fake features that look like model output."""
    from lcr_etl_upgrade_spark.operators.multimodal import extract_features

    df = spark.createDataFrame([(1, b"x")], "media_id long, payload binary")
    with pytest.raises(ValueError, match="decode_stub"):
        extract_features(df, decode_stub="real")


def test_frame_sample_rejects_nonpositive_step(spark):
    from lcr_etl_upgrade_spark.operators.multimodal import frame_sample_stub

    df = spark.createDataFrame([(1,)], "media_id long")
    with pytest.raises(ValueError, match="every_n"):
        frame_sample_stub(df, every_n=0)


# ---- decoder totality: only ValueError may escape -----------------------
# _media_features_one catches ValueError ONLY; any other exception type
# from a decoder would kill the executor task instead of yielding a
# NULL-feature row. Fuzz random and mutated-valid payloads through every
# container decoder.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _decoders():
    from lcr_etl_upgrade_spark.operators import multimodal as mm

    from lcr_etl_upgrade_spark.png_lite import decode_png

    return [mm.decode_ppm, mm.decode_wav, mm.decode_jpeg_header,
            mm.decode_mp3_header, mm.decode_y4m_header, decode_png]


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payload=st.binary(min_size=0, max_size=400))
def test_media_decoders_total_on_random_bytes(payload):
    for dec in _decoders():
        try:
            dec(payload)
        except ValueError:
            pass  # the one permitted failure mode


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    pos=st.integers(min_value=0, max_value=60),
    byte=st.integers(min_value=0, max_value=255),
    which=st.integers(min_value=0, max_value=3),
)
def test_media_decoders_total_on_mutated_valid(pos, byte, which):
    """Single-byte mutations of VALID containers (the adversarial corrupt
    case: right magic, broken interior) must also decode or ValueError —
    all FOUR container formats used as mutation bases."""
    from lcr_etl_upgrade_spark.operators.multimodal import (
        encode_ppm,
        encode_wav_pcm16,
    )

    base = [
        _jpeg_bytes(8, 4),
        b"\xff\xfb\x90\x00" + b"\x00" * 60,
        encode_ppm(2, 2, bytes(12)),
        encode_wav_pcm16(8000, [0, 1, -1]),
    ][which]
    mutated = bytearray(base)
    mutated[pos % len(mutated)] = byte
    for dec in _decoders():
        try:
            dec(bytes(mutated))
        except ValueError:
            pass


# ---- Gopher-style repetition / quality filtering -------------------------


def test_repetition_features_goldens(spark):
    from lcr_etl_upgrade_spark.operators.text import repetition_features

    doc = "intro line\n- bullet one\n- bullet one\nmore text...\n\nsecond para"
    rows = [
        (0, doc),
        (1, ""),           # empty -> zero lines, zero ratios
        (2, None),         # NULL -> NULL features
        (3, "a\na\na\na"),  # maximal line repetition
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r for r in repetition_features(df).collect()}
    r0 = got[0]
    # 5 non-empty lines, one exact repeat -> 1 - 4/5
    assert r0.n_lines == 5
    assert r0.dup_line_ratio == pytest.approx(0.2)
    # paragraphs: the \n\n split yields 2, both distinct
    assert r0.dup_paragraph_ratio == 0.0
    assert r0.bullet_line_ratio == pytest.approx(2 / 5)
    assert r0.ellipsis_line_ratio == pytest.approx(1 / 5)
    # longest line "- bullet one" = 12 chars of 10+12+12+12+11=57
    assert r0.longest_line_frac == pytest.approx(12 / 57)
    assert got[1].n_lines == 0 and got[1].dup_line_ratio == 0.0
    assert got[2].n_lines is None and got[2].dup_line_ratio is None
    assert got[3].dup_line_ratio == pytest.approx(0.75)


def test_gopher_quality_flag(spark):
    from lcr_etl_upgrade_spark.operators.text import gopher_quality_flag

    good = (
        "The quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field while the sun is high in the clear sky. "
    ) * 3  # ~60 tokens of normal English prose
    rows = [
        (0, good),
        (1, "too short"),                          # token-count floor
        (2, "#### " * 60),                         # symbol ratio + no alpha
        (3, None),                                 # NULL -> False, not NULL
        (4, "12 34 56 78 90 " * 20),               # numeric: alpha-ratio fail
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.passes_gopher for r in gopher_quality_flag(df).collect()}
    assert got == {0: True, 1: False, 2: False, 3: False, 4: False}
    # thresholds are overridable: drop the floor and the short doc passes
    relaxed = {
        r.id: r.passes_gopher
        for r in gopher_quality_flag(
            df, min_tokens=2, min_stopword_hits=0, min_avg_token_len=0.0
        ).collect()
    }
    assert relaxed[1] is True


def test_gopher_flag_is_shuffle_free(spark):
    """The flag must evaluate at scan speed: no exchange, no Python eval
    in the plan when used as a filter."""
    from lcr_etl_upgrade_spark.operators.text import gopher_quality_flag

    df = spark.createDataFrame([(0, "text here")], "id long, text string")
    out = gopher_quality_flag(df).filter(F.col("passes_gopher"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=" \t\n\r.…#-*•0123456789abcdefTHEandofX…é",
            max_size=60,
        ),
        max_size=5,
    )
)
def test_gopher_regexp_signals_match_array_formulation(spark, texts):
    """The regexp_count formulations of alpha-word and stopword-hit
    counts (r7 scale rewrite) must equal the per-token array-filter
    formulation on hostile whitespace/punctuation mixes."""
    from lcr_etl_upgrade_spark.operators.text import (
        LANG_STOPWORDS,
        tokens_expr,
    )

    rows = [(i, t) for i, t in enumerate(texts)] or [(0, "")]
    df = spark.createDataFrame(rows, ["i", "text"])
    c = F.col("text")
    toks = tokens_expr(c)
    from lcr_etl_upgrade_spark.operators.text import stopword_hits_expr

    n_tokens = F.regexp_count(c, F.lit(r"\S+"))
    letterless = F.regexp_count(
        c, F.lit(r"(?<!\S)[^\sA-Za-zÀ-ɏ]++(?!\S)")
    )
    got = df.select(
        "i",
        (n_tokens - letterless).alias("alpha_re"),
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-zÀ-ɏ]"))).alias(
            "alpha_arr"
        ),
        stopword_hits_expr(c, LANG_STOPWORDS["en"]).alias("stop_re"),
        F.size(
            F.filter(
                tokens_expr(F.lower(c)),
                lambda t: t.isin(*LANG_STOPWORDS["en"]),
            )
        ).alias("stop_arr"),
    ).collect()
    for r in got:
        assert r.alpha_re == r.alpha_arr, (texts[r.i], r)
        assert r.stop_re == r.stop_arr, (texts[r.i], r)


def test_repetition_bullet_ellipsis_tab_edges(spark):
    """The (?m) regex counters fix two F.trim/F.rtrim space-only
    accidents: a bullet whose tail is only a tab does NOT count, and an
    ellipsis followed by a trailing tab DOES."""
    from lcr_etl_upgrade_spark.operators.text import repetition_features

    rows = [
        (1, "- item one\n-\t\nplain line"),       # 1 bullet of 3 lines
        (2, "ends with dots...\t\nanother...x"),  # 1 ellipsis of 2 lines
    ]
    df = spark.createDataFrame(rows, ["i", "text"])
    got = {
        r.i: r
        for r in repetition_features(df).collect()
    }
    assert got[1].n_lines == 3
    assert abs(got[1].bullet_line_ratio - 1 / 3) < 1e-9
    assert got[2].n_lines == 2
    assert abs(got[2].ellipsis_line_ratio - 1 / 2) < 1e-9


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=" \t\n的是了在我und der die le la el los que"
            "toinisaofthe我有和.x",
            max_size=50,
        ),
        max_size=4,
    )
)
def test_stopword_hits_regex_matches_isin_all_languages(spark, texts):
    """stopword_hits_expr == per-token isin for every LANG_STOPWORDS
    entry, including the CJK lists (no whitespace segmentation)."""
    from lcr_etl_upgrade_spark.operators.text import (
        LANG_STOPWORDS,
        stopword_hits_expr,
        tokens_expr,
    )

    rows = [(i, t) for i, t in enumerate(texts)] or [(0, "")]
    df = spark.createDataFrame(rows, ["i", "text"])
    c = F.col("text")
    def arr_hits(sw):
        # factory: a default-arg lambda would change arity and bind the
        # 2-arg (element, index) filter form
        return F.size(F.filter(tokens_expr(F.lower(c)), lambda t: t.isin(*sw)))

    cols = []
    for lang, sw in LANG_STOPWORDS.items():
        cols.append(stopword_hits_expr(c, sw).alias(f"re_{lang}"))
        cols.append(arr_hits(sw).alias(f"arr_{lang}"))
    got = df.select("i", *cols).collect()
    for r in got:
        for lang in LANG_STOPWORDS:
            assert r[f"re_{lang}"] == r[f"arr_{lang}"], (texts[r.i], lang, r)


def test_repetition_cr_terminated_text_ratio_bounded(spark):
    """Lone-\\r line terminators: (?md) anchors only at \\n, matching the
    \\n-split that defines n_lines — the ratios can never exceed 1.0
    (review finding r7)."""
    from lcr_etl_upgrade_spark.operators.text import repetition_features

    rows = [(1, "a...\rb...\rc..."), (2, "x\r- item y")]
    got = {r.i: r for r in repetition_features(
        spark.createDataFrame(rows, ["i", "text"])).collect()}
    assert got[1].n_lines == 1
    assert got[1].ellipsis_line_ratio == 1.0  # whole (single) line ends ...
    assert got[2].n_lines == 1
    assert got[2].bullet_line_ratio == 0.0  # \r does not start a new line


def test_stopword_hits_expr_contracts(spark):
    """Metacharacter stopwords count literally; empty lists refuse."""
    from lcr_etl_upgrade_spark.operators.text import stopword_hits_expr

    df = spark.createDataFrame(
        [("i know c++ and a bit of c",)], ["text"]
    )
    got = df.select(
        stopword_hits_expr(F.col("text"), ("c++",)).alias("h")
    ).collect()[0].h
    assert got == 1
    with pytest.raises(ValueError, match="at least one stopword"):
        stopword_hits_expr(F.col("text"), ())
    # a whitespace-split token can never EQUAL a whitespace-containing
    # or empty stopword: isin counts 0 where the regex would match
    # across token boundaries / zero-width everywhere — refused
    # (review finding r7 pass 3)
    with pytest.raises(ValueError, match="whitespace-free"):
        stopword_hits_expr(F.col("text"), ("a b",))
    with pytest.raises(ValueError, match="whitespace-free"):
        stopword_hits_expr(F.col("text"), ("the", ""))


def test_gopher_letterless_regex_linear_on_huge_numeric_token(spark):
    """A 200 KB digit-only token must evaluate in bounded time — the
    possessive letterless pattern scans linearly where \\S*[letter]\\S*
    backtracks quadratically (review finding r7)."""
    import time

    from lcr_etl_upgrade_spark.operators.text import gopher_quality_flag

    big = "start " + "9" * 200_000 + " end"
    df = spark.createDataFrame([(1, big)], ["i", "text"])
    t0 = time.perf_counter()
    row = gopher_quality_flag(df).select("passes_gopher").collect()[0]
    assert time.perf_counter() - t0 < 30
    assert row.passes_gopher is False  # avg token len way over bound


def test_repetition_features_reserved_column_clash_raises(spark):
    from lcr_etl_upgrade_spark.operators.text import repetition_features

    df = spark.createDataFrame([("x", "y")], ["text", "__rep_lines"])
    with pytest.raises(ValueError, match="reserves column names"):
        repetition_features(df)


def test_media_features_full_jpeg_pixel_stats_and_fallbacks():
    """JPEG payloads inside jpeg_lite's baseline scope get REAL pixel
    statistics (channel means, extrema); a header-only SOF stream and a
    progressive file keep metadata-level geometry instead of failing."""
    from lcr_etl_upgrade_spark.jpeg_lite import encode_jpeg_flat
    from lcr_etl_upgrade_spark.operators.multimodal import (
        _media_features_one,
    )

    feats = _media_features_one(encode_jpeg_flat(10, 6, 200, 30, 99))
    # flat (200, 30, 99) -> BT.601 (159, 254, 26), exact (see jpeg_lite)
    assert feats["kind"] == "image"
    assert (feats["width"], feats["height"], feats["components"]) == (10, 6, 3)
    assert (feats["mean_c0"], feats["mean_c1"], feats["mean_c2"]) == (
        159.0,
        254.0,
        26.0,
    )
    assert (feats["vmin"], feats["vmax"]) == (26, 254)

    # header-only stream (SOI+SOF, no scan): geometry, NULL pixel stats
    hdr_only = _jpeg_bytes(456, 123)
    f2 = _media_features_one(hdr_only)
    assert f2["kind"] == "image"
    assert (f2["width"], f2["height"]) == (456, 123)
    assert f2["mean_c0"] is None and f2["vmin"] is None

    # a header-only progressive (SOF2) stream has no scan to decode:
    # the pixel stage's ValueError must downgrade to metadata features,
    # not kill the task (full progressive decode is covered in
    # tests/test_jpeg_lite.py)
    prog = hdr_only.replace(b"\xff\xc0", b"\xff\xc2")
    f3 = _media_features_one(prog)
    assert f3["kind"] == "image" and f3["mean_c0"] is None


def test_synth_jpeg_color_formula_has_no_rounding_ties():
    """The oracled multimodal query relies on numpy's round (banker's)
    agreeing with SQL ROUND (half away from zero) for the 50 synthetic
    flat JPEGs — true iff no BT.601 channel value lands exactly on .5.
    Pin that property for every id the query generates."""
    for d in range(0, 200):
        if d % 4 != 2:
            continue
        y, cb, cr = (d * 5) % 256, (d * 3) % 256, (d * 11) % 256
        for v in (
            y + 1.402 * (cr - 128),
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
            y + 1.772 * (cb - 128),
        ):
            frac = abs(v - int(v))
            assert abs(frac - 0.5) > 1e-9, (d, v)


def test_resize_images_real(spark):
    """resize_images decodes PPM/JPEG for real, resamples, re-encodes
    PPM: nearest is a pure index map (golden), area is an exact box
    mean on integer factors, non-images yield NULL payloads."""
    import numpy as np

    from lcr_etl_upgrade_spark.jpeg_lite import encode_jpeg_flat
    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_images,
    )

    # 4x4 with four constant 2x2 quadrants -> area 2x2 = quadrant values
    quad = np.zeros((4, 4, 3), dtype=np.uint8)
    quad[:2, :2], quad[:2, 2:], quad[2:, :2], quad[2:, 2:] = 10, 40, 90, 200
    src = encode_ppm(4, 4, quad.tobytes())
    wav_like = b"RIFF????WAVE"  # non-image magic
    df = spark.createDataFrame(
        [(0, bytearray(src)),
         (1, bytearray(encode_jpeg_flat(10, 6, 200, 30, 99))),
         (2, bytearray(wav_like)),
         (3, None),
         (4, bytearray(b"\xff\xd8\xff\xd9"))],  # malformed JPEG
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in resize_images(df, 2, 2).collect()}
    img0 = decode_ppm(bytes(out[0].payload))
    a0 = np.frombuffer(img0["pixels"], np.uint8).reshape(2, 2, 3)
    assert [int(a0[0, 0, 0]), int(a0[0, 1, 0]), int(a0[1, 0, 0]),
            int(a0[1, 1, 0])] == [10, 40, 90, 200]
    assert out[0].meta.width == 2 and out[0].meta.n_bytes == len(out[0].payload)
    # flat JPEG resizes to the same flat BT.601 color at any size
    a1 = np.frombuffer(
        decode_ppm(bytes(out[1].payload))["pixels"], np.uint8
    ).reshape(2, 2, 3)
    assert {tuple(v) for row in a1 for v in row} == {(159, 254, 26)}
    # non-image / NULL / malformed -> NULL payload AND NULL meta
    for mid in (2, 3, 4):
        assert out[mid].payload is None and out[mid].meta is None


def test_resize_area_matches_naive_2d_oracle():
    """Separable box resample equals the direct 2D overlap-weighted
    mean for arbitrary (non-integer) ratios."""
    import numpy as np

    from lcr_etl_upgrade_spark.operators.multimodal import _resample_rgb

    rng = np.random.default_rng(31)
    arr = rng.integers(0, 256, size=(7, 11, 3)).astype(np.uint8)
    dh, dw = 3, 4

    def naive(arr, dh, dw):
        sh, sw = arr.shape[:2]
        out = np.zeros((dh, dw, 3))
        for i in range(dh):
            for j in range(dw):
                ly, hy = i * sh / dh, (i + 1) * sh / dh
                lx, hx = j * sw / dw, (j + 1) * sw / dw
                acc = np.zeros(3)
                wsum = 0.0
                for y in range(int(ly), int(np.ceil(hy))):
                    for x in range(int(lx), int(np.ceil(hx))):
                        w = (min(hy, y + 1) - max(ly, y)) * (
                            min(hx, x + 1) - max(lx, x)
                        )
                        acc += w * arr[y, x]
                        wsum += w
                out[i, j] = acc / wsum
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    got = _resample_rgb(arr, dh, dw, "area")
    np.testing.assert_array_equal(got, naive(arr, dh, dw))


def test_resize_nearest_upscale_golden():
    import numpy as np

    from lcr_etl_upgrade_spark.operators.multimodal import _resample_rgb

    arr = np.array([[[1, 1, 1], [2, 2, 2]],
                    [[3, 3, 3], [4, 4, 4]]], dtype=np.uint8)
    up = _resample_rgb(arr, 4, 4, "nearest")
    assert up[0, 0, 0] == 1 and up[0, 3, 0] == 2
    assert up[3, 0, 0] == 3 and up[3, 3, 0] == 4
    # each source pixel replicates into a 2x2 block
    assert (up[:2, :2, 0] == 1).all() and (up[2:, 2:, 0] == 4).all()


def _y4m(width, height, frames, cs=b"C420", fps=b"F25:1"):
    """Hand-build a YUV4MPEG2 stream: frames is a list of (y, cb, cr)
    plane byte tuples (cb/cr omitted for mono)."""
    out = b"YUV4MPEG2 W%d H%d " % (width, height) + fps + b" " + cs + b"\n"
    for planes in frames:
        out += b"FRAME\n" + b"".join(planes)
    return out


def test_y4m_header_and_frame_goldens():
    """Hand-composed YUV4MPEG2 bytes: header grammar, frame walk,
    studio-swing Rec.601 conversion (Y=16 -> 0, Y=235 -> 255, gray when
    Cb=Cr=128), truncation/colorspace/odd-dim refusals."""
    import numpy as np

    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_ppm,
        decode_y4m_header,
        y4m_frame_to_ppm,
    )

    w, h = 4, 2
    cbcr = bytes([128] * ((w // 2) * (h // 2)))
    f0 = (bytes([16] * (w * h)), cbcr, cbcr)
    f1 = (bytes([235] * (w * h)), cbcr, cbcr)
    f2 = (bytes([126] * (w * h)), cbcr, cbcr)
    payload = _y4m(w, h, [f0, f1, f2])
    info = decode_y4m_header(payload)
    assert (info["width"], info["height"], info["n_frames"]) == (4, 2, 3)
    assert info["fps"] == (25, 1)
    for idx, want in [(0, 0), (1, 255), (2, 128)]:  # (126-16)*255/219
        ppm = decode_ppm(y4m_frame_to_ppm(payload, info, idx))
        px = set(ppm["pixels"])
        assert px == {want}, (idx, px)

    # mono colorspace: single plane, grayscale replicated to RGB
    mono = _y4m(2, 2, [(bytes([16, 126, 235, 16]),)], cs=b"Cmono")
    mi = decode_y4m_header(mono)
    mp = decode_ppm(y4m_frame_to_ppm(mono, mi, 0))
    arr = np.frombuffer(mp["pixels"], np.uint8).reshape(2, 2, 3)
    assert [int(v) for v in arr[0, :, 0]] == [0, 128]

    # refusals: truncated frame, unknown colorspace, odd dims with 420
    with pytest.raises(ValueError, match="truncated y4m frame"):
        decode_y4m_header(payload[:-1])
    with pytest.raises(ValueError, match="unsupported y4m colorspace"):
        decode_y4m_header(_y4m(4, 2, [], cs=b"C411"))
    with pytest.raises(ValueError, match="odd geometry"):
        decode_y4m_header(_y4m(3, 2, []))
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m_header(b"P6 1 1 255 x")


def test_y4m_chroma_conversion_vs_spec_derivation():
    """A colored 4:2:0 frame must match the Rec.601 studio-swing
    matrix derived in the test from Kr/Kb and the 219/224 excursions."""
    import numpy as np

    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_ppm,
        decode_y4m_header,
        y4m_frame_to_ppm,
    )

    w, h = 2, 2
    y, cb, cr = 81, 90, 240  # "red-ish" studio-swing triple
    payload = _y4m(w, h, [(bytes([y] * 4), bytes([cb]), bytes([cr]))])
    info = decode_y4m_header(payload)
    arr = np.frombuffer(
        decode_ppm(y4m_frame_to_ppm(payload, info, 0))["pixels"], np.uint8
    ).reshape(2, 2, 3)
    kr, kb = 0.299, 0.114
    kg = 1 - kr - kb
    y_ = (y - 16) * 255 / 219
    pb, pr = (cb - 128) * 255 / 224, (cr - 128) * 255 / 224
    want = [
        min(255, max(0, round(y_ + 2 * (1 - kr) * pr))),
        min(255, max(0, round(
            y_ - 2 * (1 - kb) * kb / kg * pb - 2 * (1 - kr) * kr / kg * pr
        ))),
        min(255, max(0, round(y_ + 2 * (1 - kb) * pb))),
    ]
    assert [int(v) for v in arr[0, 0]] == want


def test_sample_video_frames_real(spark):
    """Every-nth Y4M frame lands as a PPM row; inputs yielding no frames
    (non-Y4M, NULL payload) emit one (media_id, NULL, NULL) marker row
    so inputs-vs-outputs accounting holds (the r7 asymmetry nit)."""
    import numpy as np

    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_ppm,
        sample_video_frames,
    )

    w, h = 4, 2
    cbcr = bytes([128] * 2)
    frames = [
        (bytes([16 + 20 * i] * (w * h)), cbcr, cbcr) for i in range(5)
    ]
    df = spark.createDataFrame(
        [(0, bytearray(_y4m(w, h, frames))), (1, bytearray(b"not video")),
         (2, None)],
        "media_id long, payload binary",
    )
    out = sample_video_frames(df, every_n=2)
    rows = sorted(
        out.collect(),
        key=lambda r: (r.media_id, -1 if r.frame_idx is None else r.frame_idx),
    )
    assert [(r.media_id, r.frame_idx) for r in rows] == [
        (0, 0), (0, 2), (0, 4), (1, None), (2, None)
    ]
    assert rows[3].frame is None and rows[4].frame is None
    # every input id appears in the output (the accounting invariant)
    assert {r.media_id for r in rows} == {0, 1, 2}
    # frame 2's luma is 16+40 -> (40)*255/219 = 46.58 -> 47
    px = set(decode_ppm(bytes(rows[1].frame))["pixels"])
    assert px == {47}
    with pytest.raises(ValueError, match="every_n"):
        sample_video_frames(df, every_n=0)


def test_media_features_video_row():
    from lcr_etl_upgrade_spark.operators.multimodal import (
        _media_features_one,
    )

    w, h = 4, 2
    cbcr = bytes([128] * 2)
    payload = _y4m(w, h, [(bytes([100] * 8), cbcr, cbcr)] * 3)
    f = _media_features_one(payload)
    assert f["kind"] == "video"
    assert (f["width"], f["height"], f["n_samples"]) == (4, 2, 3)
    # malformed video -> all-NULL row, not a task failure
    assert _media_features_one(payload[:-2])["kind"] is None


def test_resample_audio_real(spark):
    """resample_audio decodes WAV, downmixes to mono, linearly
    resamples, re-encodes: goldens for up/down/identity rates and
    stereo downmix; non-audio payloads yield NULL rows."""
    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
        resample_audio,
    )

    up_src = encode_wav_pcm16(8000, [0, 100])
    down_src = encode_wav_pcm16(16000, [0, 10, 20, 30])
    stereo = encode_wav_pcm16(8000, [10, 20, -10, -30], n_channels=2)
    df = spark.createDataFrame(
        [(0, bytearray(up_src)), (1, bytearray(down_src)),
         (2, bytearray(stereo)), (3, bytearray(b"P6 not audio")),
         (4, None), (5, bytearray(up_src[:-3]))],
        "media_id long, payload binary",
    )
    # upsample 8k -> 16k: positions [0, .5, 1, 1.5] over [0, 100]
    out = {r.media_id: r for r in resample_audio(df, 16000).collect()}
    w0 = decode_wav(bytes(out[0].payload))
    assert w0["sample_rate"] == 16000 and w0["n_channels"] == 1
    assert list(w0["samples"]) == [0, 50, 100, 100]
    assert out[0].meta.sample_rate == 16000
    # stereo downmix at identity rate needs a second call (16k != 8k
    # here would interpolate); check downmix means exactly
    out8 = {r.media_id: r for r in resample_audio(df, 8000).collect()}
    w2 = decode_wav(bytes(out8[2].payload))
    assert list(w2["samples"]) == [15, -20]
    # downsample 16k -> 8k: positions [0, 2]
    w1 = decode_wav(bytes(out8[1].payload))
    assert list(w1["samples"]) == [0, 20]
    # non-audio / NULL / truncated -> NULL payload and NULL meta
    for mid in (3, 4, 5):
        assert out[mid].payload is None and out[mid].meta is None
    with pytest.raises(ValueError, match="target rate"):
        resample_audio(df, 0)


def test_resample_audio_degenerate_inputs_yield_null_not_death(spark):
    """Review findings (r7 pass 5): zero declared rate (ZeroDivision),
    hostile 1 Hz rate with many samples (np.arange blowup), and a
    u32-overflowing byte rate must all land as NULL rows — only
    ValueError is the sanctioned malformation signal."""
    import struct as _struct

    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
        resample_audio,
    )

    good = encode_wav_pcm16(8000, [1, 2, 3])
    zero_rate = bytearray(good)
    zero_rate[24:28] = _struct.pack("<I", 0)
    with pytest.raises(ValueError, match="zero sample rate"):
        decode_wav(bytes(zero_rate))
    # 10,000 frames at a declared "1 Hz": resampling to 16 kHz would
    # demand 160M output samples, past the 1<<27 blowup guard
    one_hz = bytearray(encode_wav_pcm16(8000, list(range(10000))))
    one_hz[24:28] = _struct.pack("<I", 1)
    # stereo WAV whose rate field is patched to 2**30+1 post-encode
    # (the encoder itself refuses to build such a header)
    huge_rate = bytearray(encode_wav_pcm16(8000, [5, 6], n_channels=2))
    huge_rate[24:28] = _struct.pack("<I", 2**30 + 1)
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, zero_rate), (2, one_hz),
         (3, huge_rate)],
        "media_id long, payload binary",
    )
    out = {r.media_id: r.payload for r in resample_audio(df, 16000).collect()}
    assert out[0] is not None
    assert out[1] is None and out[2] is None
    # id 3: mono=False keeps 2 channels; byte rate 2*(2**30+1)*2 > u32
    out2 = {
        r.media_id: r.payload
        for r in resample_audio(df, 2**30 + 1, mono=False).collect()
    }
    assert out2[3] is None
    # the encoder itself refuses the overflow loudly for direct callers
    with pytest.raises(ValueError, match="byte rate"):
        encode_wav_pcm16(2**31, [0], n_channels=2)
    # bytes fast path == list path, byte for byte
    assert encode_wav_pcm16(8000, [1, -2, 3]) == encode_wav_pcm16(
        8000, _struct.pack("<3h", 1, -2, 3)
    )


def test_resize_rescales_sub255_ppm_maxval(spark):
    """A P6 with maxval 100 re-encodes under the output's maxval-255
    header: samples must rescale (100 -> 255) or every consumer reads
    the image ~39% darker (review finding r7 pass 5)."""
    import numpy as np

    from lcr_etl_upgrade_spark.operators.multimodal import (
        decode_ppm,
        resize_images,
    )

    src = b"P6\n2 2\n100\n" + bytes([100, 50, 0] * 4)
    df = spark.createDataFrame(
        [(0, bytearray(src))], "media_id long, payload binary"
    )
    out = resize_images(df, 2, 2).collect()[0]
    arr = np.frombuffer(
        decode_ppm(bytes(out.payload))["pixels"], np.uint8
    ).reshape(2, 2, 3)
    assert [int(v) for v in arr[0, 0]] == [255, 128, 0]  # round(50*2.55)


def test_png_through_features_and_resize(spark):
    """PNG payloads flow through the same paths as PPM/JPEG: pixel
    statistics in extract_media_features, decode->resample->PPM in
    resize_images; corrupt PNGs degrade to NULL rows."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from lcr_etl_upgrade_spark.operators.multimodal import (
        _media_features_one,
        decode_ppm,
        resize_images,
    )

    def chunk(t, b):
        return (_struct.pack(">I", len(b)) + t + b
                + _struct.pack(">I", _zlib.crc32(t + b)))

    # 2x2 RGB, filter 0 rows
    px = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    raster = b"".join(b"\x00" + px[y].tobytes() for y in range(2))
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(raster))
        + chunk(b"IEND", b"")
    )
    f = _media_features_one(payload)
    assert f["kind"] == "image" and (f["width"], f["height"]) == (2, 2)
    assert (f["mean_c0"], f["vmin"], f["vmax"]) == (55.0, 10, 120)

    df = spark.createDataFrame(
        [(0, bytearray(payload)), (1, bytearray(payload[:-4] + b"\x00" * 4))],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in resize_images(df, 1, 1).collect()}
    arr = np.frombuffer(
        decode_ppm(bytes(out[0].payload))["pixels"], np.uint8
    )
    assert arr.tolist() == [55, 65, 75]  # box mean of all four pixels
    assert out[1].payload is None  # CRC-corrupt -> NULL row


def test_wav_encode_rejects_partial_frames():
    """ADVICE r7: multi-channel sample data must be a whole number of
    FRAMES (2 * n_channels bytes), not just an even byte count —
    otherwise the data chunk ends mid-frame."""
    from lcr_etl_upgrade_spark.operators.multimodal import encode_wav_pcm16

    # 3 int16 samples into 2 channels = 1.5 frames -> refuse (both paths)
    with pytest.raises(ValueError, match="frames"):
        encode_wav_pcm16(8000, b"\x01\x00\x02\x00\x03\x00", n_channels=2)
    with pytest.raises(ValueError, match="frames"):
        encode_wav_pcm16(8000, [1, 2, 3], n_channels=2)
    # whole frames still work
    wav = encode_wav_pcm16(8000, [1, 2, 3, 4], n_channels=2)
    from lcr_etl_upgrade_spark.operators.multimodal import decode_wav

    d = decode_wav(wav)
    assert d["n_channels"] == 2 and len(d["samples"]) == 4


def test_y4m_rejects_high_bitdepth_and_alpha_tags():
    """ADVICE r7: C420p10/C422p12/C444alpha change bytes-per-frame; a
    prefix match would accept them with 8-bit geometry and die later
    with a misleading 'expected FRAME marker'. They must hit the
    intended 'unsupported y4m colorspace' refusal instead."""
    from lcr_etl_upgrade_spark.operators.multimodal import decode_y4m_header

    for cs in (b"C420p10", b"C420p12", b"C422p10", b"C444p12",
               b"C444alpha"):
        with pytest.raises(ValueError, match="unsupported y4m colorspace"):
            decode_y4m_header(_y4m(4, 2, [], cs=cs))
    # the named 8-bit siting variants remain accepted
    for cs in (b"C420jpeg", b"C420mpeg2", b"C420paldv"):
        info = decode_y4m_header(_y4m(4, 2, [], cs=cs))
        assert info["frame_bytes"] == 4 * 2 + 2 * (2 * 1)


def test_resize_images_bounds_target_geometry(spark):
    """ADVICE r7: the decode side bounds INPUT pixels at 100 MP; the
    target must be bounded too or a huge width*height allocates
    multi-GB float intermediates per task."""
    from lcr_etl_upgrade_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(0, bytearray(b"P6 1 1 255 xyz"))], "media_id long, payload binary"
    )
    with pytest.raises(ValueError, match="exceeds"):
        resize_images(df, 100_000, 100_000)
    # at-the-bound geometry is accepted (validation only; lazy plan)
    resize_images(df, 10_000, 10_000)


def test_sample_video_frames_null_media_id_survives(spark):
    """r8 review finding: the marker-row branch called int(mid) outside
    any guard, so a NULL media_id killed the whole task instead of being
    skipped (id_col is non-nullable in the output schema, so a marker
    row cannot anchor to it)."""
    from lcr_etl_upgrade_spark.operators.multimodal import (
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [(None, bytearray(b"not video")), (1, None)],
        "media_id long, payload binary",
    )
    rows = sample_video_frames(df, every_n=1).collect()
    assert [(r.media_id, r.frame_idx, r.frame) for r in rows] == [
        (1, None, None)
    ]
