"""L5 multimodal-column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a metadata
struct (media_type, width/height or sample_rate/duration, byte length).
Spark-side plumbing — schema, binaryFile source, partition sizing,
mapInPandas batch shape — is real and tested.

Codecs come in two tiers:

- REAL, dependency-free (pure ``struct``/bytes, no image/audio libs):
  binary PPM (P6) and RIFF/WAVE PCM-16 — ``decode_ppm``/``decode_wav``
  parse actual container bytes (header grammar, chunk walk, word
  alignment) and ``extract_media_features`` runs them inside
  mapInPandas Arrow batches. Malformed payloads decode to NULL feature
  rows, never task failures.
- STUBBED rich formats (JPEG/MP3/H.264 need codec libraries absent in
  this container): ``decode_stub='fake'`` produces a deterministic
  hash-feature vector so downstream operators (dedup, similarity) are
  exercisable end-to-end, and ``decode_stub='raise'`` marks the
  production seam with NotImplementedError.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """L5 source: spark.read.format('binaryFile') — one row per file with
    path/length/content; the public Spark pattern for raw media ingestion."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _fake_features(payload: bytes | None) -> list[float] | None:
    """Deterministic stand-in for a codec+model feature extractor: sha256
    bytes -> FEATURE_DIM floats in [0, 1). Lets partitioning/UDF/batch
    shape be tested end-to-end without image/audio libs."""
    if payload is None:
        return None
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    decode_stub: str = "fake",
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches; the payload
    never round-trips through the driver).

    decode_stub='fake'  -> deterministic hash features (testable plumbing)
    decode_stub='raise' -> NotImplementedError at the codec seam (the
                           production implementation would call the real
                           decoder here, per batch, vectorized)
    """
    if decode_stub not in ("fake", "raise"):
        # a typo at the production seam must not silently return
        # hash-based stand-in features that look like model output
        raise ValueError(
            f"decode_stub must be 'fake' or 'raise', got {decode_stub!r}"
        )
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; plug the real decoder in here"
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": pdf[payload_col].map(_fake_features),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


# --------------------------------------------------------------------------
# Real dependency-free codecs: binary PPM (P6) and RIFF/WAVE PCM-16.
# Pure bytes + struct — no image/audio libraries involved.
# --------------------------------------------------------------------------


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Serialize a P6 (binary) PPM: ASCII header + raw RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} pixel bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6): header grammar (magic, whitespace/comment
    tokens, width height maxval, single whitespace) then width*height*3
    raw RGB bytes. Raises ValueError on any malformation — wrong magic,
    truncated header, maxval out of byte range, short pixel data."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    idx, fields = 2, []
    while len(fields) < 3:
        while idx < len(payload) and payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":  # comment runs to end of line
            while idx < len(payload) and payload[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < len(payload) and not payload[idx : idx + 1].isspace():
            idx += 1
        if start == idx:
            raise ValueError("truncated PPM header")
        try:
            fields.append(int(payload[start:idx]))
        except ValueError as exc:
            raise ValueError(f"bad PPM header token {payload[start:idx]!r}") from exc
    idx += 1  # exactly one whitespace byte separates maxval from raster
    width, height, maxval = fields
    if width <= 0 or height <= 0 or not 0 < maxval < 256:
        raise ValueError(f"bad PPM dimensions/maxval {fields}")
    if width >= 2**31 or height >= 2**31:
        # header ints are unbounded ASCII; the feature schema is int32
        raise ValueError(f"implausible PPM dimensions {width}x{height}")
    need = width * height * 3
    pixels = payload[idx : idx + need]
    if len(pixels) < need:
        raise ValueError(f"truncated pixel data: {len(pixels)}/{need}")
    return {"width": width, "height": height, "maxval": maxval, "pixels": pixels}


def encode_wav_pcm16(
    sample_rate: int, samples: list[int], n_channels: int = 1
) -> bytes:
    """Serialize a RIFF/WAVE file with one PCM-16 fmt chunk + data chunk."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * n_channels * 2,  # byte rate
        n_channels * 2,  # block align
        16,  # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Parse RIFF/WAVE: validate the RIFF/WAVE preamble, walk the chunk
    list (word-aligned, unknown chunks skipped), require a PCM-16 fmt
    chunk and a data chunk, unpack little-endian int16 samples. Raises
    ValueError on malformation (bad magic, truncated chunk, non-PCM16)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_body, data_body = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk: {len(body)}/{size}")
        if cid == b"fmt ":
            fmt_body = body
        elif cid == b"data":
            data_body = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_body is None or data_body is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt_body) < 16:
        raise ValueError("short fmt chunk")
    audio_fmt, n_channels, sample_rate = struct.unpack("<HHI", fmt_body[:8])
    (bits,) = struct.unpack("<H", fmt_body[14:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only PCM-16 supported, got fmt={audio_fmt} bits={bits}")
    if n_channels == 0:
        # would divide by zero below; and any raised non-ValueError would
        # escape _media_features_one's malformed-payload handler and kill
        # the executor task
        raise ValueError("fmt chunk declares zero channels")
    if sample_rate >= 2**31:
        # '<I' is unsigned but MEDIA_FEATURE_SCHEMA declares int32; a
        # declared rate past int32 is garbage anyway — classify it as
        # malformation here rather than dying in Arrow conversion
        raise ValueError(f"implausible sample rate {sample_rate}")
    n_frames = len(data_body) // (2 * n_channels)
    samples = struct.unpack(
        f"<{n_frames * n_channels}h", data_body[: n_frames * n_channels * 2]
    )
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "samples": samples,
    }


MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("mean_c0", T.DoubleType(), True),
        T.StructField("mean_c1", T.DoubleType(), True),
        T.StructField("mean_c2", T.DoubleType(), True),
        T.StructField("vmin", T.LongType(), True),
        T.StructField("vmax", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def _media_features_one(payload: bytes | None) -> dict:
    """Sniff the container magic and decode for real: PPM -> per-channel
    means + pixel extrema; WAV -> sample extrema + RMS. A payload that is
    None, has an unknown magic, or fails its container's grammar yields
    all-NULL features (kind stays NULL) — malformed media must surface as
    analyzable rows, never task failures."""
    out: dict = {k.name: None for k in MEDIA_FEATURE_SCHEMA if k.name != "media_id"}
    if payload is None:
        return out
    try:
        if payload.startswith(b"P6"):
            img = decode_ppm(payload)
            px = img["pixels"]
            chans = [px[c :: 3] for c in range(3)]
            out.update(
                kind="image",
                width=img["width"],
                height=img["height"],
                mean_c0=sum(chans[0]) / len(chans[0]),
                mean_c1=sum(chans[1]) / len(chans[1]),
                mean_c2=sum(chans[2]) / len(chans[2]),
                vmin=min(px),
                vmax=max(px),
            )
        elif payload.startswith(b"RIFF"):
            wav = decode_wav(payload)
            s = wav["samples"]
            # a zero-sample WAV is structurally VALID — classify it as
            # audio with n_samples=0 (extrema/rms stay NULL) rather than
            # letting min()'s ValueError route it to the malformed branch
            out.update(
                kind="audio",
                sample_rate=wav["sample_rate"],
                n_samples=len(s) // wav["n_channels"],
            )
            if s:
                out.update(
                    vmin=min(s),
                    vmax=max(s),
                    rms=math.sqrt(sum(float(v) * v for v in s) / len(s)),
                )
    except ValueError:
        pass  # malformed container -> all-NULL feature row
    return out


def extract_media_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL codec path: decode PPM/WAV payloads inside mapInPandas (Arrow
    batches, payload bytes never touch the driver) into typed features.
    Unknown/malformed payloads produce NULL-feature rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_media_features_one(p) for p in pdf[payload_col]]
            cols = {id_col: pdf[id_col].astype("int64")}
            for field in MEDIA_FEATURE_SCHEMA:
                if field.name != "media_id":
                    cols[field.name] = pd.Series(
                        [f[field.name] for f in feats], dtype="object"
                    )
            yield pd.DataFrame(cols)

    schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False)]
        + [f for f in MEDIA_FEATURE_SCHEMA if f.name != "media_id"]
    )
    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_stub(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Resize seam: passes metadata through with the new dimensions; the
    payload transform is the stubbed codec step."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def frame_sample_stub(
    df: DataFrame, every_n: int, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling seam for video payloads: emits (media_id, frame_idx)
    rows for every_n-th frame index derived from metadata; the frame
    payload decode is the stubbed step. Rows with NULL meta.n_bytes get
    a single frame 0 (unknown size, sample something rather than
    nothing)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    n_frames = F.greatest(
        (F.col("meta.n_bytes") / F.lit(1024)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias(
            "frame_idx"
        ),
    )
