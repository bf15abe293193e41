"""Avro decode micro-bench: row decoder vs vectorized block decoder.

Two fixtures:
  narrow  — 6 fields (long, double, string, null|int, timestamp-micros,
            boolean), 200k rows: the worst case for the offset skipper
            (two long varints per row, few fields to amortize row
            overhead).
  lattice — all 12 vectorizable field kinds, 100k rows: the
            representative shape (per-field cost dominates).

Prints best-of-N for each path and the ratio. Pure in-process decode —
no Spark session, so numbers isolate the decoder itself. The end-to-end
Spark read A/B (mapInPandas row path vs mapInArrow vector path) lives in
OPTIMIZATION_r14.md.
"""

from __future__ import annotations

import datetime as dt
import io
import sys
import time

sys.path.insert(0, ".")

from lcr_etl_upgrade_spark.avro_lite import (  # noqa: E402
    _read_bytes,
    _read_header,
    _read_long,
    _vector_block_decoder,
    decode_container,
    encode_container,
)

EPOCH = dt.datetime(2024, 1, 1)

NARROW_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "name", "type": "string"},
        {"name": "qty", "type": ["null", "int"]},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "flag", "type": "boolean"},
    ],
}


def narrow_rows(n):
    for i in range(n):
        yield {
            "id": i * 7919,
            "score": (i % 1000) / 3.0,
            "name": f"user-{i % 5000}-{'x' * (i % 23)}",
            "qty": None if i % 7 == 0 else (i % 100000) - 50000,
            "ts": EPOCH + dt.timedelta(seconds=i % 86400),
            "flag": i % 3 == 0,
        }


LATTICE_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "i", "type": ["null", "int"]},
        {"name": "d", "type": "double"},
        {"name": "f", "type": ["null", "float"]},
        {"name": "b", "type": "boolean"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "by", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "fx3", "size": 3}},
        {"name": "e", "type": {"type": "enum", "name": "col",
                               "symbols": ["red", "green", "blue"]}},
        {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "tsn", "type": ["null", {
            "type": "long", "logicalType": "local-timestamp-micros"}]},
    ],
}


def lattice_rows(n):
    for k in range(n):
        yield {
            "l": (-1) ** k * (k**3),
            "i": None if k % 3 == 0 else k - 1000,
            "d": k / 7.0,
            "f": None if k % 5 == 0 else float(k),
            "b": k % 2 == 0,
            "s": None if k % 7 == 0 else "user-%d" % (k % 5000),
            "by": bytes([k % 256]) * (k % 9),
            "fx": bytes([k % 256, 1, 2]),
            "e": ["red", "green", "blue"][k % 3],
            "dt": dt.date(2020, 1, 1) + dt.timedelta(days=k % 10000),
            "ts": EPOCH + dt.timedelta(microseconds=k * 1_000_003),
            "tsn": None if k % 11 == 0 else EPOCH + dt.timedelta(seconds=k),
        }


def vector_decode(decode_block, data):
    buf = io.BytesIO(data)
    _fs, codec, _sync = _read_header(buf)
    out = []
    while buf.tell() < len(data):
        nr = _read_long(buf)
        block = _read_bytes(buf)
        out.append(decode_block(block, nr))
        buf.read(16)
    return out


def bench(name, schema, rows, n, reps=5):
    data = encode_container(schema, rows(n), codec="null")
    decode_block, _ = _vector_block_decoder(schema)
    vector_decode(decode_block, data)  # warm numpy/pyarrow
    row_t, vec_t = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        decode_container(data)
        t1 = time.perf_counter()
        vector_decode(decode_block, data)
        t2 = time.perf_counter()
        row_t.append(t1 - t0)
        vec_t.append(t2 - t1)
    r, v = min(row_t), min(vec_t)
    print(
        f"{name}: {len(data) / 1e6:.1f} MB, {n} rows | "
        f"row {r:.3f}s  vector {v:.3f}s  speedup {r / v:.2f}x"
    )


if __name__ == "__main__":
    bench("narrow ", NARROW_SCHEMA, narrow_rows, 200_000)
    bench("lattice", LATTICE_SCHEMA, lattice_rows, 100_000)
