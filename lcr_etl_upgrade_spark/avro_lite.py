"""Minimal Avro Object Container File support from the PUBLIC Avro
specification (avro.apache.org/docs — file container format + binary
encoding) — no spark-avro jar, no avro/fastavro package.

The spark-avro datasource needs a Maven-resolved jar this container
cannot fetch (no network; recorded in COVERAGE.md). The format itself is
open and simple: a header (magic ``Obj\\x01``, metadata map carrying the
writer schema JSON and codec, 16-byte sync marker) followed by data
blocks (row count, byte length, binary-encoded rows, sync marker).

Spark-first split, mirroring ``delta_lite``:
- READ: one driver-side header peek resolves the writer schema to a
  Spark ``StructType``; the files then stream through ``binaryFile`` +
  ``mapInPandas``, each task decoding whole container files (bounded-
  file contract, like ``read_text_documents``). The DECODE loop is
  per-row Python — correct, but orders slower than the JVM datasource;
  at cluster scale the spark-avro jar remains the fast path and every
  error message says so.
- WRITE: ``df.foreachPartition`` writes one container file per non-empty
  partition into the target directory (distributed; local-filesystem
  contract, same as delta_lite) with the schema translated from the
  DataFrame's.

Supported types (both directions): null, boolean, int, long, float,
double, bytes, string, record, array, map, enum (as string symbols) and
fixed (as exact-size binary),
logical date (int days) and timestamp-micros (long). Unions read on
all shapes: ``[null, T]`` is nullable T; multi-branch all-numeric
unions widen along Avro's promotion chain (int->long->float->double);
any other multi-branch union reads as ``string`` with a documented
per-branch rendering (verbatim strings, base64 bytes, canonical JSON
otherwise). The WRITE side emits ``[null, T]`` from Spark schemas, and
``encode_container`` additionally writes MULTI-branch unions with
value-driven branch selection (first matching branch; bool before int,
32-bit range respected, int->float/double promotion as a fallback —
logical-typed branches inside multi-branch unions refuse),
logical date (int days) and timestamp-micros (long). Codecs: ``null``
and ``deflate``, both directions (deflate = raw RFC 1951 block, no
zlib wrapper, per the spec). Anything else raises NotImplementedError
naming the spark-avro remedy.
"""

from __future__ import annotations

import base64
import datetime
import io
import json
import os
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
_REMEDY = "use the spark-avro datasource (spark.jars.packages) for this"


# ---------------------------------------------------------------- binary --


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (the int/long wire format)."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    # out-of-range zigzag is not a bigger varint, it is CORRUPTION: a
    # >64-bit positive emits an out-of-spec >10-byte encoding conforming
    # readers reject, and the `n >> 63` sign fold mis-encodes any
    # negative below -2**63 — refuse loudly on both
    if not -(2**63) <= n < 2**63:
        raise ValueError(
            f"value {n} outside 64-bit range for an avro long varint"
        )
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        if n & ~0x7F:
            out.write(bytes([(n & 0x7F) | 0x80]))
            n >>= 7
        else:
            out.write(bytes([n]))
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# ---------------------------------------------------------------- schema --


def _logical(schema: dict) -> str | None:
    return schema.get("logicalType") if isinstance(schema, dict) else None


# Avro's own schema-resolution promotion chain (spec "Schema Resolution"):
# int -> long -> float -> double. A union of numeric branches resolves to
# the widest member.
_NUMERIC_WIDENING = ("int", "long", "float", "double")
_NUMERIC_SPARK = {
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
}


def _union_branches(schema: list) -> list:
    return [s for s in schema if s != "null"]


# logical types the decoder TRANSFORMS into non-numeric Python objects
# (date/datetime); every other logicalType is unknown to this reader and
# — per the spec's "ignore unknown logical types" rule, which _decoder
# follows — decodes as its underlying primitive
_TRANSFORMING_LOGICALS = frozenset(
    {"date", "timestamp-micros", "local-timestamp-micros"}
)


def _plain_numeric(s) -> str | None:
    """Branch schema -> primitive numeric name, honoring the spec's
    ``{"type": "long"}`` wrapper form. Branches whose logicalType the
    decoder transforms (date, timestamps -> date/datetime objects) are
    NOT plain numerics; unknown logical types decode as the underlying
    primitive and therefore widen normally."""
    if isinstance(s, dict) and _logical(s) not in _TRANSFORMING_LOGICALS:
        s = s.get("type")
    if isinstance(s, str) and s in _NUMERIC_WIDENING:
        return s
    return None


def _union_numeric_type(schema: list) -> T.DataType | None:
    """Widest Spark type for an all-numeric multi-branch union, else None."""
    branches = [_plain_numeric(s) for s in _union_branches(schema)]
    if all(b is not None for b in branches):
        widest = max(branches, key=_NUMERIC_WIDENING.index)
        return _NUMERIC_SPARK[widest]
    return None


def avro_to_spark_type(schema) -> T.DataType:
    """Avro schema (parsed JSON) -> Spark type.

    Unions: ``[null, T]`` maps to nullable T (the common encoding);
    multi-branch unions have no faithful Spark column type, so they
    resolve by DOCUMENTED rule — all-numeric branches widen along Avro's
    own promotion chain (int->long->float->double), anything else
    becomes ``string`` with per-branch rendering (string branches pass
    through; bytes/fixed render base64; every other branch renders as
    canonical JSON — see ``_union_render``)."""
    if isinstance(schema, str):
        prim = {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }
        if schema in prim:
            return prim[schema]
        raise NotImplementedError(f"avro type {schema!r}: {_REMEDY}")
    if isinstance(schema, list):
        non_null = _union_branches(schema)
        if len(non_null) == 1:
            return avro_to_spark_type(non_null[0])
        if not non_null:
            return T.NullType()
        return _union_numeric_type(schema) or T.StringType()
    t = schema["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"], avro_to_spark_type(f["type"]), nullable=True
                )
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]))
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "int" and _logical(schema) == "date":
        return T.DateType()
    if t == "long" and _logical(schema) == "timestamp-micros":
        return T.TimestampType()
    if t == "long" and _logical(schema) == "local-timestamp-micros":
        return T.TimestampNTZType()
    if isinstance(t, (str, list, dict)):
        return avro_to_spark_type(t)  # {"type": "string"} wrapper form
    raise NotImplementedError(f"avro schema {schema!r}: {_REMEDY}")


def spark_to_avro_schema(dt: T.DataType, name: str = "row"):
    prim = {
        T.BooleanType(): "boolean",
        T.IntegerType(): "int",
        T.ShortType(): "int",
        T.ByteType(): "int",
        T.LongType(): "long",
        T.FloatType(): "float",
        T.DoubleType(): "double",
        T.BinaryType(): "bytes",
        T.StringType(): "string",
    }
    if dt in prim:
        return prim[dt]
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", spark_to_avro_schema(f.dataType, f.name)],
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "array",
            "items": ["null", spark_to_avro_schema(dt.elementType, name)],
        }
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise NotImplementedError(f"avro maps need string keys: {_REMEDY}")
        return {
            "type": "map",
            "values": ["null", spark_to_avro_schema(dt.valueType, name)],
        }
    raise NotImplementedError(f"no avro mapping for {dt}: {_REMEDY}")


# ---------------------------------------------------------------- decode --


def _jsonable(v):
    """Decoded avro value -> JSON-serializable: bytes to base64, logical
    date/timestamp values to ISO-8601, nested containers recursively
    (record/map keys are already strings)."""
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def _union_render(v):
    """String-fallback union rendering (documented rule): null stays
    NULL, string branches pass through verbatim, bytes/fixed render
    base64, logical date/timestamp branches render ISO-8601, everything
    else becomes canonical JSON (sorted keys, no whitespace) — so
    ``["int","string"]`` yields '5' for int 5 and 'five' for the string."""
    if v is None or isinstance(v, str):
        return v
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return json.dumps(_jsonable(v), separators=(",", ":"), sort_keys=True)


def _decoder(schema):
    """Compile an avro schema into ``f(BytesIO) -> python value``."""
    if isinstance(schema, str):
        simple = {
            "null": lambda b: None,
            "boolean": lambda b: b.read(1) == b"\x01",
            "int": _read_long,
            "long": _read_long,
            "float": lambda b: struct.unpack("<f", b.read(4))[0],
            "double": lambda b: struct.unpack("<d", b.read(8))[0],
            "bytes": _read_bytes,
            "string": lambda b: _read_bytes(b).decode("utf-8"),
        }
        return simple[schema]
    if isinstance(schema, list):
        subs = [_decoder(s) for s in schema]
        non_null = _union_branches(schema)
        n = len(subs)

        # A corrupt zigzag varint can decode to any long; without the
        # range check a negative index would silently select a branch
        # via Python negative indexing and misdecode instead of failing
        # loudly like every other corrupt-container path in this module.
        def branch(b):
            i = _read_long(b)
            if i < 0 or i >= n:
                raise ValueError(
                    f"avro union branch index {i} out of range 0..{n - 1}"
                )
            return subs[i]

        if len(non_null) > 1 and _union_numeric_type(schema) is None:
            # string-fallback union: the column type is string, so each
            # branch value renders per the documented rule
            def union_str(b):
                return _union_render(branch(b)(b))

            return union_str

        def union(b):
            return branch(b)(b)

        return union
    t = schema["type"]
    if t == "record":
        fields = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]

        def record(b):
            return {name: dec(b) for name, dec in fields}

        return record
    if t == "array":
        item = _decoder(schema["items"])

        def array(b):
            out = []
            while True:
                n = _read_long(b)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(b)  # block byte size: unused when decoding all
                out.extend(item(b) for _ in range(n))

        return array
    if t == "map":
        val = _decoder(schema["values"])

        def mp(b):
            out = {}
            while True:
                n = _read_long(b)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(b)
                for _ in range(n):
                    # key must be read BEFORE the value: in `d[k] = v`
                    # Python evaluates the RHS first, which would consume
                    # the value bytes ahead of the key bytes
                    key = _read_bytes(b).decode("utf-8")
                    out[key] = val(b)
            return out

        return mp
    if t == "enum":
        symbols = schema["symbols"]
        return lambda b: symbols[_read_long(b)]
    if t == "fixed":
        size = schema["size"]
        return lambda b: b.read(size)
    if t == "int" and _logical(schema) == "date":
        import datetime as dt

        epoch = dt.date(1970, 1, 1)
        return lambda b: epoch + dt.timedelta(days=_read_long(b))
    if t == "long" and _logical(schema) in (
        "timestamp-micros",
        "local-timestamp-micros",
    ):
        import datetime as dt

        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        return lambda b: (
            epoch + dt.timedelta(microseconds=_read_long(b))
        ).replace(tzinfo=None)
    if isinstance(t, (str, list, dict)):
        return _decoder(t)
    raise NotImplementedError(f"avro schema {schema!r}: {_REMEDY}")


def _read_header(buf: io.BytesIO) -> tuple[dict, str, bytes]:
    """-> (writer schema (parsed), codec, sync marker)."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            key = _read_bytes(buf).decode("utf-8")
            meta[key] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}: {_REMEDY}")
    schema = json.loads(meta["avro.schema"])
    return schema, codec, buf.read(16)


def decode_container(data: bytes) -> tuple[dict, list]:
    """One container file -> (writer schema, decoded rows)."""
    buf = io.BytesIO(data)
    schema, codec, sync = _read_header(buf)
    dec = _decoder(schema)
    rows = []
    while buf.tell() < len(data):
        n_rows = _read_long(buf)
        block = _read_bytes(buf)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw DEFLATE per spec
        bb = io.BytesIO(block)
        rows.extend(dec(bb) for _ in range(n_rows))
        if bb.tell() != len(block):
            # count/length disagreement = corruption; silently dropping
            # the excess would decode a truncated row set as success
            raise ValueError(
                f"avro block declared {n_rows} rows but carries "
                f"{len(block) - bb.tell()} undecoded trailing bytes"
            )
        if buf.read(16) != sync:
            raise ValueError("avro block sync marker mismatch")
    return schema, rows


# ---------------------------------------------------------------- encode --


def _union_branch_index(schema: list, v) -> int:
    """First multi-branch union member that can carry the Python value
    ``v`` (write-side branch selection; first match wins, mirroring the
    spec's resolution order). Python ``bool`` is tested before ``int``
    (it subclasses int); an int outside 32-/64-bit range skips an
    ``int``/``long`` branch; an int with no fitting integer branch
    promotes to a range-checked float/double branch in a second pass. Logical-typed branches inside MULTI-branch unions are not
    sniffed (a ``[null, T]`` logical branch is — see the caller) and
    fail loudly, as does any unmatched value."""

    def tname(s):
        return s if isinstance(s, str) else s["type"]

    for i, s in enumerate(schema):
        t = tname(s)
        if isinstance(s, dict) and _logical(s):
            continue  # not sniffable; documented refusal below
        if v is None and t == "null":
            return i
        if isinstance(v, bool):
            if t == "boolean":
                return i
            continue
        if isinstance(v, int) and t in ("int", "long"):
            if t == "int" and not -(2**31) <= v < 2**31:
                continue
            # a >64-bit int must skip a 'long' branch too: zigzag of an
            # out-of-range value would emit an out-of-spec >10-byte
            # varint that conforming readers reject or mis-decode
            if t == "long" and not -(2**63) <= v < 2**63:
                continue
            return i
        if isinstance(v, float) and t in ("float", "double"):
            # mirror the int path's range check: a finite value beyond
            # float32 range must skip a 'float' branch so a later
            # 'double' branch can carry it (struct.pack('<f') would
            # raise OverflowError)
            if (
                t == "float"
                and v == v  # not NaN
                and v not in (float("inf"), float("-inf"))
                and not -3.4028234663852886e38 <= v <= 3.4028234663852886e38
            ):
                continue
            return i
        if isinstance(v, str):
            if t == "string":
                return i
            if t == "enum" and v in s.get("symbols", ()):
                return i
            continue
        if isinstance(v, (bytes, bytearray)):
            if t == "bytes":
                return i
            if t == "fixed" and len(v) == s["size"]:
                return i
            continue
        if isinstance(v, dict) and t in ("map", "record"):
            dict_branches = [
                (j, s2)
                for j, s2 in enumerate(schema)
                if tname(s2) in ("map", "record")
            ]
            if len(dict_branches) == 1:
                return i
            # ambiguous: several dict-accepting branches. A record
            # matches only on EXACT field-name set (the record encoder
            # fills missing names with None — a near-miss would silently
            # write a wrong-branch row of nulls); a map branch matches
            # any remaining dict only if it is the sole map.
            record_hits = [
                j
                for j, s2 in dict_branches
                if tname(s2) == "record"
                and {f["name"] for f in s2["fields"]} == set(v)
            ]
            if len(record_hits) == 1:
                return record_hits[0]
            map_hits = [
                j for j, s2 in dict_branches if tname(s2) == "map"
            ]
            if not record_hits and len(map_hits) == 1:
                return map_hits[0]
            raise ValueError(
                f"ambiguous union branch for dict with keys "
                f"{sorted(v)} in {schema!r}: "
                f"{len(record_hits)} exact record matches, "
                f"{len(map_hits)} map branches"
            )
        if isinstance(v, (list, tuple)) and t == "array":
            return i
    if isinstance(v, int) and not isinstance(v, bool):
        # promotion pass mirrors the float-VALUE path's range checks: a
        # 'float' branch only fits within float32 range, a 'double'
        # branch within float64 (struct.pack would raise OverflowError
        # past either; better the clean no-branch ValueError below)
        for i, s in enumerate(schema):
            t = tname(s)
            if t == "float" and (
                -3.4028234663852886e38 <= v <= 3.4028234663852886e38
            ):
                return i
            if t == "double" and (
                -1.7976931348623157e308 <= v <= 1.7976931348623157e308
            ):
                return i
    raise ValueError(
        f"no union branch in {schema!r} accepts "
        f"{type(v).__name__} value {v!r}"
    )


def _encoder(schema):
    """Compile an avro schema into ``f(BytesIO, value) -> None``."""
    if isinstance(schema, str):
        def write_int32(o, v):
            # spec: int is the 32-bit zigzag varint; a larger value
            # would decode "successfully" to a number the schema says
            # cannot exist — refuse like _write_long does for 64-bit
            if not -(2**31) <= v < 2**31:
                raise ValueError(
                    f"value {v} outside 32-bit range for an avro int"
                )
            _write_long(o, v)

        def write_float32(o, v):
            # NaN/inf are representable; a FINITE value past float32
            # range would raise a raw OverflowError/struct.error deep
            # in struct.pack — surface the module's clean ValueError
            # instead (the [null, T] union path encodes here directly,
            # with no branch sniffing to range-check first)
            if (
                v == v
                and v not in (float("inf"), float("-inf"))
                and not -3.4028234663852886e38 <= v <= 3.4028234663852886e38
            ):
                raise ValueError(
                    f"value {v!r} outside float32 range for an avro float"
                )
            o.write(struct.pack("<f", v))

        def write_float64(o, v):
            if (
                v == v
                and v not in (float("inf"), float("-inf"))
                and not (
                    -1.7976931348623157e308 <= v <= 1.7976931348623157e308
                )
            ):
                raise ValueError(
                    f"value {v!r} outside float64 range for an avro double"
                )
            o.write(struct.pack("<d", v))

        simple = {
            "null": lambda o, v: None,
            "boolean": lambda o, v: o.write(b"\x01" if v else b"\x00"),
            "int": write_int32,
            "long": _write_long,
            "float": write_float32,
            "double": write_float64,
            "bytes": lambda o, v: _write_bytes(o, bytes(v)),
            "string": lambda o, v: _write_bytes(o, v.encode("utf-8")),
        }
        return simple[schema]
    if isinstance(schema, list):
        subs = [_encoder(s) for s in schema]
        null_idx = schema.index("null") if "null" in schema else None
        non_null_idx = [i for i, s in enumerate(schema) if s != "null"]

        def union(o, v):
            if v is None:
                if null_idx is None:
                    raise ValueError(
                        f"union {schema!r} has no null branch for None"
                    )
                _write_long(o, null_idx)
                return
            if len(non_null_idx) == 1:
                # [null, T] / [T]: no sniffing — preserves every
                # logical-type value the single branch already accepts
                i = non_null_idx[0]
            else:
                i = _union_branch_index(schema, v)
            _write_long(o, i)
            subs[i](o, v)

        return union
    t = schema["type"]
    if t == "record":
        fields = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]

        def record(o, v):
            get = v.get if isinstance(v, dict) else lambda k: v[k]
            for name, enc in fields:
                enc(o, get(name))

        return record
    if t == "array":
        item = _encoder(schema["items"])

        def array(o, v):
            if v:
                _write_long(o, len(v))
                for x in v:
                    item(o, x)
            _write_long(o, 0)

        return array
    if t == "map":
        val = _encoder(schema["values"])

        def mp(o, v):
            if v:
                _write_long(o, len(v))
                for k, x in v.items():
                    _write_bytes(o, k.encode("utf-8"))
                    val(o, x)
            _write_long(o, 0)

        return mp
    if t == "enum":
        index = {s: i for i, s in enumerate(schema["symbols"])}

        def enum(o, v):
            try:
                _write_long(o, index[v])
            except KeyError:
                raise ValueError(
                    f"{v!r} is not a symbol of enum "
                    f"{schema.get('name')} ({schema['symbols']})"
                ) from None

        return enum
    if t == "fixed":
        size = schema["size"]

        def fixed(o, v):
            raw = bytes(v)
            if len(raw) != size:
                raise ValueError(
                    f"fixed {schema.get('name')} requires exactly {size} "
                    f"bytes, got {len(raw)}"
                )
            o.write(raw)

        return fixed
    if t == "int" and _logical(schema) == "date":
        import datetime as dt

        epoch = dt.date(1970, 1, 1)
        return lambda o, v: _write_long(o, (v - epoch).days)
    if t == "long" and _logical(schema) in (
        "timestamp-micros",
        "local-timestamp-micros",
    ):
        import datetime as dt

        epoch = dt.datetime(1970, 1, 1)

        def ts(o, v):
            delta = v.replace(tzinfo=None) - epoch
            # integer arithmetic: total_seconds() goes through a float
            # and loses exactness past 2^53 us (~year 2255)
            _write_long(
                o,
                delta.days * 86_400_000_000
                + delta.seconds * 1_000_000
                + delta.microseconds,
            )

        return ts
    raise NotImplementedError(f"avro schema {schema!r}: {_REMEDY}")


def encode_container(
    schema: dict,
    rows,
    sync: bytes | None = None,
    codec: str = "null",
) -> bytes:
    """Rows (dicts for records) -> one container file (codec: null or
    deflate — raw RFC 1951 stream per the spec, no zlib header/checksum,
    matching the read path's ``zlib.decompress(block, -15)``)."""
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro write codec {codec!r}: {_REMEDY}")
    sync = sync or os.urandom(16)
    enc = _encoder(schema)
    out = io.BytesIO()
    out.write(MAGIC)
    _write_long(out, 2)
    _write_bytes(out, b"avro.schema")
    _write_bytes(out, json.dumps(schema).encode("utf-8"))
    _write_bytes(out, b"avro.codec")
    _write_bytes(out, codec.encode("utf-8"))
    _write_long(out, 0)
    out.write(sync)
    rows = list(rows)
    if rows:
        block = io.BytesIO()
        for r in rows:
            enc(block, r)
        payload = block.getvalue()
        if codec == "deflate":
            z = zlib.compressobj(wbits=-15)
            payload = z.compress(payload) + z.flush()
        _write_long(out, len(rows))
        _write_bytes(out, payload)
        out.write(sync)
    return out.getvalue()


# ----------------------------------------------------------------- spark --


def read_avro_lite(spark: SparkSession, path: str) -> DataFrame:
    """S8 Avro scan without the spark-avro jar: driver-side header peek
    resolves the schema; files then decode distributed (binaryFile +
    mapInPandas, one task per file batch). Every file must carry a
    schema whose field NAMES match the first file's (the reader decodes
    each file with its own writer schema, so physical evolution like
    added defaults is out of scope — the spark-avro jar covers that)."""
    import glob as _glob

    local = path[len("file:") :] if path.startswith("file:") else path
    candidates = (
        [local]
        if os.path.isfile(local)
        else sorted(
            _glob.glob(os.path.join(local, "*.avro"))
            or _glob.glob(os.path.join(local, "part-*"))
        )
    )
    if not candidates:
        raise FileNotFoundError(f"no avro container files under {path!r}")
    with open(candidates[0], "rb") as fh:
        schema, _codec, _sync = _read_header(io.BytesIO(fh.read(1 << 20)))
    spark_schema = avro_to_spark_type(schema)
    if not isinstance(spark_schema, T.StructType):
        raise NotImplementedError(
            f"top-level avro type must be a record, got {schema!r}"
        )
    names = [f.name for f in spark_schema.fields]
    want_types = [f.dataType for f in spark_schema.fields]

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                fschema, rows = decode_container(bytes(content))
                got = [f["name"] for f in fschema["fields"]]
                if got != names:
                    raise ValueError(
                        f"avro file field names {got} != {names}"
                    )
                # names alone are not enough: a second file with the same
                # names but different field TYPES would decode under its
                # own writer schema and feed mistyped values into the
                # driver schema — compare the RESOLVED Spark type per
                # field (nullability aside)
                resolved = avro_to_spark_type(fschema)
                got_types = [f.dataType for f in resolved.fields]
                if got_types != want_types:
                    mism = [
                        f"{n}: {g.simpleString()} != {w.simpleString()}"
                        for n, g, w in zip(names, got_types, want_types)
                        if g != w
                    ]
                    raise ValueError(
                        "avro file field types differ from the first "
                        f"file's schema: {'; '.join(mism)}"
                    )
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in names}
                ) if rows else pd.DataFrame({n: [] for n in names})

    binary = (
        spark.read.format("binaryFile")
        .load([f"file:{os.path.abspath(c)}" for c in candidates])
        .select("content")
    )
    return binary.mapInPandas(decode, spark_schema)


def write_avro_lite(df: DataFrame, path: str, codec: str = "null") -> None:
    """Distributed write: one container file per non-empty partition
    (``foreachPartition`` — per-partition imperative file IO is the one
    place the DataFrame API genuinely hands over). ``codec`` may be
    ``null`` or ``deflate`` (read-path parity). Local filesystem only,
    same contract as delta_lite.

    Timestamp honesty: Spark hands Python naive datetimes in the worker
    process's local timezone and the encoder treats them as UTC. The
    read/write pair here is symmetric (this container runs UTC), but on
    a non-UTC host interchange with other Avro readers would shift by
    the host offset — the spark-avro jar is the tz-exact path."""
    local = path[len("file:") :] if path.startswith("file:") else path
    os.makedirs(local, exist_ok=True)
    schema = spark_to_avro_schema(df.schema, name="spark_row")
    names = df.columns

    def write_partition(rows) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        import itertools

        data = encode_container(
            schema,
            ({n: r[n] for n in names} for r in itertools.chain([first], it)),
            codec=codec,
        )
        target = os.path.join(local, f"part-{uuid.uuid4().hex}.avro")
        with open(target, "wb") as fh:
            fh.write(data)

    df.foreachPartition(write_partition)
