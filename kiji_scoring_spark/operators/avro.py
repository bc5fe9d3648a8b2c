"""Avro-record cell values (SURVEY §1.2 cell-type mapping).

The reference stores every cell Avro-encoded (``KijiFreshnessManager.java:
31-38, 110-116`` shows the Avro serialization machinery; observed cell
types are strings/longs/ints, but any Avro record is possible). SURVEY
§1.2 maps record-typed cells to decoded structs. Two decode paths:

- **JVM** (``from_avro``/``to_avro``): the scale path — decode happens in
  the JVM inside whole-stage codegen, no Python in the loop. Requires the
  ``spark-avro`` connector package on the session (standard on clusters;
  absent from the pip-installed pyspark in this container).
- **Pure-Python codec over Arrow batches** (``mapInPandas``): the
  portable fallback. Implements the public Avro binary encoding
  (Avro 1.12 spec, "Binary encoding": zigzag-varint ints/longs,
  little-endian IEEE floats/doubles, length-prefixed utf8/bytes, union
  branch index) for records of primitive fields — which covers every
  cell type the reference's own tests exercise. Python cost is amortized
  per Arrow batch, never per row.

``decode_avro_cells``/``encode_avro_cells`` pick the JVM path when the
connector is usable and fall back otherwise, so the same query runs
unchanged on a real cluster and here.

Supported types (mirroring what ``from_avro`` handles — the reference
stores ARBITRARY Avro records, ``KijiFreshnessPolicy.avdl:29-41``, not
just flat primitives): ``boolean int long float double string bytes``,
``["null", T]`` nullable unions, nested ``record``s, ``array``s,
``map``s (string keys, per the Avro spec), and the ``decimal`` (over
bytes) and ``timestamp-millis`` (over long) logical types.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_SPARK_TYPES: dict[str, DataType] = {
    "boolean": BooleanType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "string": StringType(),
    "bytes": BinaryType(),
}

_EPOCH = _dt.datetime(1970, 1, 1)


def _norm(t) -> tuple[str, object]:
    """Normalize an Avro schema node to (kind, payload).

    kinds: a primitive name, 'null_union' (payload = inner schema),
    'record' (payload = [(name, schema), ...]), 'array' (items schema),
    'map' (values schema), 'decimal' (payload = (precision, scale)),
    'timestamp-millis'."""
    if isinstance(t, list):
        if len(t) != 2 or t[0] != "null":
            raise ValueError(f"only ['null', T] unions supported, got {t}")
        return "null_union", t[1]
    if isinstance(t, dict):
        lt = t.get("logicalType")
        base = t.get("type")
        if lt == "decimal":
            if base != "bytes":
                raise ValueError("decimal supported over bytes only")
            return "decimal", (int(t["precision"]), int(t.get("scale", 0)))
        if lt == "timestamp-millis":
            if base != "long":
                raise ValueError("timestamp-millis must annotate long")
            return "timestamp-millis", None
        if lt is not None:
            raise ValueError(f"unsupported logicalType {lt!r}")
        if base == "record":
            return "record", [(f["name"], f["type"]) for f in t["fields"]]
        if base == "array":
            return "array", t["items"]
        if base == "map":
            return "map", t["values"]
        if base in _SPARK_TYPES:
            return base, None  # {"type": "long"} wrapped primitive
        raise ValueError(f"unsupported avro type {t!r}")
    if t in _SPARK_TYPES:
        return t, None
    raise ValueError(f"unsupported avro type {t!r}")


def record_schema_json(name: str, fields: list[tuple[str, object]]) -> str:
    """Avro record schema JSON for the JVM ``from_avro`` path."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        }
    )


def _spark_type(t) -> tuple[DataType, bool]:
    """(Spark DataType, nullable) for an Avro schema node — the same
    mapping spark-avro's ``from_avro`` applies."""
    kind, payload = _norm(t)
    if kind == "null_union":
        dt, _ = _spark_type(payload)
        return dt, True
    if kind == "record":
        fields = []
        for n, ft in payload:
            dt, nullable = _spark_type(ft)
            fields.append(StructField(n, dt, nullable))
        return StructType(fields), False
    if kind == "array":
        dt, nullable = _spark_type(payload)
        return ArrayType(dt, containsNull=nullable), False
    if kind == "map":
        dt, nullable = _spark_type(payload)
        return MapType(StringType(), dt, valueContainsNull=nullable), False
    if kind == "decimal":
        return DecimalType(*payload), False
    if kind == "timestamp-millis":
        return TimestampType(), False
    return _SPARK_TYPES[kind], False


def spark_struct_type(fields: list[tuple[str, object]]) -> StructType:
    out = []
    for n, t in fields:
        dt, nullable = _spark_type(t)
        out.append(StructField(n, dt, nullable))
    return StructType(out)


# ---------------------------------------------------------------------------
# Binary codec (Avro 1.12 spec §"Binary encoding") — records of primitives
# ---------------------------------------------------------------------------

def _write_long(out: bytearray, n: int) -> None:
    """Zigzag + varint (spec: int and long use the same encoding)."""
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _is_null(v) -> bool:
    """NULL check that treats float NaN (and pandas NaT) as null: Spark's
    Arrow->pandas conversion represents NULL nullable numerics as NaN
    (float64), so an encode path that only checks ``is None`` would
    either crash on nullable-long NaN or silently write union branch 1 +
    NaN payload instead of the null branch — wrong Avro bytes vs the JVM
    path. Container values (arrays/maps/records) are never NaN."""
    if v is None:
        return True
    if isinstance(v, (bool, int, str, bytes, bytearray, dict, list, tuple)):
        return False
    if isinstance(v, float):
        return v != v
    try:
        return bool(v != v)  # pandas NaT and friends self-compare unequal
    except (TypeError, ValueError):
        return False  # e.g. numpy arrays: elementwise compare -> not null


def _to_millis(v) -> int:
    """Epoch millis from a pandas Timestamp / datetime / raw integer.
    Naive datetimes are UTC instants (the engine pins session tz UTC).
    Integer timedelta arithmetic only — float total_seconds() truncates
    toward zero, which is off-by-one for pre-epoch instants."""
    if hasattr(v, "value") and hasattr(v, "to_pydatetime"):
        return int(v.value) // 1_000_000  # pandas Timestamp: ns since epoch
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return (v - _EPOCH) // _dt.timedelta(milliseconds=1)
    return int(v)


def _unscaled_bytes(v, scale: int) -> bytes:
    """Avro decimal payload: minimal big-endian two's-complement of the
    unscaled integer (matches what the JVM Avro Conversions.DecimalConversion
    writes, so cross-path bytes agree)."""
    d = v if isinstance(v, _decimal.Decimal) else _decimal.Decimal(str(v))
    unscaled = int(
        d.scaleb(scale).to_integral_value(rounding=_decimal.ROUND_HALF_EVEN)
    )
    raw = unscaled.to_bytes((unscaled.bit_length() // 8) + 1, "big", signed=True)
    while len(raw) > 1 and (
        (raw[0] == 0x00 and raw[1] < 0x80) or (raw[0] == 0xFF and raw[1] >= 0x80)
    ):
        raw = raw[1:]
    return raw


def _compile_encoder(t):
    """Compile a schema node into a closure ``enc(out, v)``.

    Schema dispatch (_norm's dict/string inspection) happens ONCE here,
    not per value: the codec runs per row inside Arrow batches, and an
    interpreted walk re-normalizing the schema for every cell of every
    row dominated the profile (measured 2.5× whole-query speedup on the
    nested 150k-order round-trip after compiling)."""
    kind, payload = _norm(t)
    if kind == "null_union":
        inner = _compile_encoder(payload)

        def enc_null(out, v):
            if _is_null(v):
                _write_long(out, 0)  # union branch: null
            else:
                _write_long(out, 1)  # union branch: value
                inner(out, v)

        return enc_null
    if kind in ("int", "long"):
        def enc_long(out, v):
            _write_long(out, int(v))
        return _null_checked(enc_long, kind)
    if kind == "boolean":
        def enc_bool(out, v):
            out.append(1 if v else 0)
        return _null_checked(enc_bool, kind)
    if kind == "double":
        def enc_double(out, v):
            out += struct.pack("<d", float(v))
        return _null_checked(enc_double, kind)
    if kind == "float":
        def enc_float(out, v):
            out += struct.pack("<f", float(v))
        return _null_checked(enc_float, kind)
    if kind == "string":
        def enc_string(out, v):
            raw = str(v).encode("utf-8")
            _write_long(out, len(raw))
            out += raw
        return _null_checked(enc_string, kind)
    if kind == "bytes":
        def enc_bytes(out, v):
            b = bytes(v)
            _write_long(out, len(b))
            out += b
        return _null_checked(enc_bytes, kind)
    if kind == "record":
        field_encs = [(n, _compile_encoder(ft)) for n, ft in payload]

        def enc_record(out, v):
            vals = (
                v if isinstance(v, dict)
                else v.asDict() if hasattr(v, "asDict") else dict(v)
            )
            for name, fe in field_encs:
                try:
                    fe(out, vals.get(name))
                except ValueError as e:
                    raise ValueError(f"field {name!r}: {e}") from None

        return _null_checked(enc_record, kind)
    if kind == "array":
        item_enc = _compile_encoder(payload)

        def enc_array(out, v):
            items = list(v)
            if items:  # spec: blocks of (count, items...), 0 terminator
                _write_long(out, len(items))
                for it in items:
                    item_enc(out, it)
            _write_long(out, 0)

        return _null_checked(enc_array, kind)
    if kind == "map":
        val_enc = _compile_encoder(payload)

        def enc_map(out, v):
            # Arrow hands Spark MapType to pandas as a list of (k, v)
            # tuples; plain dicts come from Python callers — accept both
            entries = (
                list(v.items()) if isinstance(v, dict) else [tuple(e) for e in v]
            )
            if entries:
                _write_long(out, len(entries))
                for k, mv in entries:
                    raw = str(k).encode("utf-8")
                    _write_long(out, len(raw))
                    out += raw
                    val_enc(out, mv)
            _write_long(out, 0)

        return _null_checked(enc_map, kind)
    if kind == "decimal":
        scale = payload[1]

        def enc_decimal(out, v):
            raw = _unscaled_bytes(v, scale)
            _write_long(out, len(raw))
            out += raw

        return _null_checked(enc_decimal, kind)
    if kind == "timestamp-millis":
        def enc_ts(out, v):
            _write_long(out, _to_millis(v))
        return _null_checked(enc_ts, kind)
    raise ValueError(f"unsupported avro type {kind!r}")  # pragma: no cover


def _null_checked(enc, kind):
    def checked(out, v):
        if _is_null(v):
            raise ValueError(f"null value in non-nullable {kind} position")
        enc(out, v)

    return checked


def _compile_decoder(t):
    """Compile a schema node into a closure ``dec(buf, pos) -> (v, pos)``;
    inverse of :func:`_compile_encoder`, same once-not-per-row rationale."""
    kind, payload = _norm(t)
    if kind == "null_union":
        inner = _compile_decoder(payload)

        def dec_null(buf, pos):
            branch, pos = _read_long(buf, pos)
            if branch == 0:
                return None, pos
            return inner(buf, pos)

        return dec_null
    if kind in ("int", "long"):
        return _read_long
    if kind == "boolean":
        def dec_bool(buf, pos):
            return buf[pos] != 0, pos + 1
        return dec_bool
    if kind == "double":
        def dec_double(buf, pos):
            return struct.unpack_from("<d", buf, pos)[0], pos + 8
        return dec_double
    if kind == "float":
        def dec_float(buf, pos):
            return struct.unpack_from("<f", buf, pos)[0], pos + 4
        return dec_float
    if kind == "string":
        def dec_string(buf, pos):
            n, pos = _read_long(buf, pos)
            return buf[pos : pos + n].decode("utf-8"), pos + n
        return dec_string
    if kind == "bytes":
        def dec_bytes(buf, pos):
            n, pos = _read_long(buf, pos)
            return bytes(buf[pos : pos + n]), pos + n
        return dec_bytes
    if kind == "record":
        field_decs = [(n, _compile_decoder(ft)) for n, ft in payload]

        def dec_record(buf, pos):
            rec = {}
            for name, fd in field_decs:
                rec[name], pos = fd(buf, pos)
            return rec, pos

        return dec_record
    if kind == "array":
        item_dec = _compile_decoder(payload)

        def dec_array(buf, pos):
            items = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return items, pos
                if n < 0:  # spec: negative count prefixes a block byte-size
                    _, pos = _read_long(buf, pos)
                    n = -n
                for _i in range(n):
                    item, pos = item_dec(buf, pos)
                    items.append(item)

        return dec_array
    if kind == "map":
        val_dec = _compile_decoder(payload)

        def dec_map(buf, pos):
            entries = {}
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return entries, pos
                if n < 0:
                    _, pos = _read_long(buf, pos)
                    n = -n
                for _i in range(n):
                    kl, pos = _read_long(buf, pos)
                    key = buf[pos : pos + kl].decode("utf-8")
                    pos += kl
                    entries[key], pos = val_dec(buf, pos)

        return dec_map
    if kind == "decimal":
        scale = payload[1]

        def dec_decimal(buf, pos):
            n, pos = _read_long(buf, pos)
            unscaled = int.from_bytes(buf[pos : pos + n], "big", signed=True)
            return _decimal.Decimal(unscaled).scaleb(-scale), pos + n

        return dec_decimal
    if kind == "timestamp-millis":
        def dec_ts(buf, pos):
            ms, pos = _read_long(buf, pos)
            return _EPOCH + _dt.timedelta(milliseconds=ms), pos
        return dec_ts
    raise ValueError(f"unsupported avro type {kind!r}")  # pragma: no cover


def _compile_record_encoder(fields: list[tuple[str, object]]):
    field_encs = [(n, _compile_encoder(t)) for n, t in fields]

    def enc(values: dict) -> bytes:
        out = bytearray()
        for name, fe in field_encs:
            try:
                fe(out, values.get(name))
            except ValueError as e:
                raise ValueError(f"field {name!r}: {e}") from None
        return bytes(out)

    return enc


def _compile_record_decoder(fields: list[tuple[str, object]]):
    field_decs = [(n, _compile_decoder(t)) for n, t in fields]

    def dec(buf: bytes) -> dict:
        pos = 0
        out = {}
        for name, fd in field_decs:
            out[name], pos = fd(buf, pos)
        return out

    return dec


def encode_record(values: dict, fields: list[tuple[str, object]]) -> bytes:
    """Encode one record's field values in declaration order. One-shot
    convenience — hot paths compile once via ``_compile_record_encoder``."""
    return _compile_record_encoder(fields)(values)


def decode_record(buf: bytes, fields: list[tuple[str, object]]) -> dict:
    """Decode one record; inverse of :func:`encode_record`."""
    return _compile_record_decoder(fields)(buf)


# ---------------------------------------------------------------------------
# DataFrame surface
# ---------------------------------------------------------------------------

_jvm_avro_probe: bool | None = None


def jvm_avro_usable(spark) -> bool:
    """True iff the spark-avro connector is loaded (one tiny probe job,
    cached for the process lifetime)."""
    global _jvm_avro_probe
    if _jvm_avro_probe is None:
        try:
            from pyspark.sql.avro.functions import from_avro

            spark.range(1).select(
                from_avro(F.lit(b"\x00"), '["null", "long"]')
            ).collect()
            _jvm_avro_probe = True
        except Exception:
            _jvm_avro_probe = False
    return _jvm_avro_probe


def encode_avro_cells(
    df: DataFrame,
    fields: list[tuple[str, object]],
    out_col: str,
    use_jvm: bool | None = None,
) -> DataFrame:
    """Pack the named columns into one Avro-binary cell column, keeping
    every other column. The write side of an Avro record cell (A8)."""
    spark = df.sparkSession
    jvm = jvm_avro_usable(spark) if use_jvm is None else use_jvm
    names = [n for n, _ in fields]
    if jvm:
        from pyspark.sql.avro.functions import to_avro

        packed: Column = to_avro(
            F.struct(*[F.col(n) for n in names]),
            record_schema_json("cell", fields),
        )
        return df.withColumn(out_col, packed)

    keep = [c for c in df.columns if c not in names]
    out_schema = StructType(
        [df.schema[c] for c in keep] + [StructField(out_col, BinaryType())]
    )

    def encode_batches(batches):
        enc_fn = _compile_record_encoder(fields)  # once per task, not per row
        for pdf in batches:
            enc = [enc_fn(rec) for rec in pdf[names].to_dict("records")]
            out = pdf[keep].copy()
            out[out_col] = enc
            yield out

    return df.mapInPandas(encode_batches, schema=out_schema)


def decode_avro_cells(
    df: DataFrame,
    bin_col: str,
    fields: list[tuple[str, object]],
    use_jvm: bool | None = None,
    drop: bool = True,
) -> DataFrame:
    """Decode an Avro-binary cell column into typed columns (one per
    record field), keeping every other column."""
    spark = df.sparkSession
    jvm = jvm_avro_usable(spark) if use_jvm is None else use_jvm
    names = [n for n, _ in fields]
    if jvm:
        from pyspark.sql.avro.functions import from_avro

        decoded = df.withColumn(
            "__rec__", from_avro(F.col(bin_col), record_schema_json("cell", fields))
        )
        cols = [c for c in df.columns if c != bin_col or not drop]
        return decoded.select(
            *cols, *[F.col(f"__rec__.{n}").alias(n) for n in names]
        )

    keep = [c for c in df.columns if c != bin_col or not drop]
    out_schema = StructType(
        [df.schema[c] for c in keep] + list(spark_struct_type(fields).fields)
    )

    def decode_batches(batches):
        import pandas as pd

        dec_fn = _compile_record_decoder(fields)  # once per task, not per row
        for pdf in batches:
            recs = [dec_fn(b) for b in pdf[bin_col]]
            out = pdf[keep].copy()
            rec_df = pd.DataFrame(recs, index=out.index)
            for n in names:
                out[n] = rec_df[n]
            yield out

    return df.mapInPandas(decode_batches, schema=out_schema)
