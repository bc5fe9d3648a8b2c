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

Supported field types: ``boolean int long float double string bytes``
and their ``["null", T]`` nullable unions.
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
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


def _base_type(avro_type) -> tuple[str, bool]:
    """('long', nullable?) from 'long' or ['null', 'long']."""
    if isinstance(avro_type, list):
        if len(avro_type) != 2 or avro_type[0] != "null":
            raise ValueError(f"only ['null', T] unions supported, got {avro_type}")
        return avro_type[1], True
    return avro_type, False


def record_schema_json(name: str, fields: list[tuple[str, object]]) -> str:
    """Avro record schema JSON for the JVM ``from_avro`` path."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "fields": [{"name": n, "type": t} for n, t in fields],
        }
    )


def spark_struct_type(fields: list[tuple[str, object]]) -> StructType:
    out = []
    for n, t in fields:
        base, nullable = _base_type(t)
        out.append(StructField(n, _SPARK_TYPES[base], nullable))
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
    """NULL check that treats float NaN as null: Spark's Arrow->pandas
    conversion represents NULL nullable numerics as NaN (float64), so an
    encode path that only checks ``is None`` would either crash on
    nullable-long NaN or silently write union branch 1 + NaN payload
    instead of the null branch — wrong Avro bytes vs the JVM path."""
    return v is None or (isinstance(v, float) and v != v)


def encode_record(values: dict, fields: list[tuple[str, object]]) -> bytes:
    """Encode one record's field values in declaration order."""
    out = bytearray()
    for name, t in fields:
        base, nullable = _base_type(t)
        v = values.get(name)
        if nullable:
            if _is_null(v):
                _write_long(out, 0)  # union branch: null
                continue
            _write_long(out, 1)  # union branch: value
        elif _is_null(v):
            raise ValueError(f"field {name!r} is not nullable")
        if base in ("int", "long"):
            _write_long(out, int(v))
        elif base == "boolean":
            out.append(1 if v else 0)
        elif base == "double":
            out += struct.pack("<d", float(v))
        elif base == "float":
            out += struct.pack("<f", float(v))
        elif base == "string":
            raw = str(v).encode("utf-8")
            _write_long(out, len(raw))
            out += raw
        elif base == "bytes":
            _write_long(out, len(v))
            out += bytes(v)
        else:
            raise ValueError(f"unsupported avro type {base!r}")
    return bytes(out)


def decode_record(buf: bytes, fields: list[tuple[str, object]]) -> dict:
    """Decode one record; inverse of :func:`encode_record`."""
    pos = 0
    out: dict = {}
    for name, t in fields:
        base, nullable = _base_type(t)
        if nullable:
            branch, pos = _read_long(buf, pos)
            if branch == 0:
                out[name] = None
                continue
        if base in ("int", "long"):
            out[name], pos = _read_long(buf, pos)
        elif base == "boolean":
            out[name] = buf[pos] != 0
            pos += 1
        elif base == "double":
            (out[name],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif base == "float":
            (out[name],) = struct.unpack_from("<f", buf, pos)
            pos += 4
        elif base == "string":
            n, pos = _read_long(buf, pos)
            out[name] = buf[pos : pos + n].decode("utf-8")
            pos += n
        elif base == "bytes":
            n, pos = _read_long(buf, pos)
            out[name] = bytes(buf[pos : pos + n])
            pos += n
        else:
            raise ValueError(f"unsupported avro type {base!r}")
    return out


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
        for pdf in batches:
            enc = [
                encode_record(rec, fields)
                for rec in pdf[names].to_dict("records")
            ]
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

        for pdf in batches:
            recs = [decode_record(b, fields) for b in pdf[bin_col]]
            out = pdf[keep].copy()
            rec_df = pd.DataFrame(recs, index=out.index)
            for n in names:
                out[n] = rec_df[n]
            yield out

    return df.mapInPandas(decode_batches, schema=out_schema)
