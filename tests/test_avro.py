"""Avro cell codec tests (SURVEY §1.2 cell-type mapping, round-4).

The golden byte strings come straight from the Avro 1.12 spec's binary
encoding section (zigzag varint examples, length-prefixed utf8, IEEE LE
doubles) — they pin SPEC compliance, which a symmetric encode/decode bug
could not reveal through round-trips alone.
"""

import struct

from hypothesis import given, settings, strategies as st

from kiji_scoring_spark.operators import avro as av

FIELDS = [
    ("name", "string"),
    ("cents", "long"),
    ("nation", "int"),
    ("score", ["null", "double"]),
    ("flag", "boolean"),
    ("blob", "bytes"),
]


def test_golden_bytes_match_avro_spec():
    # spec: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                    (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        assert av.encode_record({"v": n}, [("v", "long")]) == want
    # string = varint length + utf8 bytes; spec example "foo" -> 06 66 6f 6f
    assert av.encode_record({"v": "foo"}, [("v", "string")]) == b"\x06foo"
    # double = 8 LE IEEE bytes, no tag
    assert av.encode_record({"v": 1.5}, [("v", "double")]) == struct.pack("<d", 1.5)
    # nullable union: branch index (zigzag varint) then the value
    assert av.encode_record({"v": None}, [("v", ["null", "long"])]) == b"\x00"
    assert av.encode_record({"v": 3}, [("v", ["null", "long"])]) == b"\x02\x06"
    # booleans are a single raw byte
    assert av.encode_record({"v": True}, [("v", "boolean")]) == b"\x01"


records_strategy = st.fixed_dictionaries(
    {
        "name": st.text(max_size=12),
        "cents": st.integers(-(2**62), 2**62),
        "nation": st.integers(-(2**31), 2**31 - 1),
        "score": st.none() | st.floats(allow_nan=False, width=64),
        "flag": st.booleans(),
        "blob": st.binary(max_size=8),
    }
)


@settings(max_examples=200, deadline=None)
@given(rec=records_strategy)
def test_roundtrip_identity(rec):
    assert av.decode_record(av.encode_record(rec, FIELDS), FIELDS) == rec


def test_golden_bytes_nested_and_logical_types():
    """Golden bytes for the round-5 codec extension, derived from the
    Avro 1.12 spec: arrays/maps are blocks (count, items..., 0-terminator
    — the spec's own [3, 27] -> 04 06 36 00 example), nested records
    concatenate with no framing, decimal is a length-prefixed minimal
    big-endian two's-complement unscaled int, timestamp-millis is a
    zigzag-varint epoch-millis long."""
    import datetime
    from decimal import Decimal

    # spec's array example: [3, 27] as array<long> -> 04 06 36 00
    arr = {"type": "array", "items": "long"}
    assert av.encode_record({"v": [3, 27]}, [("v", arr)]) == b"\x04\x06\x36\x00"
    assert av.decode_record(b"\x04\x06\x36\x00", [("v", arr)]) == {"v": [3, 27]}
    # empty array is just the terminator
    assert av.encode_record({"v": []}, [("v", arr)]) == b"\x00"
    # map {"a": 1} as map<long>: count=1 (02), key "a" (02 61), value 02, end 00
    mp = {"type": "map", "values": "long"}
    assert av.encode_record({"v": {"a": 1}}, [("v", mp)]) == b"\x02\x02a\x02\x00"
    assert av.decode_record(b"\x02\x02a\x02\x00", [("v", mp)]) == {"v": {"a": 1}}
    # nested record {a: 27, b: {c: "x"}} -> 36 | 02 78 (no framing)
    rec = {
        "type": "record",
        "name": "inner",
        "fields": [{"name": "c", "type": "string"}],
    }
    fields = [("a", "long"), ("b", rec)]
    assert av.encode_record({"a": 27, "b": {"c": "x"}}, fields) == b"\x36\x02x"
    # decimal(12,2) 123.45 -> unscaled 12345 -> 0x3039, length-prefixed 04
    dec = {"type": "bytes", "logicalType": "decimal", "precision": 12, "scale": 2}
    assert av.encode_record({"v": Decimal("123.45")}, [("v", dec)]) == b"\x04\x30\x39"
    assert av.decode_record(b"\x04\x30\x39", [("v", dec)]) == {"v": Decimal("123.45")}
    # negative decimal: -1.00 scale 2 -> unscaled -100 -> minimal 0x9c
    assert av.encode_record({"v": Decimal("-1.00")}, [("v", dec)]) == b"\x02\x9c"
    # minimal two's complement at the sign boundary: -128 is ONE byte 0x80
    dec0 = {"type": "bytes", "logicalType": "decimal", "precision": 5, "scale": 0}
    assert av.encode_record({"v": Decimal(-128)}, [("v", dec0)]) == b"\x02\x80"
    assert av.encode_record({"v": Decimal(128)}, [("v", dec0)]) == b"\x04\x00\x80"
    # timestamp-millis: 1970-01-01T00:00:01Z = 1000 ms -> zigzag 2000 -> d0 0f
    ts = {"type": "long", "logicalType": "timestamp-millis"}
    one_sec = datetime.datetime(1970, 1, 1, 0, 0, 1)
    assert av.encode_record({"v": one_sec}, [("v", ts)]) == b"\xd0\x0f"
    assert av.decode_record(b"\xd0\x0f", [("v", ts)]) == {"v": one_sec}


NESTED_FIELDS = [
    ("okey", "long"),
    (
        "stats",
        {
            "type": "record",
            "name": "stats",
            "fields": [
                {
                    "name": "total",
                    "type": {
                        "type": "bytes",
                        "logicalType": "decimal",
                        "precision": 18,
                        "scale": 2,
                    },
                },
                {"name": "flag", "type": "boolean"},
                {"name": "note", "type": ["null", "string"]},
            ],
        },
    ),
    ("tags", {"type": "array", "items": "string"}),
    ("props", {"type": "map", "values": "long"}),
    (
        "placed_at",
        {"type": "long", "logicalType": "timestamp-millis"},
    ),
]


@settings(max_examples=100, deadline=None)
@given(
    rec=st.fixed_dictionaries(
        {
            "okey": st.integers(-(2**62), 2**62),
            "stats": st.fixed_dictionaries(
                {
                    "total": st.decimals(
                        min_value=-(10**15), max_value=10**15, places=2
                    ),
                    "flag": st.booleans(),
                    "note": st.none() | st.text(max_size=8),
                }
            ),
            "tags": st.lists(st.text(max_size=6), max_size=5),
            "props": st.dictionaries(st.text(max_size=4), st.integers(-100, 100), max_size=4),
            "placed_at": st.datetimes(
                min_value=__import__("datetime").datetime(1900, 1, 1),
                max_value=__import__("datetime").datetime(2200, 1, 1),
            ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
        }
    )
)
def test_nested_roundtrip_identity(rec):
    assert av.decode_record(av.encode_record(rec, NESTED_FIELDS), NESTED_FIELDS) == rec


def test_nested_dataframe_roundtrip(spark):
    """End-to-end over Arrow batches with nested record, array, map,
    decimal, and timestamp columns — the shapes real Kiji cells carry."""
    import datetime
    from decimal import Decimal

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (
                1,
                (Decimal("10.50"), True, "hi"),
                ["a", "b"],
                {"k1": 1, "k2": 2},
                datetime.datetime(2024, 3, 10, 6, 30),
            ),
            (2, (Decimal("-0.25"), False, None), [], {}, datetime.datetime(1999, 12, 31, 23, 59, 59)),
        ],
        "okey long, stats struct<total: decimal(18,2), flag: boolean, note: string>, "
        "tags array<string>, props map<string, bigint>, placed_at timestamp",
    )
    enc = av.encode_avro_cells(df, NESTED_FIELDS, "cell", use_jvm=False)
    assert set(enc.columns) == {"cell"}
    dec = av.decode_avro_cells(enc, "cell", NESTED_FIELDS, use_jvm=False)
    rows = {r["okey"]: r for r in dec.collect()}
    assert rows[1]["stats"]["total"] == Decimal("10.50")
    assert rows[1]["stats"]["note"] == "hi"
    assert sorted(rows[1]["props"].items()) == [("k1", 1), ("k2", 2)]
    assert rows[1]["tags"] == ["a", "b"]
    assert rows[1]["placed_at"] == datetime.datetime(2024, 3, 10, 6, 30)
    assert rows[2]["stats"]["note"] is None
    assert rows[2]["tags"] == []
    assert rows[2]["props"] == {}


def test_nan_encodes_as_null_branch():
    """Arrow->pandas hands NULL nullable numerics to Python as float NaN;
    the encoder must write the null union branch (00), not branch 1 with a
    NaN payload — the exact bytes the JVM to_avro path writes for NULL.
    Round-trips alone can't catch this (Arrow re-ingest maps NaN back to
    null), so pin the raw bytes."""
    nan = float("nan")
    assert av.encode_record({"v": nan}, [("v", ["null", "double"])]) == b"\x00"
    assert av.encode_record({"v": nan}, [("v", ["null", "long"])]) == b"\x00"
    # non-nullable field: NaN is a null, and nulls are an error
    try:
        av.encode_record({"v": nan}, [("v", "long")])
        raise AssertionError("expected ValueError for NaN in non-nullable")
    except ValueError:
        pass


def test_dataframe_encode_null_long_cell_bytes(spark):
    """A NULL in a nullable-long column must survive the pandas-fallback
    encode as the null branch byte — previously raised (cannot convert
    NaN to int) because the batch path only checked `is None`."""
    df = spark.createDataFrame(
        [(1, None), (2, 7)], "id long, cents long"
    )
    enc = av.encode_avro_cells(df, [("cents", ["null", "long"])], "cell",
                               use_jvm=False)
    cells = {r["id"]: bytes(r["cell"]) for r in enc.collect()}
    assert cells[1] == b"\x00"
    assert cells[2] == b"\x02\x0e"


def test_multifield_concatenation_order():
    """Fields encode in declaration order with no separators."""
    fields = [("a", "long"), ("b", "string")]
    assert av.encode_record({"a": 1, "b": "x"}, fields) == b"\x02\x02x"


def test_dataframe_encode_decode_roundtrip(spark):
    """End-to-end over Arrow batches: pack columns into a binary cell,
    decode back, values and types survive."""
    rows = [(1, "alice", 12345, None), (2, "bob", -50, 2.5)]
    df = spark.createDataFrame(rows, "id long, name string, cents long, score double")
    fields = [("name", "string"), ("cents", "long"), ("score", ["null", "double"])]
    enc = av.encode_avro_cells(df, fields, "cell", use_jvm=False)
    assert set(enc.columns) == {"id", "cell"}
    dec = av.decode_avro_cells(enc, "cell", fields, use_jvm=False)
    got = sorted(
        (r["id"], r["name"], r["cents"], r["score"]) for r in dec.collect()
    )
    assert got == sorted(rows)
    assert dict(dec.dtypes)["cents"] == "bigint"


def test_jvm_probe_is_honest(spark):
    """The auto-picked path must work in THIS environment: probe, then
    run whichever path it picks."""
    df = spark.createDataFrame([(7, "x")], "id long, name string")
    fields = [("name", "string")]
    enc = av.encode_avro_cells(df, fields, "cell")  # use_jvm=None -> auto
    dec = av.decode_avro_cells(enc, "cell", fields)
    assert dec.collect()[0]["name"] == "x"
