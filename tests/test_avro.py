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
