"""Pure-Python Avro/Protobuf codecs: known-answer bytes from the format
specs, round-trip properties, and the Spark mapInPandas decode path."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_1_20_spark.sources.wire_formats import (
    avro_decode,
    avro_encode,
    decode_avro_python,
    decode_protobuf_python,
    pb_decode,
    pb_encode,
)

AVRO_SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "note", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
    ],
}

PB_SCHEMA = {
    1: ("id", "int64"),
    2: ("name", "string"),
    3: ("score", "double"),
    4: ("ok", "bool"),
    5: ("tags", "repeated int64"),
    6: ("delta", "sint64"),
}


def test_avro_known_answer_bytes():
    # Avro spec binary encoding: long 1 → zigzag 2; long -1 → 1;
    # string "foo" → length 3 (zigzag 6) + bytes
    s = {"type": "record", "name": "T", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}
    assert avro_encode(s, {"a": 1, "b": "foo"}) == bytes([0x02, 0x06]) + b"foo"
    assert avro_encode(s, {"a": -1, "b": ""}) == bytes([0x01, 0x00])
    # nullable union: branch index 0 (null) / 1 (value)
    s2 = {"type": "record", "name": "T", "fields": [
        {"name": "n", "type": ["null", "long"]}]}
    assert avro_encode(s2, {"n": None}) == bytes([0x00])
    assert avro_encode(s2, {"n": 3}) == bytes([0x02, 0x06])


def test_pb_known_answer_bytes():
    # protobuf docs example: field 1, varint 150 → 08 96 01
    assert pb_encode({1: ("a", "int64")}, {"a": 150}) == bytes([0x08, 0x96, 0x01])
    # field 2 string "testing" → 12 07 74 65 73 74 69 6e 67
    assert pb_encode({2: ("b", "string")}, {"b": "testing"}) == bytes(
        [0x12, 0x07]) + b"testing"
    # sint64 -1 → zigzag 1
    assert pb_encode({1: ("d", "sint64")}, {"d": -1}) == bytes([0x08, 0x01])


def test_avro_roundtrip_record():
    rec = {"id": -42, "name": "héllo", "score": 2.5, "ok": True,
           "note": None, "tags": [1, -2, 3]}
    assert avro_decode(AVRO_SCHEMA, avro_encode(AVRO_SCHEMA, rec)) == rec
    rec2 = {**rec, "note": "x", "tags": []}
    assert avro_decode(AVRO_SCHEMA, avro_encode(AVRO_SCHEMA, rec2)) == rec2


def test_pb_roundtrip_and_unknown_field_skip():
    msg = {"id": 7, "name": "n1", "score": -0.5, "ok": True,
           "tags": [5, 6], "delta": -9}
    assert pb_decode(PB_SCHEMA, pb_encode(PB_SCHEMA, msg)) == msg
    # decoding with a REDUCED schema skips unknown fields (forward compat)
    reduced = {1: ("id", "int64"), 5: ("tags", "repeated int64")}
    got = pb_decode(reduced, pb_encode(PB_SCHEMA, msg))
    assert got == {"id": 7, "tags": [5, 6]}


def test_pb_packed_repeated_decode():
    # packed encoding: tag(5, LEN) + byte length + varints
    payload = bytes([0x2A, 0x03, 0x01, 0x02, 0x03])
    got = pb_decode({5: ("tags", "repeated int64")}, payload)
    assert got == {"tags": [1, 2, 3]}


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.one_of(st.none(), st.text(max_size=10)),
    st.lists(st.integers(min_value=-(2**31), max_value=2**31), max_size=8),
)
def test_avro_roundtrip_property(i, s, d, b, n, tags):
    rec = {"id": i, "name": s, "score": d, "ok": b, "note": n, "tags": tags}
    assert avro_decode(AVRO_SCHEMA, avro_encode(AVRO_SCHEMA, rec)) == rec


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
    st.lists(st.integers(min_value=0, max_value=2**40), max_size=8),
    st.integers(min_value=-(2**40), max_value=2**40),
)
def test_pb_roundtrip_property(i, s, d, b, tags, delta):
    msg = {"id": i, "name": s, "score": d, "ok": b, "tags": tags, "delta": delta}
    assert pb_decode(PB_SCHEMA, pb_encode(PB_SCHEMA, msg)) == msg


def test_spark_decode_avro_and_protobuf(spark):
    """The mapInPandas wiring: binary column → typed columns, both
    formats, including null union branches."""
    recs = [
        {"id": 1, "name": "a", "score": 1.5, "ok": True, "note": None, "tags": [1]},
        {"id": 2, "name": "b", "score": -2.0, "ok": False, "note": "x", "tags": []},
    ]
    avro_rows = [(avro_encode(AVRO_SCHEMA, r),) for r in recs]
    df = spark.createDataFrame(avro_rows, "value binary")
    out = decode_avro_python(
        df, "value", AVRO_SCHEMA,
        "id bigint, name string, score double, ok boolean, note string, tags array<bigint>",
    )
    got = sorted((r["id"], r["name"], r["score"], r["ok"], r["note"], list(r["tags"]))
                 for r in out.collect())
    assert got == [(1, "a", 1.5, True, None, [1]), (2, "b", -2.0, False, "x", [])]

    msgs = [{"id": 1, "name": "a", "score": 0.5, "ok": True, "tags": [7], "delta": -3},
            {"id": 2, "name": "b", "score": 1.5, "ok": False, "tags": [], "delta": 4}]
    pb_rows = [(pb_encode(PB_SCHEMA, m),) for m in msgs]
    df2 = spark.createDataFrame(pb_rows, "value binary")
    out2 = decode_protobuf_python(
        df2, "value", PB_SCHEMA,
        "id bigint, name string, score double, ok boolean, tags array<bigint>, delta bigint",
    )
    got2 = sorted((r["id"], r["name"], r["score"], r["ok"], list(r["tags"]), r["delta"])
                  for r in out2.collect())
    assert got2 == [(1, "a", 0.5, True, [7], -3), (2, "b", 1.5, False, [], 4)]


def test_streaming_avro_decode(spark, tmp_path):
    """The wire codecs compose with Structured Streaming: a binary Avro
    column decodes per micro-batch through the same mapInPandas path
    (parity with Flink's avro format on a streaming source)."""
    import os

    src = str(tmp_path / "avro_stream")
    os.makedirs(src, exist_ok=True)
    schema = {"type": "record", "name": "E", "fields": [
        {"name": "id", "type": "long"}, {"name": "name", "type": "string"}]}
    recs = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    import pandas as pd
    pd.DataFrame({"value": [avro_encode(schema, r) for r in recs]}).to_parquet(
        os.path.join(src, "b0.parquet"))

    stream = spark.readStream.schema("value binary").parquet(src)
    decoded = decode_avro_python(stream, "value", schema, "id bigint, name string")
    q = (decoded.writeStream.format("memory").queryName("avro_stream_out")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = sorted((r["id"], r["name"]) for r in spark.table("avro_stream_out").collect())
    finally:
        q.stop()
    assert got == [(1, "a"), (2, "b")]
