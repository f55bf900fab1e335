"""Pure-Python Avro binary codec: spec byte-vector pins + roundtrips +
the Spark decode path that runs WITHOUT the spark-avro jar."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flash_cdc_spark.functions import avro_codec as AC

RECORD_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Evt",
        "fields": [
            {"name": "name", "type": ["null", "string"], "default": None},
            {"name": "n", "type": "long"},
            {"name": "ok", "type": "boolean"},
            {"name": "score", "type": "double"},
            {"name": "ids", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {
                "name": "sub",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "Sub",
                        "fields": [{"name": "x", "type": "int"}],
                    },
                ],
                "default": None,
            },
        ],
    }
)


def test_spec_byte_vectors():
    """Known encodings straight from the Avro spec's binary-encoding
    examples: zigzag longs, length-prefixed strings, array blocks."""
    # spec: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    for value, raw in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                       (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        assert AC.encode(AC.parse_schema('"long"'), value) == raw
        assert AC.decode(AC.parse_schema('"long"'), raw) == value
    # spec: string "foo" → 06 66 6f 6f
    assert AC.encode(AC.parse_schema('"string"'), "foo") == b"\x06foo"
    # spec: array [3, 27] of long → 04 06 36 00
    arr = AC.parse_schema(json.dumps({"type": "array", "items": "long"}))
    assert AC.encode(arr, [3, 27]) == b"\x04\x06\x36\x00"
    assert AC.decode(arr, b"\x04\x06\x36\x00") == [3, 27]


def test_multi_block_and_negative_block_arrays_decode():
    """Writers may split arrays into blocks and flag byte-size with a
    negative count — decoders must accept both (spec §binary encoding)."""
    arr = AC.parse_schema(json.dumps({"type": "array", "items": "long"}))
    two_blocks = b"\x02\x06" + b"\x02\x36" + b"\x00"  # [3] + [27]
    assert AC.decode(arr, two_blocks) == [3, 27]
    # negative count -1 (encoded 01), block byte-size 1 (02), item 3, end
    neg_block = b"\x01\x02\x06\x00"
    assert AC.decode(arr, neg_block) == [3]


def test_record_roundtrip_all_types():
    sch = AC.parse_schema(RECORD_SCHEMA)
    for value in [
        {"name": "alpha", "n": -(2**40), "ok": True, "score": -1.5,
         "ids": ["a", "b"], "props": {"k": 7}, "sub": {"x": -3}},
        {"name": None, "n": 0, "ok": False, "score": 0.0,
         "ids": [], "props": {}, "sub": None},
    ]:
        assert AC.decode(sch, AC.encode(sch, value)) == value


def test_enum_fixed_bytes_roundtrip():
    sch = AC.parse_schema(json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "e", "type": {"type": "enum", "name": "E",
                                   "symbols": ["A", "B", "C"]}},
            {"name": "fx", "type": {"type": "fixed", "name": "Fx", "size": 3}},
            {"name": "by", "type": "bytes"},
            {"name": "f", "type": "float"},
        ]}))
    v = {"e": "C", "fx": b"\x01\x02\x03", "by": b"\xff\x00", "f": 2.5}
    assert AC.decode(sch, AC.encode(sch, v)) == v


def test_trailing_bytes_rejected():
    with pytest.raises(ValueError, match="trailing"):
        AC.decode(AC.parse_schema('"long"'), b"\x02\x00")


def test_unknown_type_reference_rejected():
    with pytest.raises(ValueError, match="unknown type"):
        AC.parse_schema('"NotAType"')


def test_spark_python_avro_decode_no_jar_needed(spark):
    """The P1 Avro branch executes end-to-end without the spark-avro
    jar: payloads Avro-encoded driver-side, decoded executor-side via
    the Arrow-batched pandas UDF into the registry's typed struct."""
    import pyspark.sql.types as T

    from flash_cdc_spark.sources.registry import SchemaRegistry, decode_envelope
    from tests.test_avro_roundtrip import HEADER_AVRO_JSON, _header_schema

    sch = AC.parse_schema(HEADER_AVRO_JSON)
    rows = []
    for i in range(5):
        payload = {
            "ChangeEventHeader": {
                "entityName": "Opportunity",
                "changeType": "UPDATE",
                "recordIds": [f"r{i}_0", f"r{i}_1"],
                "commitTimestamp": 1_700_000_000_000 + i,
            }
        }
        rows.append((f"evt-{i}", "schema-v1", AC.encode(sch, payload)))
    env = spark.createDataFrame(
        rows, "event_id string, schema_id string, payload binary"
    )
    registry = SchemaRegistry()
    registry.register("schema-v1", _header_schema(), avro=HEADER_AVRO_JSON)
    out = decode_envelope(env, registry, use_avro="python")
    got = {
        r["event_id"]: (r["entityName"], r["recordIds"], r["commitTimestamp"])
        for r in out.select("event_id", "decoded.ChangeEventHeader.*").collect()
    }
    assert got["evt-3"] == ("Opportunity", ["r3_0", "r3_1"], 1_700_000_000_003)
    assert len(got) == 5


# --- property-based fuzz: encode∘decode == identity over the full
# value domain (int64 edges, NaN-free doubles, unicode incl.
# surrogate-free astral chars, nested arrays/maps, null unions) ---

from hypothesis import given, settings
from hypothesis import strategies as st

_FUZZ_SCHEMA = AC.parse_schema(json.dumps({
    "type": "record", "name": "Fz", "fields": [
        {"name": "n", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "kv", "type": {"type": "map", "values": ["null", "string"]}},
    ]}))

_text = st.text(alphabet=st.characters(codec="utf-8"), max_size=40)

@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=-(2**63), max_value=2**63 - 1),
    s=st.one_of(st.none(), _text),
    d=st.floats(allow_nan=False),  # NaN != NaN breaks equality, not codec
    b=st.booleans(),
    raw=st.binary(max_size=64),
    xs=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=8),
    kv=st.dictionaries(_text, st.one_of(st.none(), _text), max_size=6),
)
def test_fuzz_roundtrip_identity(n, s, d, b, raw, xs, kv):
    v = {"n": n, "s": s, "d": d, "b": b, "raw": raw, "xs": xs, "kv": kv}
    assert AC.decode(_FUZZ_SCHEMA, AC.encode(_FUZZ_SCHEMA, v)) == v


def test_multi_branch_union_rejected():
    """["null","string","long"] must error, not silently re-type a long
    through the string branch."""
    sch = AC.parse_schema(json.dumps({
        "type": "record", "name": "U", "fields": [
            {"name": "x", "type": ["null", "string", "long"]}]}))
    with pytest.raises(ValueError, match="multi-branch"):
        AC.encode(sch, {"x": 5})
