"""Unit tests: admin operators (Q4/Q6/Q7), schema registry decode (P1),
and config validation (V1-V4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flash_cdc_spark.operators.admin import find_duplicates, point_lookup, upsert
from flash_cdc_spark.operators.validation import validate_configs
from flash_cdc_spark.sources.changelog import ReplayArgs, decode_seq, encode_seq, resolve_replay
from flash_cdc_spark.sources.registry import SchemaRegistry, decode_envelope


def test_point_lookup(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert point_lookup(df, "id", 2)["v"] == "b"
    assert point_lookup(df, "id", 99) is None


def test_find_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "x", "t1"), (2, "x", "t1"), (3, "y", "t2")],
        "id long, oauth_client_id string, topic_name string",
    )
    dups = find_duplicates(df, ["oauth_client_id", "topic_name"]).collect()
    assert len(dups) == 1 and dups[0]["dup_count"] == 2


def test_upsert_replaces_and_appends(spark):
    target = spark.createDataFrame([(1, "old"), (2, "keep")], "id long, v string")
    updates = spark.createDataFrame([(1, "new"), (3, "ins")], "id long, v string")
    got = {r["id"]: r["v"] for r in upsert(target, updates, "id").collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_schema_registry_decode_json_two_schemas(spark):
    schema = T.StructType([T.StructField("a", T.LongType())])
    reg = SchemaRegistry()
    reg.register("s1", schema)
    reg.register("s2", schema)
    df = spark.createDataFrame(
        [("s1", b'{"a": 1}'), ("s2", b'{"a": 2}'), ("s9", b'{"a": 3}')],
        "schema_id string, payload binary",
    )
    rows = {r["schema_id"]: r["decoded"] for r in decode_envelope(df, reg).collect()}
    assert rows["s1"]["a"] == 1 and rows["s2"]["a"] == 2
    assert rows["s9"] is None  # unknown schema id → null (registry miss)
    with pytest.raises(KeyError):
        reg.get("s9")


def test_replay_cursor_codec_roundtrip():
    assert decode_seq(encode_seq(12345)) == 12345
    with pytest.raises(Exception):
        decode_seq("!!!")


def test_resolve_replay_invalid_mode():
    with pytest.raises(ValueError):
        resolve_replay(ReplayArgs(mode="bogus"), "/tmp/nope")


def test_validate_configs(spark):
    rows = [
        # valid row
        (1, "/data/AChangeEvent", "hooks.example.com/x", "password", "u@x.io", "pw",
         "h.example.com:7443", 100),
        # bad topic + bad batch size
        (2, "/other/Thing", "https://ok.example.com", "password", "u@x.io", "pw",
         "h:1", 0),
        # missing creds for grant + bad email
        (3, "/data/BChangeEvent", "https://ok.example.com", "client_credentials",
         "not-an-email", None, None, 50),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, topic_name string, webhook_url string, oauth_grant_type string,"
        "oauth_username string, oauth_password string, pubsub_host string,"
        "flow_batch_size int",
    )
    out = {r["id"]: r for r in validate_configs(df).collect()}
    assert out[1]["is_valid"]
    assert out[1]["webhook_url"] == "https://hooks.example.com/x"  # normalized
    assert set(out[2]["violations"]) == {"topic_pattern", "flow_batch_size"}
    assert "grant_credentials" in out[3]["violations"]
    assert "email" in out[3]["violations"]
    assert not out[3]["is_valid"]
