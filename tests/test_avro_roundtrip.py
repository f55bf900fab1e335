"""P1 real-Avro branch: envelope encode→decode roundtrip via the
spark-avro external module.

The container used for CI has no Maven mirror, so the module can't be
resolved and these tests SKIP (the JSON fallback branch is exercised by
q_envelope_decode instead). On a cluster with the jar on the classpath
(or ``SPARK_GRAFT_AVRO=1`` + a reachable mirror) they run for real —
pinning that the Avro branch is wired correctly, not just gated off.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flash_cdc_spark.sources.registry import SchemaRegistry, avro_available, decode_envelope

HEADER_AVRO_JSON = """
{"type": "record", "name": "DecodedChangeEvent", "fields": [
  {"name": "ChangeEventHeader", "type": {"type": "record", "name": "Header", "fields": [
    {"name": "entityName", "type": ["null", "string"], "default": null},
    {"name": "changeType", "type": ["null", "string"], "default": null},
    {"name": "recordIds", "type": ["null", {"type": "array", "items": "string"}], "default": null},
    {"name": "commitTimestamp", "type": ["null", "long"], "default": null}
  ]}}
]}
"""


def _header_schema() -> T.StructType:
    header = T.StructType(
        [
            T.StructField("entityName", T.StringType()),
            T.StructField("changeType", T.StringType()),
            T.StructField("recordIds", T.ArrayType(T.StringType())),
            T.StructField("commitTimestamp", T.LongType()),
        ]
    )
    return T.StructType([T.StructField("ChangeEventHeader", header)])


def test_avro_roundtrip_when_module_loaded(spark):
    if not avro_available(spark):
        pytest.skip("spark-avro module not on the classpath (offline container)")
    from pyspark.sql.avro.functions import to_avro

    payload = F.struct(
        F.struct(
            F.lit("Opportunity").alias("entityName"),
            F.lit("UPDATE").alias("changeType"),
            F.array(F.lit("r1"), F.lit("r2")).alias("recordIds"),
            F.lit(1_700_000_000_000).alias("commitTimestamp"),
        ).alias("ChangeEventHeader")
    )
    env = spark.range(3).select(
        F.concat(F.lit("evt-"), F.col("id").cast("string")).alias("event_id"),
        F.lit("schema-v1").alias("schema_id"),
        to_avro(payload, HEADER_AVRO_JSON).alias("payload"),
    )
    registry = SchemaRegistry()
    registry.register("schema-v1", _header_schema(), avro=HEADER_AVRO_JSON)
    decoded = decode_envelope(env, registry, use_avro=True)
    rows = decoded.select("decoded.ChangeEventHeader.*").collect()
    assert all(r["entityName"] == "Opportunity" for r in rows)
    assert all(r["recordIds"] == ["r1", "r2"] for r in rows)
    assert all(r["commitTimestamp"] == 1_700_000_000_000 for r in rows)


def test_try_avro_session_falls_back_gracefully_offline(spark):
    """get_spark(try_avro=True) on an offline box must not raise — it
    retries without the package. (Session already exists here, so
    getOrCreate returns it; this pins the no-raise contract.)"""
    from flash_cdc_spark.session import get_spark

    s = get_spark(try_avro=True)
    assert s is not None
