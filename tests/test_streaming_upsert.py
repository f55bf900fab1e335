"""Replay idempotence of the streaming merge sinks
(``streaming/upsert.py``): reprocessing the entire stream from a fresh
checkpoint (the worst-case replay) must leave the state tables exactly
as they were — the property that makes the at-least-once stream
exactly-once in the table."""

from __future__ import annotations

from pyspark.sql import functions as F

from flash_cdc_spark.streaming import await_or_fail
from flash_cdc_spark.streaming.upsert import (
    streaming_latest_state,
    streaming_scd2_history,
)
from flash_cdc_spark.tables import load_table


def _snapshot(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def _run(spark, src, state, ckpt, fn):
    stream = (
        spark.readStream.schema(
            "user_id bigint, event_type string, event_id bigint, "
            "ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    await_or_fail(fn(stream, state, ckpt))


def test_full_replay_leaves_state_unchanged(spark, sf_dir, tmp_path):
    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    src = str(tmp_path / "src")
    for third in range(3):
        batch.filter(F.pmod(F.col("event_id"), F.lit(3)) == third).coalesce(
            1
        ).write.mode("append").parquet(src)

    for name, fn in (
        ("latest", streaming_latest_state),
        ("scd2", streaming_scd2_history),
    ):
        state = str(tmp_path / f"state_{name}")
        _run(spark, src, state, str(tmp_path / f"ckpt_{name}_1"), fn)
        first = _snapshot(spark, state)
        # fresh checkpoint = Spark replays EVERY micro-batch against the
        # already-populated state table
        _run(spark, src, state, str(tmp_path / f"ckpt_{name}_2"), fn)
        assert _snapshot(spark, state) == first, f"{name} not replay-idempotent"
        assert len(first) > 0
