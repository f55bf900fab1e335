"""Tests for the custom ``flashfeed`` Python data source (S1): batch
read, incremental streaming with offset tracking, flow-control cap, and
checkpoint resume. (Continuous micro-batch trigger: a simple stream
reader prefetches one batch per planning cycle, so availableNow would
stop after a single batch.)"""

from __future__ import annotations

import time

import pytest

from flash_cdc_spark.sources.flashfeed import (
    FlashFeedDataSource,
    append_events,
)


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(FlashFeedDataSource)


def _ev(seq, topic="/data/OppChangeEvent"):
    return {
        "event_id": f"e{seq}",
        "replay_seq": seq,
        "topic_name": topic,
        "schema_id": "s1",
        "payload": '{"ChangeEventHeader": {"recordIds": ["r%d"]}}' % seq,
    }


def _run_until(spark, log, ckpt, out, want_rows, flow=2, timeout_s=90):
    """Parquet sink (memory sink can't recover from a checkpoint)."""

    def read_out():
        try:
            return spark.read.parquet(out)
        except Exception:  # no files yet
            return spark.createDataFrame([], "replay_seq long")

    q = (
        spark.readStream.format("flashfeed")
        .option("path", log)
        .option("flow_batch_size", str(flow))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline and read_out().count() < want_rows:
            time.sleep(0.3)
    finally:
        q.stop()
    return read_out(), q


def test_batch_read(spark, tmp_path):
    log = str(tmp_path / "feed.jsonl")
    append_events(log, [_ev(1), _ev(2), _ev(3)])
    df = spark.read.format("flashfeed").option("path", log).load()
    rows = df.orderBy("replay_seq").collect()
    assert [r["event_id"] for r in rows] == ["e1", "e2", "e3"]
    assert rows[0]["topic_name"] == "/data/OppChangeEvent"


def test_stream_reads_appended_events_and_resumes(spark, tmp_path):
    log = str(tmp_path / "feed.jsonl")
    ckpt = str(tmp_path / "ckpt")
    append_events(log, [_ev(i) for i in range(1, 6)])
    out = str(tmp_path / "out")
    got, _ = _run_until(spark, log, ckpt, out, want_rows=5)
    assert sorted(r["replay_seq"] for r in got.collect()) == [1, 2, 3, 4, 5]

    # append more events; a restarted query resumes from the committed
    # offset (R1 stored) and reads only the new tail
    append_events(log, [_ev(6), _ev(7)])
    got2, _ = _run_until(spark, log, ckpt, out, want_rows=7)
    assert sorted(r["replay_seq"] for r in got2.collect()) == [1, 2, 3, 4, 5, 6, 7]


def test_flow_batch_size_caps_micro_batches(spark, tmp_path):
    log = str(tmp_path / "feed2.jsonl")
    ckpt = str(tmp_path / "ckpt2")
    append_events(log, [_ev(i) for i in range(1, 8)])
    got, q = _run_until(spark, log, ckpt, str(tmp_path / "out2"), want_rows=7, flow=3)
    assert got.count() == 7
    batches_with_rows = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches_with_rows) >= 3  # 7 events / cap 3
    for p in batches_with_rows:
        assert p["numInputRows"] <= 3
