"""Tests for the custom ``flashfeed`` Python data source (S1): batch
read, incremental streaming with offset tracking, flow-control cap, and
checkpoint resume. (Continuous micro-batch trigger: a simple stream
reader prefetches one batch per planning cycle, so availableNow would
stop after a single batch.)

Writer side: the staged two-phase-commit outbox — batch append /
overwrite / replay_seq assignment, abort cleanup, and the streaming
writer's committed-epoch sidecar (replayed micro-batch is dropped, not
double-published)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row

from flash_cdc_spark.sources.flashfeed import (
    FlashFeedDataSource,
    _FeedStreamWriter,
    _stage_rows,
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


def _envelope_df(spark, seqs, assign_seq=True):
    rows = [_ev(i) for i in seqs]
    if not assign_seq:
        for r in rows:
            r["replay_seq"] = None
    return spark.createDataFrame(
        rows,
        "event_id string, replay_seq bigint, topic_name string, "
        "schema_id string, payload string",
    )


def test_batch_write_roundtrip(spark, tmp_path):
    log = str(tmp_path / "outbox.jsonl")
    _envelope_df(spark, [1, 2, 3]).write.format("flashfeed").mode("append").option(
        "path", log
    ).save()
    back = spark.read.format("flashfeed").option("path", log).load()
    assert sorted(r["event_id"] for r in back.collect()) == ["e1", "e2", "e3"]
    # append mode accumulates
    _envelope_df(spark, [4]).write.format("flashfeed").mode("append").option(
        "path", log
    ).save()
    assert spark.read.format("flashfeed").option("path", log).load().count() == 4
    # staging dir is drained after commit
    assert os.listdir(log + ".staging") == []


def test_batch_write_overwrite_truncates(spark, tmp_path):
    log = str(tmp_path / "outbox2.jsonl")
    _envelope_df(spark, [1, 2, 3]).write.format("flashfeed").mode("append").option(
        "path", log
    ).save()
    _envelope_df(spark, [9]).write.format("flashfeed").mode("overwrite").option(
        "path", log
    ).save()
    rows = spark.read.format("flashfeed").option("path", log).load().collect()
    assert [r["event_id"] for r in rows] == ["e9"]


def test_write_assigns_replay_seq_when_missing(spark, tmp_path):
    """The feed (bus) is the replay-id authority: rows written without a
    replay_seq get the next line numbers, continuing past existing ones."""
    log = str(tmp_path / "outbox3.jsonl")
    append_events(log, [_ev(0), _ev(1)])  # lines 0..1 pre-exist
    _envelope_df(spark, [101, 102], assign_seq=False).coalesce(1).write.format(
        "flashfeed"
    ).mode("append").option("path", log).save()
    back = spark.read.format("flashfeed").option("path", log).load().collect()
    assigned = sorted(
        r["replay_seq"] for r in back if r["event_id"] in ("e101", "e102")
    )
    assert assigned == [2, 3]


def test_stream_writer_epoch_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batchId committed twice — restart
    between sink-commit and checkpoint-commit) must not double-publish."""
    log = str(tmp_path / "outbox4.jsonl")
    writer = _FeedStreamWriter({"path": log})

    def staged(seqs):
        return [_stage_rows(log, iter([Row(**_ev(i)) for i in seqs]))]

    writer.commit(staged([1, 2]), batchId=0)
    writer.commit(staged([1, 2]), batchId=0)  # replayed epoch: dropped
    writer.commit(staged([3]), batchId=1)
    back = spark.read.format("flashfeed").option("path", log).load().collect()
    assert sorted(r["event_id"] for r in back) == ["e1", "e2", "e3"]
    assert os.listdir(log + ".staging") == []  # replayed fragments cleaned too


def test_stream_write_end_to_end(spark, tmp_path):
    """flashfeed→flashfeed relay: readStream from log A, writeStream to
    log B via the staged streaming writer."""
    src = str(tmp_path / "feedA.jsonl")
    dst = str(tmp_path / "feedB.jsonl")
    ckpt = str(tmp_path / "ckpt_relay")
    append_events(src, [_ev(i) for i in range(1, 5)])
    q = (
        spark.readStream.format("flashfeed")
        .option("path", src)
        .option("flow_batch_size", "10")
        .load()
        .writeStream.format("flashfeed")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if (
                os.path.exists(dst)
                and spark.read.format("flashfeed").option("path", dst).load().count()
                >= 4
            ):
                break
            time.sleep(0.3)
    finally:
        q.stop()
    back = spark.read.format("flashfeed").option("path", dst).load().collect()
    assert sorted(r["event_id"] for r in back) == ["e1", "e2", "e3", "e4"]


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


def test_commit_raises_on_missing_fragment_and_preserves_log(spark, tmp_path):
    """A vanished staged fragment must fail the commit loudly — and in
    overwrite mode must NOT have truncated the existing log first."""
    from flash_cdc_spark.sources.flashfeed import _append_staged, _StagedCommit

    log = str(tmp_path / "feed5.jsonl")
    append_events(log, [_ev(1)])
    with pytest.raises(RuntimeError, match="missing"):
        _append_staged(
            log,
            [_StagedCommit(staged_path=str(tmp_path / "gone.jsonl"), rows=1)],
            truncate=True,
        )
    assert spark.read.format("flashfeed").option("path", log).load().count() == 1


def test_assigned_replay_seq_skips_explicit_producer_ids(spark, tmp_path):
    """Bus-assigned ids continue past the max EXPLICIT replay_seq in the
    log, not just the line count — mixed batches stay collision-free."""
    import json as _json

    from flash_cdc_spark.sources.flashfeed import _append_staged, _StagedCommit

    log = str(tmp_path / "feed6.jsonl")
    append_events(log, [_ev(0), _ev(40)])  # explicit ids 0 and 40, 2 lines
    frag = tmp_path / "frag.jsonl"
    ev = _ev(0)
    ev["event_id"], ev["replay_seq"] = "assigned", None
    frag.write_text(_json.dumps(ev) + "\n")
    _append_staged(log, [_StagedCommit(staged_path=str(frag), rows=1)])
    rows = spark.read.format("flashfeed").option("path", log).load().collect()
    got = {r["event_id"]: r["replay_seq"] for r in rows}
    assert got["assigned"] == 41, got


def test_assigned_seq_cannot_collide_with_explicit_seq_in_same_commit(
    spark, tmp_path
):
    """ADVICE r3: a staged batch mixing an assigned-id row with an
    explicit producer seq appearing LATER in the same commit must not
    emit duplicate replay ids — bus assignment pre-scans the staged
    fragments and starts past max(log, staged-explicit)."""
    import json as _json

    from flash_cdc_spark.sources.flashfeed import _append_staged, _StagedCommit

    log = str(tmp_path / "feed7.jsonl")  # empty log: worst case
    frag = tmp_path / "frag_mixed.jsonl"
    assigned = _ev(0)
    assigned["event_id"], assigned["replay_seq"] = "assigned", None
    explicit = _ev(0)
    explicit["event_id"] = "explicit"  # keeps replay_seq 0 explicitly
    frag.write_text(
        _json.dumps(assigned) + "\n" + _json.dumps(explicit) + "\n"
    )
    _append_staged(log, [_StagedCommit(staged_path=str(frag), rows=2)])
    rows = spark.read.format("flashfeed").option("path", log).load().collect()
    seqs = [r["replay_seq"] for r in rows]
    assert len(seqs) == len(set(seqs)), f"duplicate replay ids: {seqs}"
    got = {r["event_id"]: r["replay_seq"] for r in rows}
    assert got["explicit"] == 0
    assert got["assigned"] > 0
