"""``flashfeed`` — a custom PySpark (Spark 4 ``pyspark.sql.datasource``)
data source that plays the role of the reference's gRPC Pub/Sub
subscription (S1, ``app/services/sf_pubsub.py:552-608``).

The feed is an append-only JSON-lines log of transport envelopes
(FIXTURES.md §1): each line
``{"event_id", "replay_seq", "topic_name", "schema_id", "payload"}``.
The streaming reader's offset is ``{"seq": <last line consumed>}`` —
a transparent, monotone replay cursor with exactly the reference's
replay-id semantics:

- resume from a checkpoint = R1 ``stored`` (Spark replays from the
  committed offset, re-reading lines via ``readBetweenOffsets``);
- ``flow_batch_size`` option = S2 credit-based admission (max events
  per micro-batch, reference default 100, bounds 1–5000);
- a request beyond EOF just returns the same offset (keepalive /
  empty-batch behavior, S3 analog).

Register + use::

    spark.dataSource.register(FlashFeedDataSource)
    spark.readStream.format("flashfeed").option("path", log).load()

Scale note: a Python data source runs its reader in Python workers —
right for a control-plane-bounded CDC feed (the reference's own ceiling
is O(100) events/s per client); the parquet/Kafka sources remain the
bulk path."""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

__all__ = ["FlashFeedDataSource", "FLASHFEED_SCHEMA_DDL", "append_events"]

FLASHFEED_SCHEMA_DDL = (
    "event_id string, replay_seq bigint, topic_name string, "
    "schema_id string, payload string"
)

_FIELDS = ("event_id", "replay_seq", "topic_name", "schema_id", "payload")


def append_events(path: str, events: list[dict]) -> None:
    """Producer helper: append envelope lines to the feed log."""
    with open(path, "a", encoding="utf-8") as fh:
        for ev in events:
            fh.write(json.dumps(ev) + "\n")


def _read_lines(path: str, start: int, end: int | None) -> list[tuple]:
    out = []
    if not os.path.exists(path):
        return out
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            if i < start:
                continue
            if end is not None and i >= end:
                break
            line = line.strip()
            if not line:
                continue
            ev = json.loads(line)
            out.append(tuple(ev.get(k) for k in _FIELDS))
    return out


class _FeedBatchReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition):
        yield from _read_lines(self._path, 0, None)


class _FeedStreamReader(SimpleDataSourceStreamReader):
    """Offset protocol: ``{"seq": n}`` = n lines consumed. ``read``
    advances by at most ``flow_batch_size`` lines; ``readBetweenOffsets``
    re-reads a committed range on replay (at-least-once redelivery)."""

    def __init__(self, options):
        self._path = options.get("path")
        size = int(options.get("flow_batch_size", "100"))
        self._batch = max(1, min(size, 5000))  # reference bounds models.py:66

    def initialOffset(self):
        return {"seq": 0}

    def read(self, start: dict):
        begin = int(start.get("seq", 0))
        rows = _read_lines(self._path, begin, begin + self._batch)
        return iter(rows), {"seq": begin + len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(_read_lines(self._path, int(start["seq"]), int(end["seq"])))


class FlashFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "flashfeed"

    def schema(self) -> str:
        return FLASHFEED_SCHEMA_DDL

    def reader(self, schema: StructType):
        return _FeedBatchReader(self.options)

    def simpleStreamReader(self, schema):  # noqa: N802 (Spark API name)
        return _FeedStreamReader(self.options)
