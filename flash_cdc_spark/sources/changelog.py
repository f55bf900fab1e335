"""Changelog source + replay/seek resolution (reference R1–R7,
``app/services/sf_pubsub.py:53-65``, ``847-894``).

The reference consumes a gRPC Pub/Sub stream whose cursor is an opaque
``replay_id``; restart behavior is governed by five modes. In Structured
Streaming the offset log inside ``checkpointLocation`` *is* the stored
cursor, so the modes map to checkpoint handling plus a start filter:

====================  =====================================================
mode                  mapping (cursor type changes, semantics preserved)
====================  =====================================================
``stored`` (R1)       reuse checkpoint dir if it has offsets, else earliest
``latest`` (R2)       fresh checkpoint + skip everything ≤ current max seq
``earliest`` (R3)     fresh checkpoint, read from the beginning
``custom`` (R4)       fresh checkpoint + skip everything ≤ given seq;
                      invalid cursor → fall back to ``latest``
                      (reference ``sf_pubsub.py:857-868``)
``since N min`` (R5)  earliest + drop events with commit_ms < cutoff while
                      still advancing offsets (reference ``870-874``)
====================  =====================================================

R6 (reload-on-reconnect) is automatic — the checkpoint is re-read on
restart. R7 (invalid-replay recovery) is handled by the supervisor: a
start failure with a corrupt cursor clears it and retries earliest
(see :mod:`flash_cdc_spark.streaming.pipelines`).

For the driver's file-based ``events`` table the monotone cursor is the
``event_id`` column (``replay_seq``); a Kafka/Delta deployment would use
``startingOffsets`` / ``startingVersion`` instead — same resolution
logic, different cursor encoding.
"""

from __future__ import annotations

import base64
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["ReplayArgs", "ReplayStart", "resolve_replay", "read_changelog_stream"]

VALID_MODES = ("stored", "latest", "earliest", "custom", "since")


@dataclass(frozen=True)
class ReplayArgs:
    """User-facing replay request (reference ``ReplayArgs`` dataclass,
    ``app/services/listener_manager.py:43-51``)."""

    mode: str = "stored"
    replay_seq_b64: str | None = None  # base64 cursor, `custom` mode
    since_minutes: int | None = None  # `since` mode


@dataclass(frozen=True)
class ReplayStart:
    """Resolved start plan (reference ``ReplayStart``,
    ``sf_pubsub.py:361-365``)."""

    fresh_checkpoint: bool
    start_after_seq: int | None  # exclusive lower bound on the cursor
    drop_before_ms: int | None  # event-time cutoff (`since`)


def encode_seq(seq: int) -> str:
    """Cursor → base64, mirroring the reference's replay-id encoding
    (``sf_pubsub.py:202-210``)."""
    return base64.b64encode(str(seq).encode("ascii")).decode("ascii")


def decode_seq(b64: str) -> int:
    raw = base64.b64decode(b64.encode("ascii"), validate=True)
    return int(raw.decode("ascii"))


def resolve_replay(
    args: ReplayArgs,
    checkpoint_dir: str,
    current_max_seq: int | None = None,
    now_ms: int | None = None,
) -> ReplayStart:
    """Map a replay request to checkpoint handling + start filter.

    Mirrors ``run_salesforce_pubsub``'s resolution (``sf_pubsub.py:
    847-894``): ``stored`` uses the persisted cursor when present and
    valid; a corrupted stored cursor falls back to earliest (R1);
    ``custom`` with an invalid cursor falls back to ``latest`` (R4).
    """
    mode = (args.mode or "stored").lower()
    if mode not in VALID_MODES:
        raise ValueError(f"invalid replay mode {args.mode!r}; expected one of {VALID_MODES}")

    if mode == "stored":
        has_offsets = os.path.isdir(os.path.join(checkpoint_dir, "offsets")) and bool(
            os.listdir(os.path.join(checkpoint_dir, "offsets"))
        )
        # Reuse the checkpoint when it holds progress; else start earliest.
        return ReplayStart(fresh_checkpoint=not has_offsets, start_after_seq=None,
                           drop_before_ms=None)
    if mode == "latest":
        return ReplayStart(True, start_after_seq=current_max_seq, drop_before_ms=None)
    if mode == "earliest":
        return ReplayStart(True, None, None)
    if mode == "custom":
        try:
            seq = decode_seq(args.replay_seq_b64 or "")
        except Exception:
            # invalid replay id → LATEST (sf_pubsub.py:857-868)
            return ReplayStart(True, start_after_seq=current_max_seq, drop_before_ms=None)
        return ReplayStart(True, start_after_seq=seq, drop_before_ms=None)
    # since: earliest + local event-time drop (offsets still advance)
    if args.since_minutes is None or now_ms is None:
        raise ValueError("since mode requires since_minutes and now_ms")
    return ReplayStart(True, None, drop_before_ms=now_ms - args.since_minutes * 60_000)


def apply_replay_start(replay: ReplayStart, checkpoint_dir: str) -> None:
    """Materialize the checkpoint decision (fresh → clear the dir)."""
    if replay.fresh_checkpoint and os.path.isdir(checkpoint_dir):
        shutil.rmtree(checkpoint_dir)


def read_changelog_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    replay: ReplayStart | None = None,
    seq_col: str = "replay_seq",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open the file-based changelog as a streaming DataFrame.

    ``max_files_per_trigger`` is the flow-control analog of the
    reference's credit-based ``flow_batch_size`` (S2,
    ``sf_pubsub.py:559-569``) — it bounds per-micro-batch admission.
    The ``start_after_seq`` filter implements ``latest``/``custom``
    seek on the monotone cursor column.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    df = reader.parquet(path)
    if replay and replay.start_after_seq is not None:
        df = df.filter(F.col(seq_col) > F.lit(replay.start_after_seq))
    return df
