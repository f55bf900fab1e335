"""Table-maintenance operators: small-file compaction + cluster-by
layout rewrite.

At 100 TB the physical layout IS the index: a streaming/CDC ingest path
(micro-batch appends, `q_streaming_rollup`-style partition overwrites)
leaves thousands of KB-sized parquet files per partition, and scan cost
becomes file-open cost — the classic small-file problem. Periodic
compaction rewrites each table to ~`target_file_mb` files; an optional
``cluster_by`` sorts rows so each output file covers a narrow,
non-overlapping key range, which turns parquet footer min/max stats
into an effective file-skipping index for point/range predicates.

Mechanism (one shuffle, fully distributed):

- ``repartitionByRange(n, partition_cols + cluster_by)`` both balances
  output file sizes (range partitioner samples the key distribution)
  and makes cluster-key ranges disjoint across files;
- ``sortWithinPartitions`` finishes the clustering inside each file so
  min/max stats are tight per row group too;
- the rewrite lands in a sibling temp directory and is swapped in with
  two directory renames. Readers never see a PARTIAL layout, but the
  swap is not atomic: between the renames the path is briefly absent
  (a concurrent reader would error and retry), and a failed second
  rename is rolled back so the table is never left missing. True
  either-or atomicity needs a table format's snapshot commit
  (Iceberg/Delta); plain parquet directories get the rename dance.

Operational contract (hard requirements, not suggestions):

- **ingest must be quiesced** while compaction runs. The swap verifies
  the file census is unchanged since planning and aborts (restoring
  the original directory, preserving any racing writer's files) if a
  concurrent append/delete is detected — but detection narrows the
  lost-update window, it cannot close it.
- **local filesystem only**: the swap uses ``os.walk``/``os.rename``
  directory semantics. Object stores have neither atomic rename nor
  directories — there, compaction belongs to a table format's rewrite
  action (Iceberg ``rewrite_data_files`` / Delta ``OPTIMIZE``), which
  this module's plan/rewrite split mirrors deliberately.

Driver-side metadata scan: sizing walks the directory tree on the
driver — that is a *metadata* operation (at scale it reads the table
manifest, not the data) and stays O(#files), never O(rows).

Reference parity: the reference has no storage layer at all (it streams
per-event rows into Postgres, ``app/services/processor.py``); this is
north-star scale tooling, not a ported operator.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int
    rows: int


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                out.append(os.path.join(root, f))
    return out


def plan_compaction(path: str, target_file_mb: float = 128) -> dict:
    """Metadata-only sizing pass: current file census and the target
    output file count ``ceil(total_bytes / target)`` (≥ 1). Fractional
    ``target_file_mb`` is allowed (test-scale fixtures are < 1 MB).
    ``file_set`` (paths relative to the table root) is the input
    snapshot the swap later verifies against — any divergence means a
    writer raced the compaction."""
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    target_bytes = max(1, int(target_file_mb * 1024 * 1024))
    return {
        "files": len(files),
        "bytes": total,
        "target_files": max(1, math.ceil(total / target_bytes)),
        "file_set": frozenset(os.path.relpath(f, path) for f in files),
    }


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    target_file_mb: float = 128,
    partition_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite a parquet table to ~``target_file_mb`` files, optionally
    hive-partitioned by ``partition_cols`` and clustered on
    ``cluster_by`` (disjoint per-file key ranges). Atomic swap."""
    plan = plan_compaction(path, target_file_mb)
    df = spark.read.parquet(path)

    range_cols = (partition_cols or []) + (cluster_by or [])
    if range_cols:
        shaped = df.repartitionByRange(plan["target_files"], *range_cols)
        if cluster_by:
            shaped = shaped.sortWithinPartitions(*range_cols)
    else:
        shaped = df.repartition(plan["target_files"])

    tmp = f"{path}.compact-{uuid.uuid4().hex}"
    writer = shaped.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    # row count from the COMPACTED layout (the cheap one to scan) —
    # never a second pass over the fragmented input
    rows = spark.read.parquet(tmp).count()

    old = f"{path}.pre-compact-{uuid.uuid4().hex}"
    os.rename(path, old)
    # Lost-update guard (ADVICE r3): a writer that appended to (or
    # deleted from) the table AFTER the input snapshot was planned
    # would have its change silently discarded by the swap — an append
    # would ride into `old` and be rmtree'd; a delete would be
    # resurrected by the rewrite. Verify the census is unchanged before
    # committing; on divergence, restore the ORIGINAL directory (the
    # racing writer's data is preserved) and fail loudly. The check
    # narrows the race to the plan→rename window but cannot close it:
    # compaction requires ingest into this path to be quiesced.
    current = frozenset(os.path.relpath(f, old) for f in _data_files(old))
    if current != plan["file_set"]:
        os.rename(old, path)
        shutil.rmtree(tmp, ignore_errors=True)
        appeared = sorted(current - plan["file_set"])[:5]
        vanished = sorted(plan["file_set"] - current)[:5]
        raise RuntimeError(
            f"concurrent modification of {path} during compaction "
            f"(files appeared: {appeared}, vanished: {vanished}); "
            "original layout restored — quiesce ingest before compacting"
        )
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # restore; the table is never left missing
        raise
    shutil.rmtree(old, ignore_errors=True)

    return CompactionStats(
        files_before=plan["files"],
        files_after=len(_data_files(path)),
        bytes_total=plan["bytes"],
        rows=rows,
    )


def file_key_ranges(path: str, column: str) -> list[tuple]:
    """Per-data-file (min, max) of ``column`` straight from the parquet
    footer statistics — the metadata a scan's file-skipping consults.
    Driver-side, O(#files)."""
    import pyarrow.parquet as pq

    spans = []
    for f in sorted(_data_files(path)):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    if not s.has_min_max:  # writer omitted stats (e.g. big binary)
                        continue
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            spans.append((lo, hi))
    return spans
