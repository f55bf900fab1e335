"""Test-table catalog: load the driver-generated parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings, one parquet per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "default_sf_dir",
    "read_layout",
]


def read_layout(spark: SparkSession, path: str) -> "DataFrame":
    """Per-session analyzed-plan memo for PROCESS-IMMUTABLE parquet
    layouts (the mkdtemp index memos: IVF cell layout, PQ code tables,
    signature indexes). ``spark.read.parquet`` re-lists the directory
    and re-reads footer schemas on every call (~0.1 s of driver time);
    these layouts are written exactly once per process and never
    change, so caching the analyzed DataFrame is always safe — a plan,
    never data: every execution still scans the parquet files. Same
    device as ``load_table``'s memo, minus the staleness key (the path
    is unique per write by construction)."""
    memo = getattr(spark, "_flash_layout_memo", None)
    if memo is None:
        memo = {}
        try:
            spark._flash_layout_memo = memo
        except AttributeError:
            return spark.read.parquet(path)
    if path not in memo:
        memo[path] = spark.read.parquet(path)
    return memo[path]

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _stat_key(path: str) -> tuple:
    """Identity of the bytes behind ``path``: mtime+size of the path,
    plus — for a parquet DIRECTORY — the max child (mtime_ns, size)
    (ADVICE r10: rewriting a part file in place with the same filename
    set changes neither the directory's mtime nor its size, so the
    path-only key could serve a stale plan/schema for dir fixtures)."""
    st = os.stat(path)
    child_key: tuple = ()
    if os.path.isdir(path):
        children = [
            os.path.join(path, n) for n in os.listdir(path)
        ]
        stats = []
        for c in children:
            try:
                cst = os.stat(c)
            except OSError:
                continue
            stats.append((cst.st_mtime_ns, cst.st_size))
        child_key = (len(stats), max(stats) if stats else None)
    return (path, st.st_mtime_ns, st.st_size, child_key)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Harden against foreign sessions (the driver's verify runs these
    # queries in ITS session): timestamp semantics must match the naive-
    # UTC DuckDB oracle regardless of the host session's timezone.
    # (unconditional set: conf.get validates even the *default* value in
    # sessions where the key is unset, so a get-then-set would throw)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Per-session PLAN memo: spark.read.parquet re-lists and re-reads
    # the footer schema on every call (~0.1 s) — across ~111 bench
    # queries × 2 tables that is tens of seconds of pure driver time.
    # The memo caches the analyzed DataFrame (a plan, never data: every
    # execution still scans the parquet), lives on the session object
    # (dies with it), and keys on the file's mtime+size so an
    # in-place rewrite invalidates it.
    memo = getattr(spark, "_flash_table_memo", None)
    if memo is None:
        memo = {}
        try:
            spark._flash_table_memo = memo
        except AttributeError:
            memo = None
    path = os.path.join(sf_dir, f"{name}.parquet")
    if memo is not None:
        try:
            key = (name, _stat_key(path))
        except OSError:
            key = None
        if key is not None and key in memo:
            return memo[key]
    df = _read_table(spark, sf_dir, name)
    if memo is not None and key is not None:
        memo[key] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet's ts physical type varies by driver round:
        # TIMESTAMP(NANOS) (rejected by Spark's reader unless read as raw
        # int64 nanos and floored to micros — exact integer division,
        # DuckDB floors ns→µs the same way) or TIMESTAMP(MICROS,
        # isAdjustedToUTC=false) (reads as TIMESTAMP_NTZ). Normalize both
        # to session-local TIMESTAMP; with the UTC session tz pinned above
        # this matches the naive-UTC DuckDB oracle exactly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (for the spark.sql surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
