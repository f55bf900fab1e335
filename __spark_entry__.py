"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship changefeed-pipeline query on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full registered
inventory (see ``flash_cdc_spark/queries/``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flash_cdc_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q_changefeed_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (keys without an entry are
    non-SQL-expressible ops → driver runs a rows-only check)."""
    return dict(ORACLE)
