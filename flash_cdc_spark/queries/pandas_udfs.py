"""Pandas-UDF surface: the sanctioned Python escape hatch (Arrow-batched
vectorized UDFs, ~10-100× faster than row-at-a-time Python UDFs).

Two registered examples — a scalar UDF and a grouped-agg UDF — each with
a DuckDB oracle (the math is deterministic; numpy vs DuckDB float noise
is absorbed by rounding + the driver's float tolerance). The reference
has no UDF framework at all (SURVEY.md §2.9); this is the pattern users
get instead.

UDFs are built inside the query functions (not at import) because
``pandas_udf`` resolves its return type against the active session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


def _sigmoid_udf():
    def sigmoid_score(v: pd.Series) -> pd.Series:
        return 1.0 / (1.0 + np.exp(-(v - 100.0) / 50.0))

    return pandas_udf(sigmoid_score, returnType=DoubleType())


def _weighted_mean_udf():
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else float("nan")

    return pandas_udf(weighted_mean, returnType=DoubleType())


@query(
    "q_pandas_udf_scalar",
    oracle="""
    SELECT event_id,
           round(1.0 / (1.0 + exp(-(value - 100.0) / 50.0)), 6) AS score
    FROM events
    ORDER BY event_id
    LIMIT 400
    """,
)
def q_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF (logistic score of ``value``)."""
    e = load_table(spark, sf_dir, "events")
    score = _sigmoid_udf()
    return (
        e.select("event_id", F.round(score("value"), 6).alias("score"))
        .orderBy("event_id")
        .limit(400)
    )


@query(
    "q_pandas_udf_grouped_agg",
    oracle="""
    SELECT event_type,
           round(sum(value * CAST(json_extract_string(props, '$.k') AS DOUBLE))
                 / sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6)
               AS weighted_avg_value
    FROM events
    GROUP BY event_type
    """,
)
def q_pandas_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (weight = the JSON ``props.k``
    field): groupBy shuffle, then one Arrow batch per group."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("double")
    )
    wmean = _weighted_mean_udf()
    return e.groupBy("event_type").agg(
        F.round(wmean("value", "k"), 6).alias("weighted_avg_value")
    )
