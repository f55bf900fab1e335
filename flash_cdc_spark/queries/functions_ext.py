"""Map-type higher-order function coverage.

DuckDB's MAP dialect differs enough from Spark's (construction syntax,
NULL handling, entry ordering) that the oracle does NOT mirror the map
operations — it computes the same *result* relationally. The Spark side
builds real maps and drives the full map HOF surface:
``map_from_entries``, ``map_filter``, ``transform_values``,
``map_concat``, ``map_values``, ``element_at``, ``explode`` of a map,
``map_keys``/``size``. The output is exploded back to scalar rows, so
the value-hash compare is dialect-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


@query(
    "q_map_function_suite",
    oracle="""
    WITH per AS (
        SELECT l_returnflag, l_linestatus,
               2.0 * CAST(sum(l_quantity) AS DOUBLE) AS val
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    ),
    tot AS (
        SELECT l_returnflag, 'TOTAL' AS l_linestatus, sum(val) AS val
        FROM per GROUP BY l_returnflag
    ),
    un AS (
        SELECT * FROM per UNION ALL SELECT * FROM tot
    ),
    ov AS (
        SELECT l_returnflag, val AS o_val FROM per WHERE l_linestatus = 'O'
    ),
    nk AS (
        SELECT l_returnflag, count(*) AS n_keys FROM un GROUP BY l_returnflag
    )
    SELECT un.l_returnflag,
           un.l_linestatus AS status_key,
           round(un.val, 2) AS status_val,
           round(ov.o_val, 2) AS o_val,
           CAST(nk.n_keys AS INT) AS n_keys
    FROM un
    LEFT JOIN ov USING (l_returnflag)
    JOIN nk USING (l_returnflag)
    """,
)
def q_map_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a per-returnflag map ``linestatus → 2×sum(qty)`` with
    ``map_from_entries``/``transform_values``, append a TOTAL entry via
    ``map_concat`` + ``aggregate(map_values(...))``, probe it with
    ``element_at``, then explode back to rows. Map cardinality per group
    is tiny (bounded by the key domain), so the maps live inside a
    normal aggregate row — the 100 TB shape for "pivoted small-domain
    state" without a wide schema."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("double").alias("q")
    )
    m = per.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("l_linestatus"), F.col("q")))
        ).alias("m0")
    )
    doubled = m.select(
        "l_returnflag",
        F.transform_values(
            F.map_filter("m0", lambda k, v: v.isNotNull()), lambda k, v: v * 2.0
        ).alias("m1"),
    )
    with_total = doubled.select(
        "l_returnflag",
        F.map_concat(
            "m1",
            F.create_map(
                F.lit("TOTAL"),
                F.aggregate(F.map_values("m1"), F.lit(0.0), lambda a, x: a + x),
            ),
        ).alias("m2"),
    )
    return with_total.select(
        "l_returnflag",
        F.explode("m2").alias("status_key", "raw_val"),
        F.round(F.element_at("m2", F.lit("O")), 2).alias("o_val"),
        F.size(F.map_keys("m2")).alias("n_keys"),
    ).select(
        "l_returnflag",
        "status_key",
        F.round("raw_val", 2).alias("status_val"),
        "o_val",
        "n_keys",
    )
