"""Partitioned table layout + partition pruning: at 100 TB the
directory layout IS the index. Writing facts partitioned by a coarse
time key lets year-scoped queries skip whole partitions — visible as
``PartitionFilters`` in the scan and fewer files read."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from flash_cdc_spark.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_year")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("order_year").mode("overwrite").parquet(out)

    # year dirs exist (1995..2001 in the data)
    years = sorted(
        d for d in os.listdir(out) if d.startswith("order_year=")
    )
    assert len(years) >= 5

    pruned = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters", 1)[1].splitlines()[0]

    # correctness: pruned read == filtered unpartitioned read
    expected = orders.filter(F.col("order_year") == 1997).count()
    assert pruned.count() == expected
    assert expected > 0
