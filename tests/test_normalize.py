"""Unit tests for the normalization expressions — cases transcribed from
the reference's branches (sf_pubsub.py:215-227, 690-716; models.py:26-31)
per FIXTURES.md §2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flash_cdc_spark.functions import mask_secret, normalize_commit_ms, truthy_flag


def _eval_ts(spark, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(normalize_commit_ms("v").alias("out")).first()["out"]


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("1700000000000000000", 1700000000000000000 // 1_000_000),  # ns → ms
        ("1700000000000", 1700000000000),  # ms stays
        ("1700000000", 1700000000 * 1000),  # s → ms
        ("42", 42),  # tiny test value kept
        ("0", 0),
        ("not-a-number", None),  # int() failure → null
        (None, None),
        # boundaries: strict > comparisons, exactly-at falls to next branch
        (str(10**14), 10**14),  # not >1e14 → ms branch (>1e11) → unchanged
        (str(10**11), 10**14),  # not >1e11 → s branch (>1e9) → ×1000
        (str(10**9), 10**9),  # not >1e9 → returned raw
    ],
)
def test_normalize_commit_ms(spark, raw, expected):
    assert _eval_ts(spark, raw) == expected


def _eval_flag(spark, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(truthy_flag("v").alias("out")).first()["out"]


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("true", True),
        ("True", True),
        ("TRUE ", True),  # trimmed + case-insensitive
        ("1", True),
        ("yes", True),
        ("y", True),
        ("false", False),
        ("0", False),
        ("no", False),
        ("n", False),
        ("", False),
        ("   ", False),  # trims to ""
        ("maybe", None),  # garbage → warn, not-True → dropped
        (None, None),
        ("2.5", True),  # numeric bool() coercion
        ("-1", True),
        ("0.0", False),
    ],
)
def test_truthy_flag(spark, raw, expected):
    assert _eval_flag(spark, raw) is expected


def test_truthy_flag_on_boolean_and_numeric_columns(spark):
    df = spark.createDataFrame([(True, 1), (False, 0), (None, 7)], "b boolean, n int")
    rows = df.select(
        truthy_flag(F.col("b")).alias("fb"), truthy_flag(F.col("n")).alias("fn")
    ).collect()
    assert [r["fb"] for r in rows] == [True, False, None]
    assert [r["fn"] for r in rows] == [True, False, True]


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("supersecret", "*******cret"),
        ("abcd", "****"),  # len <= keep → fully masked
        ("ab", "**"),
        ("", ""),  # falsy passes through
        (None, None),
        ("12345", "*2345"),
    ],
)
def test_mask_secret(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "v string")
    assert df.select(mask_secret("v").alias("out")).first()["out"] == expected
