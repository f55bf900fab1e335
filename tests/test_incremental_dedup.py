"""Incremental LSH probe (``incremental_candidate_pairs``): the
nightly-ingest read path must agree with the full batch pairwise path
on the pairs both can see, and never emit an index×index pair."""

from __future__ import annotations

from pyspark.sql import functions as F

from flash_cdc_spark.operators.dedup import (
    banded_minhash,
    incremental_candidate_pairs,
    minhash_candidate_pairs,
    shingles_col,
    tokens_col,
)
from flash_cdc_spark.tables import load_table


def _banded(docs):
    return banded_minhash(docs, k=16, bands=4)


def test_incremental_probe_equals_cross_slice_batch_pairs(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", shingles_col(tokens_col("text"), n=3).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)

    inc_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in incremental_candidate_pairs(
            _banded(corpus), _banded(incoming), bands=4
        ).collect()
    }
    # every pair is cross-slice, oriented (corpus, incoming)
    assert all(a % 10 != 0 and b % 10 == 0 for a, b in inc_pairs)

    # the full batch self-join over ALL docs, restricted to cross-slice
    batch_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(_banded(docs), bands=4).collect()
    }
    batch_cross = {
        (a, b) if b % 10 == 0 else (b, a)
        for a, b in batch_pairs
        if (a % 10 == 0) != (b % 10 == 0)
    }
    assert inc_pairs == batch_cross
    assert len(inc_pairs) > 0  # non-vacuous at fixture scale


def test_reingested_doc_never_pairs_with_itself(spark):
    """A doc present in BOTH the index and the incoming slice (an
    update keeping its id) must not emit the degenerate (x, x) pair."""
    docs = spark.createDataFrame(
        [
            (7, "alpha beta gamma delta epsilon zeta"),
            (8, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    ).select("doc_id", shingles_col(tokens_col("text"), n=3).alias("shingles"))
    pairs = incremental_candidate_pairs(_banded(docs), _banded(docs), bands=4).collect()
    assert all(r["doc_a"] != r["doc_b"] for r in pairs)
