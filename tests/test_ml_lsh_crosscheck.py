"""Cross-check our hand-rolled LSH operators against pyspark.ml's
implementations — two independent codebases computing the same
mathematical objects should agree.

- MinHash: ml's ``MinHashLSH.approxSimilarityJoin`` post-filters its
  band candidates with EXACT Jaccard distance, so its output is a
  subset of the exact threshold pairs; with many hash tables and a
  fixed seed it deterministically recovers (almost) all of them. We
  assert no-false-positives exactly and recall against our exact
  pairwise Jaccard.
- BucketedRandomProjectionLSH: Euclidean ANN on the embeddings table;
  its approx join's post-filter again guarantees subset-of-exact,
  cross-checked against a brute-force distance computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flash_cdc_spark.operators.dedup import shingles_col, tokens_col
from flash_cdc_spark.tables import load_table

try:  # pyspark.ml needs numpy at import time; gate for safety
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    HAVE_ML = True
except Exception:  # pragma: no cover
    HAVE_ML = False

pytestmark = pytest.mark.skipif(not HAVE_ML, reason="pyspark.ml unavailable")

JACCARD_T = 0.5


def _exact_jaccard_pairs(docs):
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (
        F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    ).cast("double")
    return {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("j", inter / union)
        .filter(F.col("j") >= JACCARD_T)
        .collect()
    }


def test_minhash_lsh_matches_ml_approx_join(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", shingles_col(tokens_col("text"), n=1).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    exact = _exact_jaccard_pairs(docs)

    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
    model_cv = cv.fit(docs)
    feats = model_cv.transform(docs)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=32, seed=42)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 1.0 - JACCARD_T, distCol="dist")
    ml_pairs = {
        (r["a"], r["b"])
        for r in joined.select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .collect()
    }
    # exact post-filter ⇒ no false positives, ever
    assert ml_pairs <= exact
    # 32 hash tables at τ=0.5 ⇒ near-total recall on this corpus
    if exact:
        assert len(ml_pairs) >= 0.9 * len(exact)


def test_brp_lsh_ann_subset_of_exact_neighbors(spark, sf_dir):
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select(
            "vec_id",
            array_to_vector(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("features"),
        )
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", numHashTables=8,
        bucketLength=2.0, seed=7,
    )
    model = brp.fit(emb)
    thresh = 6.0
    joined = model.approxSimilarityJoin(emb, emb, thresh, distCol="dist")
    ml_pairs = {
        (r["a"], r["b"])
        for r in joined.select(
            F.col("datasetA.vec_id").alias("a"), F.col("datasetB.vec_id").alias("b")
        )
        .filter(F.col("a") < F.col("b"))
        .collect()
    }
    # exact euclidean pairs under the threshold (brute force)
    v = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    a, b = v.alias("a"), v.alias("b")
    dist2 = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    exact = {
        (r["va"], r["vb"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.sqrt(dist2).alias("d"),
        )
        .filter(F.col("d") <= thresh)
        .collect()
    }
    assert ml_pairs <= exact
