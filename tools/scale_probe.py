"""Dedup scale probe: measure candidate-PAIR growth vs corpus size.

The quadratic hazard in LSH-style dedup is the banded self-join: if a
band bucket holds w docs it emits w·(w-1)/2 pairs, so boilerplate-heavy
corpora can go O(n²) while the happy path stays ~O(n). The engine's
guards are (a) 16-bit SimHash bands (expected width ≈ n/2¹⁶) and (b)
the hard ``max_bucket_width`` cap. This probe demonstrates the claim
with measured numbers instead of an argument: synthesize corpora of
2×/4×/8× the sf0.1 documents table by replication — each replica keeps
HALF its texts byte-identical (exact dups, the worst case the cap must
absorb) and perturbs the other half with a replica token (near-dup
tail) — then record candidate-pair counts and wall time for the capped
MinHash-LSH and SimHash64 paths at each size.

Pass/fail reading: pairs/doc should stay roughly FLAT (linear total
growth) as n grows. Results are committed to SCALE.md.

Usage: python tools/scale_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flash_cdc_spark.operators.dedup import (  # noqa: E402
    SIMHASH_MAX_BUCKET_WIDTH,
    banded_minhash,
    minhash_candidate_pairs,
    shingles_col,
    simhash64_candidate_pairs,
    simhash64_signatures,
    tokens_col,
)
from flash_cdc_spark.queries.neardup import LSH_MAX_BUCKET_WIDTH  # noqa: E402
from flash_cdc_spark.session import get_spark  # noqa: E402


def synth_corpus(spark: SparkSession, sf_dir: str, reps: int) -> DataFrame:
    """Replicate the documents table ``reps`` times: replica 0 is the
    original; each later replica keeps even-doc_id texts byte-identical
    (exact duplicates — maximal bucket collisions) and salts odd ones
    with a replica token (near-dup tail)."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    return base.crossJoin(rep).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        F.when(
            (F.col("rep") == 0) | (F.col("doc_id") % 2 == 0), F.col("text")
        )
        .otherwise(F.concat(F.lit("rep"), F.col("rep"), F.lit(" "), F.col("text")))
        .alias("text"),
    )


def measure(docs: DataFrame) -> dict:
    docs = docs.localCheckpoint(eager=True)  # pin the corpus; time ops only
    n = docs.count()
    out = {"n_docs": n}

    t0 = time.perf_counter()
    sh = docs.select(
        "doc_id", shingles_col(tokens_col("text"), n=3).alias("shingles")
    ).filter(F.size("shingles") > 0)
    banded = banded_minhash(sh, k=16, bands=4)
    mh_pairs = minhash_candidate_pairs(
        banded, bands=4, max_bucket_width=LSH_MAX_BUCKET_WIDTH
    ).count()
    out["minhash_pairs"] = mh_pairs
    out["minhash_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sigs = simhash64_signatures(docs)
    sh_pairs = simhash64_candidate_pairs(
        sigs, max_hamming=3, max_bucket_width=SIMHASH_MAX_BUCKET_WIDTH
    ).count()
    out["simhash64_pairs"] = sh_pairs
    out["simhash64_sec"] = round(time.perf_counter() - t0, 2)

    # exact set-similarity join (prefix filtering, t=0.8): the
    # non-probabilistic path — no bucket cap exists here, so its
    # growth curve is the one to watch on a dup-heavy corpus
    from pyspark.sql import Window
    from flash_cdc_spark.operators.dedup import jaccard_verified_pairs

    t0 = time.perf_counter()
    T = 0.8
    tok = sh.select(
        "doc_id", F.size("shingles").alias("sz"), F.explode("shingles").alias("s")
    )
    dfreq = tok.groupBy("s").agg(F.count("*").alias("df"))
    pref = (
        tok.join(F.broadcast(dfreq), "s")
        .withColumn(
            "r",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s")),
        )
        .filter(F.col("r") <= F.col("sz") - F.ceil(F.lit(T) * F.col("sz")) + 1)
        .select("doc_id", "s")
    )
    cand = (
        pref.alias("l")
        .join(
            pref.alias("r"),
            (F.col("l.s") == F.col("r.s")) & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    out["prefix_pairs"] = jaccard_verified_pairs(cand, sh, threshold=T).count()
    out["prefix_sec"] = round(time.perf_counter() - t0, 2)
    return out


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    spark = get_spark(app_name="dedup-scale-probe")
    for reps in (1, 2, 4, 8):
        r = measure(synth_corpus(spark, sf_dir, reps))
        r["reps"] = reps
        r["minhash_pairs_per_doc"] = round(r["minhash_pairs"] / r["n_docs"], 3)
        r["simhash64_pairs_per_doc"] = round(r["simhash64_pairs"] / r["n_docs"], 3)
        r["prefix_pairs_per_doc"] = round(r["prefix_pairs"] / r["n_docs"], 3)
        print(json.dumps(r))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
