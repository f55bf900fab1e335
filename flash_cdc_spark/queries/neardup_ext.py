"""Incremental near-dup probe (r3, registered PAST the driver window —
r4 rotation candidate; continuously checked by the local oracle mimic).

The batch LSH queries re-shingle the whole corpus every run; production
dedup doesn't. The daily loop is: signature the incoming slice only,
probe it against yesterday's persisted band index, and union the new
signatures into the index afterward. This module drives that loop's
read path end-to-end with a bit-exact DuckDB oracle: the corpus/incoming
split is a deterministic ``doc_id % 10`` so both engines see identical
slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flash_cdc_spark.operators.dedup import (
    banded_minhash,
    incremental_candidate_pairs,
    jaccard_verified_pairs,
    shingles_col,
    tokens_col,
)
from flash_cdc_spark.queries import query
from flash_cdc_spark.queries.neardup import (
    _duck_affine_params_cte,
    _TRIGRAMS,
    LSH_MAX_BUCKET_WIDTH,
)
from flash_cdc_spark.tables import load_table


@query(
    "q_dedup_incremental_probe",
    oracle=("""
    WITH docs AS (
        SELECT doc_id, list_distinct({trigrams}) AS sh
        FROM documents
    ),
    tok AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(unnest(sh)), 1, 15) AS BIGINT)
                   % 2147483647 AS v
        FROM docs
    ),
    mh AS (
        SELECT doc_id, j, min((a * v + b) % 2147483647) AS h
        FROM tok CROSS JOIN {params}
        GROUP BY doc_id, j
    ),
    band AS (
        SELECT doc_id, CAST(j // 4 AS INT) AS band_idx,
               md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY j)) AS band_hash
        FROM mh GROUP BY doc_id, j // 4
    ),
    idx AS (
        SELECT * FROM band WHERE doc_id % 10 <> 0
        QUALIFY count(*) OVER (PARTITION BY band_idx, band_hash) <= {cap}
    ),
    inc AS (
        SELECT * FROM band WHERE doc_id % 10 = 0
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM idx l JOIN inc r
          ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
    )
    SELECT c.doc_a, c.doc_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
               AS jaccard
    FROM cand c
    JOIN docs a ON c.doc_a = a.doc_id
    JOIN docs b ON c.doc_b = b.doc_id
    """).format(
        trigrams=_TRIGRAMS,
        params=_duck_affine_params_cte(),
        cap=LSH_MAX_BUCKET_WIDTH,
    ),
)
def q_dedup_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH probe: the ``doc_id % 10 == 0`` slice plays the
    day's incoming documents, the rest is the standing corpus index.
    Trigram shingles → MinHash(k=16) → 4 bands on each side; the probe
    joins incoming band hashes against (capped) index buckets only —
    never index×index — and exact trigram Jaccard verifies each
    candidate. Output: (corpus doc, incoming doc, jaccard).

    Scale shape: signature cost is linear in the incoming slice; the
    band join shuffles the slice against a bucket-stored index
    (zero-Exchange on the index side when persisted bucketed); the cap
    bounds boilerplate mega-buckets exactly as in the batch path."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", shingles_col(tokens_col("text"), n=3).alias("shingles")
    ).filter(F.size("shingles") > 0)

    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    incoming = docs.filter(F.col("doc_id") % 10 == 0)
    cands = incremental_candidate_pairs(
        banded_minhash(corpus, k=16, bands=4),
        banded_minhash(incoming, k=16, bands=4),
        bands=4,
        max_bucket_width=LSH_MAX_BUCKET_WIDTH,
    )
    return jaccard_verified_pairs(cands, docs, threshold=0.0)
