"""Corpus-curation additions (r4, second wave; registered past the
driver window — r5 rotation candidates, continuously checked by the
local oracle mimic + fingerprint snapshot):

- exact set-similarity join by PREFIX FILTERING (All-Pairs / PPJoin
  family: Bayardo et al. WWW'07, Chaudhuri et al. ICDE'06) — the
  deterministic complement of the probabilistic MinHash-LSH path;
- SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
  within-k-means-cell cosine similarity, reusing the trained IVF
  quantizer as the clustering stage;
- exact heavy hitters with Misra-Gries candidate pruning
  (`operators/frequency.py`);
- deterministic per-source stratified sampling (hash-ordered row
  ranks — replay-stable, no rand()).

The reference engine (bettyarega/Flash-CDC) has no analytics of this
kind; these rows extend the SURVEY §2.9 north-star gap list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators import ivf as IVF
from flash_cdc_spark.operators import similarity as SIM
from flash_cdc_spark.operators.dedup import (
    jaccard_verified_pairs,
    shingles_col,
    tokens_col,
)
from flash_cdc_spark.operators.frequency import exact_heavy_hitters
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

# Word-bigram shingle expression (DuckDB side) — the unigram corpus
# vocabulary is tiny so unigram SETS overlap heavily; bigrams isolate
# the planted near-duplicates (25 pairs >= 0.5 at sf0.01).
_BIGRAMS = (
    "list_transform(range(CASE WHEN len(string_split(text,' ')) >= 2 "
    "THEN len(string_split(text,' ')) - 1 ELSE 0 END), "
    "i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])"
)

_JACCARD_T = 0.5


@query(
    "q_dedup_prefix_jaccard_join",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, list_distinct({_BIGRAMS}) AS sh
        FROM documents
        WHERE len(list_distinct({_BIGRAMS})) > 0
    ),
    tok AS (
        SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM docs
    ),
    wdf AS (
        SELECT *, count(*) OVER (PARTITION BY s) AS df FROM tok
    ),
    pref AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY df, s) AS r
            FROM wdf
        ) WHERE r <= sz - ceil({_JACCARD_T} * sz) + 1
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
        FROM pref l JOIN pref r
          ON l.s = r.s AND l.doc_id < r.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM (
        SELECT c.doc_a, c.doc_b,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                     (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
                     6) AS jaccard
        FROM cand c
        JOIN docs a ON c.doc_a = a.doc_id
        JOIN docs b ON c.doc_b = b.doc_id
    ) WHERE jaccard >= {_JACCARD_T}
    """,
)
def q_dedup_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram-Jaccard set-similarity self-join via prefix
    filtering — no hashing, no false negatives (vs the MinHash path's
    probabilistic recall). Classic All-Pairs/PPJoin prefix principle:
    order every document's shingles by ascending global document
    frequency (rarest first; ties by shingle text — a total order both
    engines share); two sets with Jaccard >= t MUST collide inside
    their first ``|s| - ceil(t*|s|) + 1`` shingles, so the inverted
    index is built over prefixes only and candidates are verified with
    exact Jaccard.

    Scale shape: document-frequency is one shuffle on the shingle key
    (partial-aggregable count); prefix ranking is a per-doc window;
    the candidate join touches prefix postings only — for t=0.5 that
    is ~half of each posting list, and rare-first ordering makes
    prefix postings the SHORT lists. No quadratic blowup unless the
    data is genuinely all-near-duplicate. Word-bigram shingles (the
    unigram vocabulary here is so small every pair overlaps).
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", shingles_col(tokens_col("text"), n=2).alias("shingles")
    ).filter(F.size("shingles") > 0)

    tok = docs.select(
        "doc_id",
        F.size("shingles").alias("sz"),
        F.explode("shingles").alias("s"),
    )
    wdf = tok.withColumn("df", F.count("*").over(Window.partitionBy("s")))
    pref = (
        wdf.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "s")
            ),
        )
        .filter(
            F.col("r")
            <= F.col("sz") - F.ceil(F.lit(_JACCARD_T) * F.col("sz")) + 1
        )
        .select("doc_id", "s")
    )
    cand = (
        pref.alias("l")
        .join(
            pref.alias("r"),
            (F.col("l.s") == F.col("r.s"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return jaccard_verified_pairs(cand, docs, threshold=_JACCARD_T)


_SEMDEDUP_T = 0.3  # corpus embeddings are isotropic noise; 0.3 sits
# inside the observed tail (max pairwise cosine ~0.51) so the flag is
# exercised on real hits, not vacuously false


@query(
    "q_dedup_semdedup",
    oracle="""
    WITH vecs AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
        FROM embeddings
    ),
    """
    + IVF.kmeans_cte()
    + f""",
    assigned AS (SELECT vec_id, cell FROM best WHERE ark = 1),
    av AS (
        SELECT v.vec_id, v.v, v.nrm, a.cell
        FROM vecs v JOIN assigned a ON v.vec_id = a.vec_id
    ),
    mx AS (
        SELECT a.vec_id, a.cell,
               max(round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6))
                   AS max_cos_prior
        FROM av a JOIN av b
          ON a.cell = b.cell AND b.vec_id < a.vec_id
        GROUP BY a.vec_id, a.cell
    )
    SELECT vec_id, CAST(cell AS INT) AS cell, max_cos_prior,
           CAST(max_cos_prior >= {_SEMDEDUP_T} AS INT) AS is_dup
    FROM mx
    """,
)
def q_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning by
    clustering embeddings with k-means and comparing cosine similarity
    ONLY within a cluster — the trained IVF coarse quantizer
    (`operators/ivf.py`, memoized per corpus) IS the clustering stage,
    so the index build is shared with the ANN queries. Each vector
    reports the max cosine to any EARLIER (smaller vec_id) vector in
    its cell — the keep-first dedup rule — and is flagged a duplicate
    above the threshold.

    Scale shape: one shuffle on the cell id; the pairwise stage is
    quadratic only within a cell, and cell size is controlled by k
    (SemDeDup runs k ~ sqrt(n); the paper's 50k clusters over 5B
    embeddings keeps cells ~100k — cap k up, never the pair loop).
    Per-pair cosine rounds at 6 dp BEFORE the max so cross-engine
    float-reduction drift cannot flip the reported neighbor."""
    e = load_table(spark, sf_dir, "embeddings")
    v = SIM.as_double_vec("embedding")
    vecs = e.select("vec_id", v.alias("v"), SIM.l2_norm(v).alias("nrm"))
    centers = IVF.train_kmeans(vecs, cache_key=sf_dir)
    corpus = IVF.assigned_corpus(vecs, centers, cache_key=sf_dir)

    a = corpus.select(
        F.col("vec_id"), F.col("v"), F.col("nrm"), F.col("cell")
    )
    b = corpus.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("b_v"),
        F.col("nrm").alias("b_nrm"),
        F.col("cell").alias("b_cell"),
    )
    pairs = a.join(
        b, (F.col("cell") == F.col("b_cell")) & (F.col("b_id") < F.col("vec_id"))
    ).select(
        "vec_id",
        "cell",
        F.round(
            SIM.dot(F.col("v"), F.col("b_v")) / (F.col("nrm") * F.col("b_nrm")), 6
        ).alias("cos"),
    )
    return (
        pairs.groupBy("vec_id", "cell")
        .agg(F.max("cos").alias("max_cos_prior"))
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            "max_cos_prior",
            (F.col("max_cos_prior") >= _SEMDEDUP_T).cast("int").alias("is_dup"),
        )
    )


_HH_K = 125  # heavy hitter = frequency > n/125 (0.8% of the stream)


@query(
    "q_events_heavy_hitters",
    oracle=f"""
    SELECT user_id, count(*) AS cnt
    FROM events
    GROUP BY user_id
    HAVING count(*) * {_HH_K} > (SELECT count(*) FROM events)
    """,
)
def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (users above 1/125 of all events) computed
    the bounded-memory way: per-partition Misra-Gries(125) candidate
    pruning via Arrow `mapInPandas` (O(k) memory per task, no-false-
    negative superset guarantee), then exact counts of ONLY the
    candidates via a broadcast semi-join, then the integer-arithmetic
    ``cnt * k > n`` filter — so the result is exact and matches the
    plain GROUP BY/HAVING oracle bit-for-bit while never shuffling the
    full key cardinality. See `operators/frequency.py`.

    Scale shape: pass 1 is a narrow scan emitting <= k rows per
    partition; pass 2 shuffles only rows whose key is in the
    (partitions x k)-sized broadcast candidate set."""
    ev = load_table(spark, sf_dir, "events")
    return exact_heavy_hitters(ev, "user_id", k=_HH_K)


_SAMPLE_PER_SOURCE = 5


@query(
    "q_train_per_source_sample",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS INT) AS sample_rank
    FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rk
        FROM documents
    ) WHERE rk <= {_SAMPLE_PER_SOURCE}
    """,
)
def q_train_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: the first N documents per
    source under md5(doc_id) hash order — the replay-stable analog of
    a uniform per-stratum random sample (same device as the train/test
    split; no rand(), so retries and both engines agree). Used for
    eyeball QA sets and per-source eval slices in curation pipelines.

    Scale shape: one shuffle on source; the per-group window keeps a
    running rank, and at 100 TB the same shape runs as a TakeOrdered
    per stratum — no global sort."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SAMPLE_PER_SOURCE)
        .select("doc_id", "source", F.col("rk").cast("int").alias("sample_rank"))
    )
