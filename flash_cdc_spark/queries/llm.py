"""LLM-training-data pipeline queries over ``documents`` and
``embeddings`` — dedup, text analysis, similarity search.

These are first-class engine components (north-star scope), not ports:
the reference has no document processing at all. Design point is 100 TB:

- dedup keys are computed with built-in hash/string functions (JVM,
  codegen) — one shuffle on the dedup key, no Python;
- the brute-force kNN is a blocked cross join kept for the oracle path;
  the scale path is the LSH-bucketed variant (see
  :mod:`flash_cdc_spark.operators.similarity`);
- all token/shingle work uses ``split``/``transform``/``filter``
  higher-order functions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

@query(
    "q_dedup_exact_summary",
    oracle="""
    SELECT count(*)                                    AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT)   AS n_distinct_texts,
           count(*) - CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dupes
    FROM documents
    """,
)
def q_dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup profile: hash-groupBy on md5(text). At scale this is
    one shuffle on a 128-bit key; the kept-rows variant is
    ``dropDuplicates(["text_hash"])``."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_exact_dupes"),
    )


@query(
    "q_dedup_fingerprint_groups",
    oracle="""
    WITH fp AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
        FROM documents
    )
    SELECT fingerprint,
           count(*)                         AS n_docs,
           CAST(min(doc_id) AS BIGINT)      AS keeper_doc_id,
           CAST(max(doc_id) AS BIGINT)      AS max_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) > 1
    """,
)
def q_dedup_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups by *token-set fingerprint* (order/multiplicity-
    insensitive text normalization, OpenRefine-style): docs that are
    permutations / repetition-variants of the same vocabulary collide.
    Keeper = min doc_id, the standard deterministic survivor rule."""
    d = load_table(spark, sf_dir, "documents")
    fingerprint = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.col("text"), " "))), " ")
    )
    return (
        d.select(F.col("doc_id"), fingerprint.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@query(
    "q_text_quality_by_source",
    oracle="""
    WITH tok AS (
        SELECT source, lang, text,
               length(text)                                   AS n_chars_actual,
               len(string_split(text, ' '))                   AS n_tokens,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('the','a','of','and'))) AS n_stopwords
        FROM documents
    )
    SELECT source,
           count(*)                                         AS n_docs,
           avg(n_chars_actual)                              AS avg_chars,
           CAST(sum(n_tokens) AS BIGINT)                    AS total_tokens,
           avg(n_tokens)                                    AS avg_tokens,
           avg(CAST(n_stopwords AS DOUBLE) / n_tokens)      AS stopword_ratio,
           avg(CAST(n_chars_actual - n_tokens + 1 AS DOUBLE) / n_tokens) AS avg_token_len
    FROM tok
    GROUP BY source
    """,
)
def q_text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score profile per source: length, token count, stopword
    ratio, average token length — all higher-order functions, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    n_stop = F.size(F.filter(tokens, lambda t: t.isin("the", "a", "of", "and")))
    n_chars = F.length("text")
    tok = d.select(
        "source",
        n_chars.alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
    )
    return tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars_actual").alias("avg_chars"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("n_tokens").alias("avg_tokens"),
        F.avg(F.col("n_stopwords").cast("double") / F.col("n_tokens")).alias("stopword_ratio"),
        F.avg(
            (F.col("n_chars_actual") - F.col("n_tokens") + F.lit(1)).cast("double")
            / F.col("n_tokens")
        ).alias("avg_token_len"),
    )


@query(
    "q_text_token_classes",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+'))    AS INT) AS n_word_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+'))    AS INT) AS n_number_tokens,
           CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS INT) AS n_other_chars
    FROM documents
    ORDER BY doc_id
    LIMIT 200
    """,
)
def q_text_token_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (word / number / other classes) —
    the character-class patterns are dialect-portable by construction."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("n_word_tokens"),
            F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("n_number_tokens"),
            F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0)).alias("n_other_chars"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query(
    "q_text_lang_heuristic",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(string_split(text, ' '), t -> t IN ('the','a'))) AS en_score,
               len(string_split(text, ' '))                                     AS n_tokens
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(count(CASE WHEN CAST(en_score AS DOUBLE) / n_tokens > 0.05
                           THEN 1 END) AS BIGINT) AS n_pred_en
    FROM scored
    GROUP BY lang
    """,
)
def q_text_lang_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic vs the labeled ``lang`` column
    (the synthetic corpus shares one vocabulary, so the heuristic's
    EN-marker rate is uniform across labels — the point is the shape:
    score → threshold → confusion profile)."""
    d = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    en_score = F.size(F.filter(tokens, lambda t: t.isin("the", "a")))
    scored = d.select(
        "lang",
        en_score.alias("en_score"),
        F.size(tokens).alias("n_tokens"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(
            F.when(F.col("en_score").cast("double") / F.col("n_tokens") > 0.05, F.lit(1))
        ).alias("n_pred_en"),
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

@query(
    "q_embedding_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm
    FROM embeddings
    ORDER BY vec_id
    """,
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector plumbing check: L2 norms via higher-order aggregate over
    the ``array<float>`` column (double math, rounded for cross-engine
    float stability)."""
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id", "label", F.round(F.sqrt(sq_sum), 6).alias("l2_norm")
    ).orderBy("vec_id")


@query(
    "q_knn_bruteforce",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               sqrt(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
        FROM embeddings
    ), pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        FROM vecs q JOIN vecs c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 10
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, neighbor_id) AS rk
        FROM pairs
    )
    SELECT query_id, neighbor_id, neighbor_label, cosine, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    """,
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for a 10-query probe set: broadcast the
    query side, JVM-side ``zip_with`` dot product, per-query top-k window.
    This is the exact baseline the ANN variants are measured against; at
    100 TB the probe set stays broadcastable and the corpus side streams."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(F.transform("embedding", lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda a, x: a + x))
    vecs = e.select("vec_id", "label", v.alias("v"), nrm.alias("nrm"))
    q = (
        vecs.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        vecs.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            F.round(dot / (F.col("qn") * F.col("nrm")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)


@query(
    "q_text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source,
               unnest(string_split(coalesce(text, ''), ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, source, term, count(*) AS tf
        FROM tok GROUP BY doc_id, source, term
    ),
    df AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY term
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    scored AS (
        SELECT tf.source, tf.term,
               sum(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0))) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
        GROUP BY tf.source, tf.term
    ),
    ranked AS (
        SELECT source, term, round(score, 6) AS score,
               row_number() OVER (PARTITION BY source
                                  ORDER BY round(score, 6) DESC, term) AS rk
        FROM scored
    )
    SELECT source, term, score, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def q_text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency × smoothed inverse document frequency,
    aggregated per source, top-3 terms each. Two shuffles (tf groupBy,
    df groupBy) + a broadcast of the tiny df/N sides — the standard
    distributed TF-IDF shape (what Spark MLlib's HashingTF+IDF computes,
    expressed relationally so it's oracle-checkable).

    The corpus size N rides the same rollup as the per-term document
    frequencies (the grand-total row = distinct docs overall), so no
    separate count() action re-scans a 100 TB ``documents`` just for
    the IDF denominator. Both engines tokenize ``coalesce(text, '')``
    and define N over the tokenized set — splitting '' yields one
    empty-string token, so a NULL-text document still counts toward N
    on both sides and the two N definitions coincide (ADVICE r2)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "source", "term").agg(F.count(F.lit(1)).alias("tf"))
    stats = tok.rollup("term").agg(F.countDistinct("doc_id").alias("df"))
    df = stats.filter(F.col("term").isNotNull())
    n = stats.filter(F.col("term").isNull()).select(F.col("df").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("source", "term")
        .agg(F.sum(F.col("tf") * idf).alias("raw_score"))
        .select("source", "term", F.round("raw_score", 6).alias("score"))
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("source", "term", "score", F.col("rk").cast("int").alias("rk"))
    )


@query(
    "q_text_chunking",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM documents WHERE doc_id < 200
    ),
    chunks AS (
        SELECT doc_id, source, n, t,
               CAST(unnest(range(0, n, 40)) AS INT) AS start
        FROM toks
    )
    SELECT doc_id, source,
           CAST(start // 40 AS INT) AS chunk_idx,
           start,
           CAST(least(50, n - start) AS INT) AS chunk_tokens,
           array_to_string(list_transform(range(least(50, n - start)),
                                          k -> t[CAST(start + k + 1 AS INT)]), ' ')
               AS chunk_text
    FROM chunks
    """,
)
def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for LLM training: fixed-size token windows
    (50 tokens, stride 40 → 10-token overlap), one output row per
    chunk. Pure sequence/transform + JVM-side explode — a 100 TB corpus
    chunks in one narrow pass with no Python and no shuffle."""
    chunk_size, stride = 50, 40
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = d.select(
        "doc_id", "source", F.split("text", " ").alias("t")
    ).withColumn("n", F.size("t"))
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    chunks = toks.select(
        "doc_id", "source", "n", "t", F.explode(starts).alias("start")
    )
    chunk_len = F.least(F.lit(chunk_size), F.col("n") - F.col("start"))
    chunk_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), chunk_len - 1),
            lambda k: F.element_at(F.col("t"), F.col("start") + k + 1),
        ),
    )
    return chunks.select(
        "doc_id",
        "source",
        F.floor(F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        chunk_len.cast("int").alias("chunk_tokens"),
        chunk_text.alias("chunk_text"),
    )


@query(
    "q_train_test_split",
    oracle="""
    WITH assigned AS (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                   % 100 AS bucket
        FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'validation'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM assigned
    GROUP BY source, split
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test split (90/5/5) by hashed id —
    the reproducible-split primitive every training pipeline needs:
    membership is a pure function of the row key (stable across runs,
    engines, and re-partitioning — never ``rand()`` or ``sample()``,
    whose results depend on partition layout)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "validation").otherwise("test")
    )
    return (
        d.select("doc_id", "source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@query(
    "q_embedding_quantize_int8",
    oracle="""
    WITH vecs AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE vec_id < 300
    ),
    scaled AS (
        SELECT vec_id, v,
               list_aggregate(list_transform(v, x -> abs(x)), 'max') AS mx
        FROM vecs
    ),
    dq AS (
        SELECT vec_id, v, mx,
               list_transform(v, x -> floor(x * (127.0 / mx) + 0.5) / (127.0 / mx))
                   AS vq
        FROM scaled WHERE mx > 0
    )
    SELECT vec_id,
           CAST(len(v) AS INT) AS n_dims,
           round(127.0 / mx, 6) AS scale,
           round(list_aggregate(list_transform(range(len(v)),
                     i -> (v[CAST(i + 1 AS INT)] - vq[CAST(i + 1 AS INT)])
                        * (v[CAST(i + 1 AS INT)] - vq[CAST(i + 1 AS INT)])), 'sum')
                 / len(v) * 1e6, 4) AS mse_ppm
    FROM dq
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of embeddings (4× storage cut — at
    100 TB of vectors the difference between fitting in cluster memory
    or not): symmetric per-vector scale 127/max|x|, quantize with
    ``floor(x·scale + 0.5)`` (floor is bit-identical across engines;
    ``round`` half-up/half-even dialects are not), dequantize, report
    per-vector reconstruction MSE (in ppm so the driver's float
    canonicalization keeps resolution). Pure array HOFs — narrow,
    shuffle-free, embarrassingly parallel."""
    from flash_cdc_spark.operators import similarity as SIM

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    v = SIM.as_double_vec("embedding")
    mx = F.aggregate(
        F.transform(v, lambda x: F.abs(x)), F.lit(0.0), lambda a, x: F.greatest(a, x)
    )
    base = e.select("vec_id", v.alias("v"), mx.alias("mx")).filter(F.col("mx") > 0)
    scale = F.lit(127.0) / F.col("mx")
    vq = F.transform(F.col("v"), lambda x: F.floor(x * scale + 0.5) / scale)
    sq_err = F.zip_with(F.col("v"), vq, lambda a, b: (a - b) * (a - b))
    return base.select(
        "vec_id",
        F.size("v").alias("n_dims"),
        F.round(scale, 6).alias("scale"),
        F.round(
            F.aggregate(sq_err, F.lit(0.0), lambda a, x: a + x) / F.size("v") * 1e6, 4
        ).alias("mse_ppm"),
    )


# Per-source keep-rates for the stratified sample (percent). Mirrors a
# training-mix config: boost high-quality strata, downsample bulk web.
STRATA_RATES = {"src0": 80, "src1": 50, "src2": 20}
STRATA_DEFAULT_RATE = 10


@query(
    "q_train_stratified_sample",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                   % 100 AS bucket,
               CASE source WHEN 'src0' THEN {STRATA_RATES["src0"]}
                           WHEN 'src1' THEN {STRATA_RATES["src1"]}
                           WHEN 'src2' THEN {STRATA_RATES["src2"]}
                           ELSE {STRATA_DEFAULT_RATE} END AS rate
        FROM documents
    )
    SELECT source,
           count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM hashed
    WHERE bucket < rate
    GROUP BY source
    """,
)
def q_train_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified training-mix sampling: each source stratum keeps a
    configured rate, membership decided by a hash of the stable doc key
    — NEVER ``rand()``, so the sample is identical on every run, every
    retry, and both engines (same md5-derived bucket as the train/test
    split). One narrow filter + one aggregate; at 100 TB the filter
    rides the scan."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint") % 100
    )
    rate = F.lit(STRATA_DEFAULT_RATE)
    for src, r in STRATA_RATES.items():
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    return (
        d.withColumn("bucket", bucket)
        .withColumn("rate", rate)
        .filter(F.col("bucket") < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )
