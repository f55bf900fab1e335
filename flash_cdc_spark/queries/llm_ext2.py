"""Second extended LLM-training-data query block (r3, registered PAST
the driver window — r4 rotation candidates; continuously checked by the
local oracle mimic like the rest of the past-window surface).

Covers the corpus-curation steps a 100 TB text pipeline runs between
dedup and training: PII redaction, canonical-document selection inside
duplicate clusters, vocabulary coverage, domain mixing weights, and the
embedding-table normalization audit. All pure built-in expressions —
no Python UDFs anywhere.

The driver fixture text is synthetic and PII-free, so the redaction
query injects deterministic synthetic PII (derived from ``doc_id``)
before redacting — both engines perform the identical augmentation, so
the redaction logic itself (not the fixture) is what the value compare
exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.operators.global_order import with_global_order
from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table

# RE2 (DuckDB) and java.util.regex (Spark) agree on this subset: no
# backrefs, no lookaround, plain classes/quantifiers only.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_IPV4_RE = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"


@query(
    "q_text_pii_redaction",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com from host '
                    || CAST(10 + doc_id % 240 AS VARCHAR) || '.'
                    || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                    || CAST((doc_id * 7) % 256 AS VARCHAR) AS text
        FROM documents
    ),
    red AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{_IPV4_RE}'))  AS n_ips,
               regexp_replace(
                   regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_IPV4_RE}', '<IP>', 'g') AS redacted
        FROM aug
    )
    SELECT doc_id,
           CAST(n_emails AS INT)            AS n_emails,
           CAST(n_ips AS INT)               AS n_ips,
           CAST(length(redacted) AS BIGINT) AS redacted_len,
           md5(redacted)                    AS redacted_md5
    FROM red
    """,
)
def q_text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every public-web training
    corpus runs before tokenization: find and mask email addresses and
    IPv4 literals, report per-document match counts plus an md5 of the
    redacted text (so the compare proves byte-identical redaction, not
    just identical counts). The fixture is PII-free, so deterministic
    synthetic PII derived from doc_id is appended first — identically
    on both engines. Patterns stay inside the RE2 ∩ java.util.regex
    common subset. Shape: scan → project, zero shuffles — redaction is
    embarrassingly parallel at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from host "),
        (F.lit(10) + F.col("doc_id") % 240).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _IPV4_RE, "<IP>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_IPV4_RE), F.lit(0)))
        .cast("int")
        .alias("n_ips"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


@query(
    "q_dedup_canonical_docs",
    oracle="""
    WITH fp AS (
        SELECT doc_id, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               md5(array_to_string(
                   list_sort(list_distinct(string_split(lower(text), ' '))),
                   ' ')) AS cluster_key
        FROM documents
    ),
    ranked AS (
        -- cluster totals computed BEFORE the rk=1 filter: a window in
        -- the outer SELECT would run after WHERE and see one row
        SELECT *,
               row_number() OVER (PARTITION BY cluster_key
                                  ORDER BY n_chars DESC, doc_id) AS rk,
               count(*) OVER (PARTITION BY cluster_key) AS n_members,
               sum(n_tokens) OVER (PARTITION BY cluster_key)
                   AS cluster_tokens
        FROM fp
    )
    SELECT cluster_key,
           CAST(n_members AS BIGINT)               AS n_members,
           CAST(doc_id AS BIGINT)                  AS canonical_doc_id,
           CAST(cluster_tokens - n_tokens AS BIGINT) AS tokens_dropped
    FROM ranked
    WHERE rk = 1 AND n_members >= 2
    """,
)
def q_dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection — dedup's second half: once a
    cluster of duplicates is identified, exactly ONE member is kept
    (the longest, tie-broken by smallest doc_id — the common
    keep-highest-quality policy) and the rest are dropped; the query
    reports each multi-member cluster's canonical doc and the token
    volume the drop reclaims. Cluster key is the WORD-SET fingerprint
    (md5 of the sorted distinct lowercased words) — a deterministic
    near-dup canonicalization that collapses reorderings and
    repetition-count edits, so clusters are non-empty on realistic
    corpora where byte-exact duplicates are rare (the near-dup
    variants feed the same selection step from their CC labels).
    Shape: one shuffle on cluster_key, then window ranking inside each
    cluster — keys are md5s (uniform, no skew), linear at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(
            F.array_join(
                F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))),
                " ",
            )
        ).alias("cluster_key"),
    )
    w = Window.partitionBy("cluster_key")
    ranked = fp.select(
        "*",
        F.row_number()
        .over(w.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rk"),
        F.count(F.lit(1)).over(w).alias("n_members"),
        F.sum("n_tokens").over(w).alias("cluster_tokens"),
    )
    return ranked.filter((F.col("rk") == 1) & (F.col("n_members") >= 2)).select(
        "cluster_key",
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("doc_id").cast("bigint").alias("canonical_doc_id"),
        (F.col("cluster_tokens") - F.col("n_tokens"))
        .cast("bigint")
        .alias("tokens_dropped"),
    )


@query(
    "q_text_vocab_coverage",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    counts AS (
        SELECT w, count(*) AS c FROM words WHERE w <> '' GROUP BY w
    ),
    total AS (SELECT sum(c) AS t FROM counts),
    top AS (
        SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rk
        FROM counts
        QUALIFY rk <= 40
    )
    SELECT CAST(rk AS INT)  AS rank,
           w                AS word,
           CAST(c AS BIGINT) AS n_occurrences,
           round(sum(c) OVER (ORDER BY rk) / CAST(t AS DOUBLE), 6)
                            AS cum_coverage
    FROM top, total
    """,
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design diagnostic: for
    the corpus's 40 most frequent words, the cumulative fraction of all
    token occurrences they cover (the empirical Zipf curve that decides
    vocab size / byte-fallback rates). Shape: explode → ONE
    partial-aggregatable groupBy(word); the top-40 is
    TakeOrderedAndProject (never a full sort); the corpus total rides a
    scalar aggregate broadcast into the 40-row result; the cumulative
    window runs over 40 rows on one task. Nothing global touches more
    than the distinct-vocab relation — linear at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    counts = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = (
        counts.orderBy(F.col("c").desc(), "w")
        .limit(40)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "w"))
            .cast("int")
            .alias("rank"),
            F.col("w").alias("word"),
            F.col("c").cast("bigint").alias("n_occurrences"),
        )
    )
    total = counts.agg(F.sum("c").cast("double").alias("t"))
    cum = F.sum("n_occurrences").over(
        Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    )
    return top.crossJoin(F.broadcast(total)).select(
        "rank",
        "word",
        "n_occurrences",
        F.round(cum / F.col("t"), 6).alias("cum_coverage"),
    )


@query(
    "q_train_domain_mix_weights",
    oracle="""
    WITH per_source AS (
        SELECT source,
               count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS n_tokens
        FROM documents GROUP BY source
    ),
    shares AS (
        SELECT *,
               n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE) AS actual_share,
               1.0 / count(*) OVER () AS target_share
        FROM per_source
    )
    SELECT source,
           CAST(n_docs AS BIGINT)   AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(actual_share, 6)   AS actual_share,
           round(least(target_share / actual_share, 5.0), 6) AS mix_weight,
           round(least(target_share / actual_share, 5.0) * n_tokens, 2)
                                    AS effective_tokens
    FROM shares
    """,
)
def q_train_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing weights — the data-mixture step of LLM training
    (the Pile/LLaMA-style per-source sampling weights): compare each
    source's actual token share against a uniform target and emit the
    up/down-sampling weight, capped at 5× (the standard bound on
    repeating any single domain). Shape: ONE partial-aggregatable
    groupBy(source) reduces 100 TB to #sources rows; the grand totals
    are a one-row aggregate broadcast back (r7 — replaces the
    empty-partition share windows, part of zeroing the
    single-partition-window allowlist; totals are exact integers, so
    the replacement is bit-identical). The hot path is the
    token-count scan — narrow and linear."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    totals = per_source.agg(
        F.sum("n_tokens").alias("__tot"), F.count(F.lit(1)).alias("__ns")
    )
    per_source = per_source.crossJoin(F.broadcast(totals))
    actual = F.col("n_tokens") / F.col("__tot").cast("double")
    target = F.lit(1.0) / F.col("__ns")
    weight = F.least(target / actual, F.lit(5.0))
    return per_source.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(actual, 6).alias("actual_share"),
        F.round(weight, 6).alias("mix_weight"),
        F.round(weight * F.col("n_tokens"), 2).alias("effective_tokens"),
    )


@query(
    "q_embedding_dim_stats",
    oracle="""
    WITH flat AS (
        SELECT unnest(range(len(embedding))) AS dim,
               unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
        FROM embeddings
    )
    SELECT CAST(dim AS INT)        AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(x), 6)         AS mean,
           round(stddev_samp(x), 6) AS std,
           round(min(x), 6)         AS min_v,
           round(max(x), 6)         AS max_v
    FROM flat GROUP BY dim
    """,
)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics — the normalization audit run
    before indexing/quantizing an embedding table (dead dims, scale
    drift, outlier dims all show up here; int8 quantization ranges come
    straight from the min/max). Shape: posexplode to (dim, value) →
    ONE partial-aggregatable groupBy(dim) with #dims distinct keys —
    uniform tiny key space, map-side combine does nearly all the work,
    linear at 100 TB."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    return flat.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("x"), 6).alias("mean"),
        F.round(F.stddev_samp("x"), 6).alias("std"),
        F.round(F.min("x"), 6).alias("min_v"),
        F.round(F.max("x"), 6).alias("max_v"),
    )


@query(
    "q_text_unigram_surprisal",
    oracle="""
    WITH tok AS (
        SELECT doc_id, tok
        FROM (
            SELECT doc_id,
                   unnest(string_split(coalesce(text, ''), ' ')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    vocab AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY tok
    ),
    total AS (SELECT CAST(sum(tf) AS DOUBLE) AS n FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(-log2(v.tf / total.n)) / count(*), 4)
               AS mean_surprisal_bits
    FROM tok t JOIN vocab v USING (tok) CROSS JOIN total
    GROUP BY t.doc_id
    """,
)
def q_text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: a corpus-trained unigram LM
    scores each document by mean token surprisal (−log2 p) in bits —
    the cheap stand-in for model-based perplexity filtering that
    curation pipelines use to drop gibberish (high surprisal) and
    boilerplate (low surprisal) before training.

    Scale shape: one shuffle to build the vocabulary (token → corpus
    frequency), one shuffled hash join to score tokens against it (the
    vocab of a 100 TB corpus does not broadcast), one shuffle for the
    per-document mean; the corpus token total rides a 1-row broadcast
    cross join (the TF-IDF ``N`` pattern) — no separate count scan, no
    Python UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.coalesce("text", F.lit("")), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").cast("double").alias("n"))
    return (
        tok.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(-F.log2(F.col("tf") / F.col("n"))) / F.count(F.lit(1)), 4
            ).alias("mean_surprisal_bits"),
        )
    )


@query(
    "q_train_global_ids",
    oracle="""
    SELECT doc_id, source,
           row_number() OVER (ORDER BY source, doc_id) - 1 AS global_id
    FROM documents
    """,
)
def q_train_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global sample ids 0..N-1 in (source, doc_id) order
    WITHOUT a global sort — the two-phase offset idiom every training
    pipeline needs to index its samples: (1) rank locally inside each
    source partition (parallel window), (2) collect the per-source
    counts (metadata-sized — one row per source), exclusive-prefix-scan
    them on the driver, and (3) broadcast the offsets back so
    global_id = source_offset + local_rank. The oracle is the global
    ``row_number() - 1`` the idiom must reproduce exactly.

    Scale shape: the only full-data movement is ONE shuffle on source
    for the local rank; the driver handles #sources rows, never data.
    A skew-prone source mix refines the unit to (source, shard) with
    hash shards — same idiom, same two phases (the refinement
    ``q_train_sequence_packing`` documents). A naive global
    ``row_number() OVER (ORDER BY ...)`` would single-task the entire
    corpus through one window partition.

    NULL sources: partitioned/joined through a high sentinel (U+FFFF —
    sorts after every real source name) so null-source docs get ids
    where the oracle's default NULLS-LAST ordering puts them, instead
    of crashing the driver sort or being dropped by a
    null-never-equal join."""
    d = load_table(spark, sf_dir, "documents")
    key = F.coalesce(F.col("source"), F.lit("￿"))
    w = Window.partitionBy(key).orderBy("doc_id")
    local = d.select(
        "doc_id",
        "source",
        key.alias("src_key"),
        (F.row_number().over(w) - 1).alias("local_rank"),
    )
    counts = sorted(
        (r["src_key"], r["n"])
        for r in local.groupBy("src_key").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for src, n in counts:
        offsets.append((src, acc))
        acc += n
    off_df = spark.createDataFrame(offsets, "src_key string, src_offset bigint")
    return (
        local.join(F.broadcast(off_df), "src_key")
        .select(
            "doc_id",
            "source",
            (F.col("src_offset") + F.col("local_rank")).alias("global_id"),
        )
    )


@query(
    "q_train_dataset_card",
    oracle="""
    WITH tok AS (
        SELECT doc_id, len(list_filter(string_split(coalesce(text, ''), ' '),
                                       t -> t <> '')) AS n_tokens
        FROM documents
    ),
    dup AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_dup_docs FROM (
        SELECT count(*) AS c FROM documents GROUP BY md5(coalesce(text, ''))
        HAVING count(*) > 1))
    SELECT CAST(count(*) AS BIGINT)                       AS n_docs,
           CAST(count(DISTINCT d.source) AS BIGINT)       AS n_sources,
           CAST(count(DISTINCT d.lang) AS BIGINT)         AS n_langs,
           CAST(sum(t.n_tokens) AS BIGINT)                AS total_tokens,
           round(avg(t.n_tokens), 4)                      AS mean_tokens_per_doc,
           round(avg(d.n_chars), 4)                       AS mean_chars_per_doc,
           (SELECT n_dup_docs FROM dup)                   AS n_exact_dup_docs
    FROM documents d JOIN tok t USING (doc_id)
    """,
)
def q_train_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card: the summary block a training-data release
    ships with — corpus size, source/language breadth, token budget,
    and the exact-duplicate count (docs participating in any
    identical-text group).

    Scale shape: everything is a partial-aggregable global aggregate
    over one scan, except the dup count (one shuffle on the text hash)
    — assembled via a 1-row scalar subquery, never a driver-side
    loop."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.coalesce("text", F.lit("")), " "), lambda t: t != "")
    )
    base = d.select("doc_id", "source", "lang", "n_chars", toks.alias("n_tokens"))
    dup_docs = (
        d.groupBy(F.md5(F.coalesce("text", F.lit(""))).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_exact_dup_docs"))
    )
    card = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens_per_doc"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars_per_doc"),
    )
    return card.crossJoin(F.broadcast(dup_docs))
