"""Training-preparation extensions (r6, batch 8): epoch allocation
under a token budget, embedding-space outlier screening, traffic
burst detection, and deterministic corpus interleaving.

Epoch allocation operationalizes data-constrained scaling (Muennighoff
et al. 2023 — repeating good data up to ~4 epochs beats adding bad
data); the interleave order is the reproducible shuffle a distributed
trainer needs so every rerun sees the same stream without coordinating
a global random permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flash_cdc_spark.queries import query
from flash_cdc_spark.tables import load_table


# ---------------------------------------------------------------------
# Epoch allocation under a token budget
# ---------------------------------------------------------------------


@query(
    "q_train_epoch_allocation",
    oracle="""
    WITH per_source AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks,
               round(avg(n_chars), 9) AS w
        FROM documents GROUP BY source
    ),
    totals AS (
        SELECT CAST(sum(toks) AS DOUBLE) AS all_toks,
               sum(w) AS all_w
        FROM per_source
    ),
    alloc AS (
        SELECT s.source, s.toks, s.w,
               round(least(4.0,
                     (2.0 * t.all_toks) * (s.w / t.all_w) / s.toks), 6)
                   AS epochs
        FROM per_source s CROSS JOIN totals t
    )
    SELECT source, toks, round(w, 2) AS weight, epochs,
           CAST(round(epochs * toks) AS BIGINT) AS allocated_tokens
    FROM alloc
    """,
)
def q_train_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch allocation under a fixed token budget — the
    data-constrained-scaling planner (Muennighoff et al. 2023): with a
    budget of 2× the corpus, each source gets epochs proportional to
    its quality weight, hard-capped at 4 epochs (past which repeated
    data stops helping). The output is the training-mixture manifest:
    tokens available, weight, fractional epochs, tokens allocated.

    Scale: one pass to per-source (tokens, weight) aggregates; the
    allocation itself is arithmetic on the sources-sized relation with
    a broadcast totals row. Any quality signal already in the registry
    (logreg score, DSIR weight, gopher rules) can replace the length
    proxy without changing the shape.
    """
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).alias("toks"),
        F.round(F.avg("n_chars"), 9).alias("w"),
    )
    totals = per_source.agg(
        F.sum("toks").cast("double").alias("all_toks"),
        F.sum("w").alias("all_w"),
    )
    epochs = F.round(
        F.least(
            F.lit(4.0),
            (2.0 * F.col("all_toks"))
            * (F.col("w") / F.col("all_w"))
            / F.col("toks"),
        ),
        6,
    )
    return (
        per_source.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "toks",
            F.round("w", 2).alias("weight"),
            epochs.alias("epochs"),
            F.round(epochs * F.col("toks"), 0).cast("bigint").alias(
                "allocated_tokens"
            ),
        )
    )


# ---------------------------------------------------------------------
# Embedding-space outliers (diagonal Mahalanobis)
# ---------------------------------------------------------------------


@query(
    "q_embedding_outliers",
    oracle="""
    WITH cells AS (
        SELECT e.vec_id, e.label, CAST(r.range AS INT) AS dim,
               CAST(e.embedding[CAST(r.range AS INT) + 1] AS DOUBLE) AS x
        FROM embeddings e CROSS JOIN range(64) r
    ),
    stats AS (
        SELECT dim, round(avg(x), 9) AS mu,
               round(stddev_samp(x), 9) AS sigma
        FROM cells GROUP BY dim
    ),
    scored AS (
        SELECT c.vec_id, c.label,
               round(sqrt(avg(pow((c.x - s.mu) / s.sigma, 2))), 6)
                   AS outlier_score
        FROM cells c JOIN stats s USING (dim)
        WHERE s.sigma > 0
        GROUP BY c.vec_id, c.label
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY outlier_score DESC, vec_id)
                   AS rk
        FROM scored
    )
    SELECT CAST(rk AS INT) AS rk, vec_id,
           CAST(label AS INT) AS label, outlier_score
    FROM ranked WHERE rk <= 20
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier screen: per-dimension z-scores folded
    into a diagonal-Mahalanobis RMS distance — the cheap anomaly score
    that catches corrupt embeddings (NaN-adjacent garbage, scale
    blowups, wrong-model vectors) before they poison an ANN index or
    a clustering step. Top-20 most anomalous vectors with labels.

    Scale: the dim-stats relation is 64 rows (one partial-agg pass
    over the exploded cells); scoring joins it broadcast and reduces
    back to one row per vector — two key-uniform shuffles total, and
    the per-dim explode is the columnar layout Tungsten handles
    natively. Full-covariance Mahalanobis needs the PCA machinery
    (`q_embedding_pca_project`) — this is the O(d) screen run first.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cells = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "xf"),
    ).select("vec_id", "label", "dim", F.col("xf").cast("double").alias("x"))
    stats = cells.groupBy("dim").agg(
        F.round(F.avg("x"), 9).alias("mu"),
        F.round(F.stddev_samp("x"), 9).alias("sigma"),
    )
    scored = (
        cells.join(F.broadcast(stats), "dim")
        .filter(F.col("sigma") > 0)
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.avg(F.pow((F.col("x") - F.col("mu")) / F.col("sigma"), 2))),
                6,
            ).alias("outlier_score")
        )
    )
    rk_w = Window.orderBy(F.col("outlier_score").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(rk_w))
        .filter(F.col("rk") <= 20)
        .select(
            F.col("rk").cast("int").alias("rk"),
            "vec_id",
            F.col("label").cast("int").alias("label"),
            "outlier_score",
        )
    )


# ---------------------------------------------------------------------
# Trailing-window burst detection
# ---------------------------------------------------------------------


@query(
    "q_events_burst_detection",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*) AS c
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    trailed AS (
        SELECT event_type, h, c,
               round(avg(c) OVER w, 9) AS mu,
               round(stddev_samp(c) OVER w, 9) AS sigma,
               count(*) OVER w AS n_prior
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS hour_ts,
           CAST(c AS BIGINT) AS n_events,
           round((c - mu) / sigma, 4) AS burst_z
    FROM trailed
    WHERE n_prior >= 12 AND sigma > 0 AND (c - mu) / sigma > 2.5
    """,
)
def q_events_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window burst detection — the alerting primitive behind
    'traffic spiked in the last hour': each (type, hour) bucket is
    z-scored against ITS OWN trailing 24 hours (not the global mean,
    which `q_events_anomaly_zscore` covers, and not the seasonal cell,
    which `q_events_seasonal_anomalies` covers — a trailing baseline
    adapts to drift). Hours with z > 2.5 over ≥12 prior observations
    are bursts.

    Scale: facts reduce to (type, hour) counts first (one partial-agg
    shuffle); the trailing frame is a bounded 24-row window over the
    hourly relation — state is constant per key regardless of corpus
    size, and the streaming twin is a sliding-window aggregate. mu and
    sigma round to 9 dp before the threshold (the repo device).
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    trailed = hourly.select(
        "event_type",
        "h",
        "c",
        F.round(F.avg("c").over(w), 9).alias("mu"),
        F.round(F.stddev_samp("c").over(w), 9).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("n_prior"),
    )
    z = (F.col("c") - F.col("mu")) / F.col("sigma")
    return (
        trailed.filter(
            (F.col("n_prior") >= 12) & (F.col("sigma") > 0) & (z > 2.5)
        )
        .select(
            "event_type",
            F.col("h").alias("hour_ts"),
            F.col("c").alias("n_events"),
            F.round(z, 4).alias("burst_z"),
        )
    )


# ---------------------------------------------------------------------
# Deterministic corpus interleave order
# ---------------------------------------------------------------------


@query(
    "q_train_interleave_order",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hk
        FROM documents
    ),
    per_source AS (
        SELECT doc_id, source, hk,
               row_number() OVER (PARTITION BY source ORDER BY hk, doc_id)
                   AS pass_idx
        FROM keyed
    ),
    sched AS (
        SELECT doc_id, source, pass_idx,
               row_number() OVER (ORDER BY pass_idx, hk, doc_id) AS pos
        FROM per_source
    )
    SELECT CAST(pos AS INT) AS pos, doc_id, source,
           CAST(pass_idx AS INT) AS pass_idx
    FROM sched WHERE pos <= 50
    """,
)
def q_train_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order: docs are
    hash-shuffled WITHIN each source (md5 order — reproducible, unlike
    ``rand()``), then round-robined across sources by per-source rank,
    so the training stream never runs a long single-source burst (the
    ordering pathology that skews early optimization). First 50
    schedule positions shown; the full schedule is the same relation
    un-limited.

    Scale: one window per source partition + one global rank. The
    global rank is the audit form; at 100 TB the schedule is consumed
    shard-wise — ``repartitionByRange(pass_idx, hk)`` + within-
    partition sort gives every trainer shard the same interleave
    without any global sort (the two-phase pattern again).
    """
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8).alias("hk"),
    )
    sw = Window.partitionBy("source").orderBy("hk", "doc_id")
    per_source = keyed.withColumn("pass_idx", F.row_number().over(sw))
    gw = Window.orderBy("pass_idx", "hk", "doc_id")
    return (
        per_source.withColumn("pos", F.row_number().over(gw))
        .filter(F.col("pos") <= 50)
        .select(
            F.col("pos").cast("int").alias("pos"),
            "doc_id",
            "source",
            F.col("pass_idx").cast("int").alias("pass_idx"),
        )
    )
